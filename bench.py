#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total seconds), "unit": "sec",
"queries": {name: sec}, "sf", plus docs_per_sec extras for the
flagship extraction pipeline}.

Every timed query is forced with the noop sink (full computation, no
driver collect). Scaling-efficiency evidence (local[8] vs local[32])
lives in BENCH/scaling.py -> BENCH/BASELINE.md, not here.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# flagship corpus size = multiplier x documents-table rows (documents
# is 500 rows at every sf in this testdata, so this is effectively
# fixed; parse cost ~1.4 ms/doc single-core)
PIPELINE_DOCS_MULT = int(os.environ.get("SPARK_GRAFT_PIPE_MULT", "40"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("edspdf-spark-bench")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from edspdf_spark import synth
    from edspdf_spark.operators import run_fused
    from edspdf_spark.plans import defuse_skew

    n_docs_table = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n_pipeline = n_docs_table * PIPELINE_DOCS_MULT

    qs = entry_mod.queries()
    timings: dict[str, float] = {}

    # flagship: fused extraction pipeline over n_pipeline synthetic docs.
    # Input is MATERIALIZED first (untimed): production reads storage,
    # and timing the generator's python stage would distort the number.
    import shutil
    import tempfile
    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    try:
        synth.pages_spark(spark, n_pipeline, num_partitions=CPUS * 2) \
            .write.mode("overwrite").parquet(f"{tmp}/pages")
        pages = spark.read.parquet(f"{tmp}/pages")
        # full-width warmup: spin up ALL python workers + JIT; then
        # best-of-2 timed reps (this host shows 2x run-to-run noise)
        _force(run_fused(defuse_skew(pages, CPUS * 2), entry_mod.PIPE_CFG))
        pipeline_s = None
        for _ in range(2):
            t0 = time.time()
            _force(run_fused(defuse_skew(pages, CPUS * 2),
                             entry_mod.PIPE_CFG))
            dt = time.time() - t0
            pipeline_s = dt if pipeline_s is None else min(pipeline_s, dt)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    timings["pipeline_fused"] = round(pipeline_s, 3)

    headline = ["dedup_exact", "dedup_minhash_lsh", "simsearch_topk",
                "text_quality", "lang_id", "fingerprint", "events_hourly",
                "tpch_q1", "mask_classify", "aggregate_lines"]
    for name in headline:
        t0 = time.time()
        _force(qs[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pipeline_docs": n_pipeline,
        "pipeline_docs_per_sec": round(n_pipeline / pipeline_s, 1),
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
