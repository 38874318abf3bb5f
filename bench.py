#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total seconds), "unit": "sec",
"queries": {name: sec}, "sf", plus docs_per_sec extras for the
flagship extraction pipeline}.

Methodology (uniform across queries): one untimed warmup run, then
best-of-REPS (default 3) timed reps — steady-state throughput, excluding JVM/codegen
warmup and Python-worker spin-up, which is what scales to a long-lived
cluster job (cold-start is amortized over 10^12 rows, not per-query).
Every timed query is forced with the noop sink (full computation, no
driver collect). Inputs are deterministic (synth corpus + driver
testdata, fixed seed), so per-query times are attributable round over
round; each run appends its JSON line to BENCH/history.jsonl.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
BENCH/scaling.py -> BENCH/BASELINE.md, not here.
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
# is 5000 rows at sf0.1; parse cost ~1.4 ms/doc single-core)
PIPELINE_DOCS_MULT = int(os.environ.get("SPARK_GRAFT_PIPE_MULT", "40"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _settle(max_wait_s: float = 90.0) -> None:
    """Wait for residual system load to drain before timing.

    The suite is often launched right after another heavy job (the
    test suite, a prior bench): leftover JVM shutdown / page-cache
    churn inflated a full run's flagship number by 2x once (see the
    annotated BENCH/history.jsonl entry). Timing starts once 1-min
    loadavg falls under half the benched core count (or after
    max_wait_s, so an inherently busy box still produces a number)."""
    deadline = time.time() + max_wait_s
    target = CPUS * 0.5
    while time.time() < deadline:
        try:
            with open("/proc/loadavg") as fh:
                load1 = float(fh.read().split()[0])
        except (OSError, ValueError):
            return
        if load1 <= target:
            return
        print(f"[bench] settling: load1={load1:.1f} > {target:.1f}",
              file=sys.stderr)
        time.sleep(5.0)


def _host_health_probe() -> dict:
    """One-shot host-speed sentinel recorded in the output JSON: a
    single-core hash loop and a multithreaded BLAS matmul. On this
    shared host the effective parallel speed can shift 2-3x between
    runs (hypervisor neighbors); these two numbers let a reader
    normalize a run against history (reference on this box: md5
    ~0.35 s always; matmul 0.4-1.3 s idle->mildly-contended, ~2.8 s
    during the degraded windows annotated in BENCH/history.jsonl)."""
    import hashlib
    t0 = time.time()
    x = b"x" * 1000
    for _ in range(200_000):
        x = hashlib.md5(x).digest() * 62 + b"xx"
    md5_s = time.time() - t0
    try:
        import numpy as np
        a = np.random.RandomState(0).rand(2000, 2000)
        t0 = time.time()
        for _ in range(3):
            a @ a
        mm_s = time.time() - t0
    except Exception:
        mm_s = None
    return {"host_md5_200k_s": round(md5_s, 3),
            "host_matmul_2k_s": round(mm_s, 3) if mm_s else None}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(make_df) -> float:
    """Warmup once, then best-of-REPS seconds for a full forced run."""
    _force(make_df())
    best = None
    for _ in range(REPS):
        t0 = time.time()
        _force(make_df())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


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

    _settle()
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
        pipeline_s = _timed(
            lambda: run_fused(defuse_skew(pages, CPUS * 2),
                              entry_mod.PIPE_CFG))
        timings["pipeline_fused"] = round(pipeline_s, 3)
        # two-phase skew defusal variant (plans/salt.py): isolates
        # oversized docs into round-robin partitions at the cost of a
        # second scan — tracked so the tradeoff stays measured
        timings["pipeline_fused_two_phase"] = round(_timed(
            lambda: run_fused(defuse_skew(pages, CPUS * 2, two_phase=True),
                              entry_mod.PIPE_CFG)), 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # EVERY contract query is timed — no silent bench gaps (r3 VERDICT
    # #6: 18 oracled queries had never been timed). The flagship fused
    # pipeline is timed separately above over the larger synth corpus.
    for name in qs:
        timings[name] = round(_timed(lambda: qs[name](spark, SF_DIR)), 3)

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
        "host_health": _host_health_probe(),
    }
    spark.stop()
    line = json.dumps(out)
    try:
        os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH"), exist_ok=True)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "history.jsonl"), "a") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # history is best-effort; the contract is the stdout line
    print(line)


if __name__ == "__main__":
    main()
