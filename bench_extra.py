#!/usr/bin/env python
"""Ad-hoc per-query measurement harness (guide §1.4) — NOT the driver
contract; bench.py stays the frozen measurement surface.

Times a chosen subset of the contract queries with the noop sink at an
arbitrary SF dir, and can dump .explain("formatted") per query for the
plan evidence in plans/r06/. Usage:

    python bench_extra.py --sf /root/testdata/sf1.0 \
        --queries simsearch_topk,knn_classify --reps 2 \
        --explain plans/r06 --suffix _before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--queries", default="all")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--explain", default=None,
                    help="directory to write <q><suffix>.txt plans into")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--no-time", action="store_true",
                    help="only dump plans, skip timing")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{args.cpus}]")
             .appName("edspdf-spark-bench-extra")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = (list(qs) if args.queries == "all"
             else [n.strip() for n in args.queries.split(",") if n.strip()])
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain,
                                   f"{name}{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        if args.no_time:
            continue
        # warmup + best-of-reps, same methodology as bench.py
        qs[name](spark, args.sf).write.format("noop") \
            .mode("overwrite").save()
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop") \
                .mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"[bench_extra] {name}: {out[name]}s", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf": args.sf, "reps": args.reps, "queries": out,
                      "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
