#!/usr/bin/env python
"""spark-submit entrypoint for INCREMENTAL corpus refresh.

The crawl-refresh shape: a new snapshot arrives; only added+changed
documents are worth reprocessing, removed ones are tombstoned, and
unchanged ones (the bulk) are carried forward untouched. This job
diffs the snapshots (operators/dedup.snapshot_diff — one
md5-reduced full-outer join), reprocesses the delta through the
doc-local cleaning funnel (run_webtext.clean_stage), and merges with
the carried-forward previous output:

    cd /root/repo && python jobs/build_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/edspdf_spark.zip \
        jobs/run_refresh.py \
        --previous /path/to/prev_snapshot_parquet \
        --current  /path/to/new_snapshot_parquet \
        --prev-output /path/to/prev_cleaned \
        --output /path/to/out \
        [--id-col doc_id] [--text-col text]

Outputs:
    <output>/delta     the diff relation (key, status, old/new md5)
    <output>/data      cleaned rows: reprocessed delta + carried rows
    <output>/refresh.json   counts per status + reprocess fraction

At 10^12 docs the win is the whole point: reprocessing cost scales
with the CHANGED fraction (typically a few percent per crawl), not
the corpus; the diff itself moves only (key, md5) pairs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--previous", required=True)
    ap.add_argument("--current", required=True)
    ap.add_argument("--prev-output", required=True,
                    help="cleaned output of the previous run "
                         "(carried forward for unchanged keys)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--badwords", default="")
    ap.add_argument("--stopwords", default="")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F  # noqa: N812

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_webtext import clean_stage

    from edspdf_spark.operators.dedup import snapshot_diff

    spark = (SparkSession.builder.appName("edspdf-spark-refresh")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    prev = spark.read.parquet(args.previous)
    cur = spark.read.parquet(args.current)
    delta = snapshot_diff(prev, cur, key_col=args.id_col,
                          content_col=args.text_col).persist()
    delta.write.mode("overwrite").parquet(f"{args.output}/delta")

    counts = {r["status"]: r["n"] for r in
              delta.groupBy("status").agg(F.count("*").alias("n"))
              .collect()}
    reprocess_keys = (delta.where(F.col("status")
                                  .isin("added", "changed"))
                      .select(F.col("key").alias(args.id_col)))
    todo = cur.join(reprocess_keys, args.id_col, "leftsemi")

    badwords = [w for w in args.badwords.split(",") if w]
    stopwords = [w for w in args.stopwords.split(",") if w] or None
    cleaned_delta = clean_stage(badwords, args.id_col, args.text_col,
                                stopwords=stopwords)(todo)

    carried = (spark.read.parquet(args.prev_output)
               .join(delta.where(F.col("status") == "unchanged")
                     .select(F.col("key").alias(args.id_col)),
                     args.id_col, "leftsemi"))
    merged = carried.unionByName(cleaned_delta, allowMissingColumns=True)
    merged.write.mode("overwrite").parquet(f"{args.output}/data")

    os.makedirs(args.output, exist_ok=True)
    n_total = sum(counts.values())
    n_re = counts.get("added", 0) + counts.get("changed", 0)
    report = {"counts": counts,
              "reprocess_fraction": round(n_re / n_total, 4)
              if n_total else 0.0,
              "rows_out": merged.count()}
    with open(os.path.join(args.output, "refresh.json"), "w") as fh:
        json.dump(report, fh)
    print(json.dumps(report))
    delta.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
