#!/usr/bin/env python
"""spark-submit entrypoint for crawl-frontier planning.

Composes the crawl-stack operators into the deployable shape: parse
per-host robots.txt files, verdict every frontier URL (RFC 9309
longest-match subset), drop disallowed + optionally blocklisted
hosts, and emit a politeness-slotted fetch plan:

    cd /root/repo && python jobs/build_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/edspdf_spark.zip \
        jobs/run_crawl_plan.py \
        --frontier /path/to/frontier_parquet   (url string) \
        --robots   /path/to/robots_parquet     (host, robots_txt) \
        --output   /path/to/out \
        [--agent spark-graft] [--per-host-concurrency 2] \
        [--block-hosts h1,h2,...]

Outputs:
    <output>/plan         (url, host, host_seq, slot) for allowed URLs
    <output>/excluded     (url, host, reason) for dropped ones
    <output>/plan.json    counts + slot histogram summary

Scale shape: the robots rule table is tiny (hosts x a few lines) and
broadcasts; frontier rows are slim (url + hash); the only frontier
shuffles are the verdict rollup and the per-host politeness window.
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
    ap.add_argument("--frontier", required=True)
    ap.add_argument("--robots", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--agent", default="spark-graft")
    ap.add_argument("--per-host-concurrency", type=int, default=2)
    ap.add_argument("--block-hosts", default="")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F  # noqa: N812

    from edspdf_spark.operators.robots import (robots_crawl_delays,
                                               robots_rules,
                                               robots_sitemaps,
                                               robots_verdicts)
    from edspdf_spark.operators.urls import crawl_schedule

    spark = (SparkSession.builder.appName("edspdf-spark-crawl-plan")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    frontier = spark.read.parquet(args.frontier)
    robots = spark.read.parquet(args.robots)
    rules = robots_rules(robots, agent=args.agent)
    verdicts = robots_verdicts(frontier, rules).persist()

    blocked = [h for h in args.block_hosts.split(",") if h]
    is_blocked = F.col("host").isin(blocked) if blocked else F.lit(False)

    excluded = (verdicts
                .where(~F.col("allowed") | is_blocked)
                .select("url", "host",
                        F.when(is_blocked, F.lit("blocklist"))
                        .otherwise(F.lit("robots")).alias("reason")))
    allowed = (verdicts.where(F.col("allowed") & ~is_blocked)
               .select("url"))
    plan = crawl_schedule(
        allowed, per_host_concurrency=args.per_host_concurrency)

    plan.write.mode("overwrite").parquet(f"{args.output}/plan")
    excluded.write.mode("overwrite").parquet(f"{args.output}/excluded")
    # frontier bootstrap + per-host pacing side tables
    robots_sitemaps(robots).write.mode("overwrite") \
        .parquet(f"{args.output}/sitemaps")
    robots_crawl_delays(robots, agent=args.agent) \
        .write.mode("overwrite").parquet(f"{args.output}/delays")

    os.makedirs(args.output, exist_ok=True)
    n_slots = plan.agg(F.max("slot")).collect()[0][0]
    report = {
        "frontier_urls": frontier.count(),
        "allowed": plan.count(),
        "excluded": {r["reason"]: r["n"] for r in
                     excluded.groupBy("reason")
                     .agg(F.count("*").alias("n")).collect()},
        "max_slot": int(n_slots) if n_slots is not None else 0,
        "per_host_concurrency": args.per_host_concurrency,
        "sitemap_urls": spark.read.parquet(
            f"{args.output}/sitemaps").count(),
        "hosts_with_delay": spark.read.parquet(
            f"{args.output}/delays").count(),
    }
    with open(os.path.join(args.output, "plan.json"), "w") as fh:
        json.dump(report, fh)
    print(json.dumps(report))
    verdicts.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
