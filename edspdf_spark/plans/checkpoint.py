"""Checkpoint/resume for long backfills (SURVEY.md §4 custom work #2).

The reference has no resume — a failed run restarts from zero. Here a
run is split into deterministic url-hash BUCKETS (pmod(xxhash64(url),
n_buckets)); each bucket is processed and committed independently:

    out_dir/
      data/bucket=<b>/...parquet      (overwritten atomically per bucket)
      _progress/<b>.json              (written only after the data commit)

Restart = skip buckets whose marker exists; an interrupted bucket has
no marker and is simply re-run (its partial data dir is overwritten —
idempotent). This is the parquet-dir equivalent of an Iceberg
MERGE-by-partition watermark table; on a cluster with Iceberg the
marker write becomes a `progress` table append in the same
transaction.

Skew note: buckets are processed in groups so each Spark job still
spans many partitions; within a group the fused map runs after
defuse_skew.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from ..operators.fused import PipelineConfig, run_fused
from .metrics import metrics_from_fused, new_run_id
from .salt import bucket_of, defuse_skew


def _marker_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, "_progress", f"{bucket}.json")


def done_buckets(out_dir: str, n_buckets: int) -> List[int]:
    return [b for b in range(n_buckets)
            if os.path.exists(_marker_path(out_dir, b))]


def run_with_checkpoint(pages: DataFrame, cfg: PipelineConfig, out_dir: str,
                        n_buckets: int = 8, buckets_per_job: int = 4,
                        run_id: Optional[str] = None,
                        fail_after_buckets: Optional[int] = None,
                        num_partitions: Optional[int] = None) -> str:
    """Process pages into out_dir with bucket-granular resume.

    fail_after_buckets: test hook — raise after committing that many
    buckets, simulating a mid-run crash.
    """
    spark = pages.sparkSession
    run_id = run_id or new_run_id()
    os.makedirs(os.path.join(out_dir, "_progress"), exist_ok=True)

    done = set(done_buckets(out_dir, n_buckets))
    todo = [b for b in range(n_buckets) if b not in done]
    committed = 0

    with_bucket = pages.withColumn("_bucket", bucket_of(F.col("url"),
                                                        n_buckets))
    for i in range(0, len(todo), buckets_per_job):
        group = todo[i:i + buckets_per_job]
        subset = with_bucket.where(F.col("_bucket").isin(group)).drop("_bucket")
        # persist: the data write and the metrics rollup are two
        # actions over the same fused result — without caching, the
        # second action would re-parse every document in the group
        fused = run_fused(defuse_skew(subset, num_partitions), cfg).persist()
        try:
            # one physical pass; bucket recomputed on the (tiny) output
            # rows. dynamic partition overwrite => a re-run bucket
            # REPLACES its data dir, so an interrupted group can never
            # leave duplicates.
            out = fused.withColumn("bucket",
                                   bucket_of(F.col("url"), n_buckets))
            (out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(os.path.join(out_dir, "data")))
            mdf = metrics_from_fused(fused, run_id)
            (mdf.write.mode("overwrite")
                .parquet(os.path.join(out_dir, "metrics",
                                      f"run_{run_id}_g{group[0]}")))
        finally:
            fused.unpersist()
        for b in group:
            with open(_marker_path(out_dir, b) + ".tmp", "w") as f:
                json.dump({"run_id": run_id, "bucket": b,
                           "committed_at": time.time()}, f)
            os.replace(_marker_path(out_dir, b) + ".tmp",
                       _marker_path(out_dir, b))
            committed += 1
            if fail_after_buckets is not None and committed >= fail_after_buckets:
                raise RuntimeError(
                    f"simulated crash after {committed} buckets")
    return run_id


def read_result(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))


def run_stage_with_checkpoint(df: DataFrame, stage_fn, out_dir: str,
                              key_col: str = "url",
                              n_buckets: int = 8,
                              buckets_per_job: int = 4,
                              run_id: Optional[str] = None,
                              fail_after_buckets: Optional[int] = None
                              ) -> str:
    """Bucket-granular checkpoint/resume for ANY bucket-decomposable
    stage: `stage_fn(subset_df) -> DataFrame` must be row-local or
    bucket-local (doc-level filters, scoring, per-doc rebuilds) and
    must keep `key_col` in its output. Corpus-GLOBAL operators (exact
    dedup across buckets, connected components) belong in a follow-on
    pass over the committed output — the standard two-phase production
    shape: clean per-shard with resume, then one global pass over the
    (much smaller) survivors.

    Same commit protocol as run_with_checkpoint: dynamic partition
    overwrite per bucket + marker files under <out_dir>/_progress, so
    an interrupted group re-runs idempotently. Writes per-bucket row
    counts to <out_dir>/metrics/.
    """
    run_id = run_id or new_run_id()
    os.makedirs(os.path.join(out_dir, "_progress"), exist_ok=True)

    done = set(done_buckets(out_dir, n_buckets))
    todo = [b for b in range(n_buckets) if b not in done]
    committed = 0

    with_bucket = df.withColumn("_bucket", bucket_of(F.col(key_col),
                                                     n_buckets))
    for i in range(0, len(todo), buckets_per_job):
        group = todo[i:i + buckets_per_job]
        subset = (with_bucket.where(F.col("_bucket").isin(group))
                  .drop("_bucket"))
        result = stage_fn(subset).persist()
        try:
            out = result.withColumn("bucket", bucket_of(F.col(key_col),
                                                        n_buckets))
            (out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(os.path.join(out_dir, "data")))
            mdf = (out.groupBy("bucket")
                   .agg(F.count("*").alias("rows_out"))
                   .withColumn("run_id", F.lit(run_id))
                   .withColumn("committed_at", F.lit(time.time())))
            (mdf.write.mode("overwrite")
                .parquet(os.path.join(out_dir, "metrics",
                                      f"run_{run_id}_g{group[0]}")))
        finally:
            result.unpersist()
        for b in group:
            with open(_marker_path(out_dir, b) + ".tmp", "w") as f:
                json.dump({"run_id": run_id, "bucket": b,
                           "committed_at": time.time()}, f)
            os.replace(_marker_path(out_dir, b) + ".tmp",
                       _marker_path(out_dir, b))
            committed += 1
            if (fail_after_buckets is not None
                    and committed >= fail_after_buckets):
                raise RuntimeError(
                    f"simulated crash after {committed} buckets")
    return run_id
