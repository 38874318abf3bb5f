"""Per-partition metrics + run lineage (SURVEY.md §4 custom work #3).

The reference only has tqdm counters (processing/simple.py:44-48).
Here every fused-output row carries (partition_id, bytes_in, n_blocs,
error), so the metrics table is a cheap native aggregate over the
result — no second parse, no accumulator fragility:

    metrics:  run_id, partition_id, docs, blocs, error_docs, bytes_in
    lineage:  run_id, code_version, input_desc, started_at, spark_conf

Both are plain DataFrames the caller writes next to the output.
"""

from __future__ import annotations

import datetime as _dt
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from .. import __version__


def new_run_id() -> str:
    return uuid.uuid4().hex[:16]


def metrics_from_fused(fused: DataFrame, run_id: str) -> DataFrame:
    """Roll fused output up to one row per task partition.

    Counts docs (distinct urls), blocs, error docs, input bytes. All
    native expressions — one shuffle on partition_id (tiny)."""
    per_doc = (fused.groupBy("partition_id", "url")
               .agg(F.max("n_blocs").alias("n_blocs"),
                    F.max("bytes_in").alias("bytes_in"),
                    F.max(F.col("error").cast("int")).alias("error")))
    return (per_doc.groupBy("partition_id")
            .agg(F.count("*").alias("docs"),
                 F.sum("n_blocs").alias("blocs"),
                 F.sum("error").alias("error_docs"),
                 F.sum("bytes_in").alias("bytes_in"))
            .withColumn("run_id", F.lit(run_id))
            .select("run_id", "partition_id", "docs", "blocs",
                    "error_docs", "bytes_in"))


def lineage_row(spark: SparkSession, run_id: str, input_desc: str,
                extra: Optional[dict] = None) -> DataFrame:
    conf = {}
    for key in ("spark.master", "spark.sql.shuffle.partitions"):
        # Spark 4 type-checks defaults passed to conf.get for known
        # configs, so probe without a default
        try:
            conf[key] = spark.conf.get(key)
        except Exception:
            conf[key] = "unset"
    if extra:
        conf.update({str(k): str(v) for k, v in extra.items()})
    rows = [(run_id, __version__, input_desc,
             _dt.datetime.now(_dt.timezone.utc).isoformat(),
             ";".join(f"{k}={v}" for k, v in sorted(conf.items())))]
    return spark.createDataFrame(
        rows, "run_id string, code_version string, input_desc string, "
              "started_at string, spark_conf string")
