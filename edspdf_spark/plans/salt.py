"""Skew defusal for heavy-tailed document sizes.

At 10^12-document scale a partition that happens to collect several
5000-page PDFs stalls the stage (SURVEY.md §7.4). The reference's
analog is batch_by="content_boxes" + sort_chunks
(processing/utils.py:43-85); ours is partition-level:

* normal documents: hash repartition on xxhash64(url) — uniform,
  deterministic, co-locates nothing (nothing needs co-locating: the
  pipeline is doc-local)
* oversized documents (html length above a byte threshold): spread
  round-robin so no partition holds more than ~1 of them

AQE (spark.sql.adaptive.enabled) further splits skewed shuffle
partitions at runtime; this pre-split bounds the worst case even when
a single partition's row COUNT looks balanced but its byte size isn't
— Spark's shuffle balancing sees rows, not parse cost.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

DEFAULT_OVERSIZE_BYTES = 1 << 20  # 1 MiB of PDF bytes ~ hundreds of pages


def defuse_skew(pages: DataFrame, num_partitions: Optional[int] = None,
                oversize_bytes: int = DEFAULT_OVERSIZE_BYTES) -> DataFrame:
    """Return pages repartitioned for even parse cost."""
    n = num_partitions or pages.sparkSession.sparkContext.defaultParallelism
    size = F.length(F.col("html"))
    normal = (pages.where(size <= oversize_bytes)
              .repartition(n, F.xxhash64("url")))
    # round-robin: even row spread regardless of key distribution
    oversized = pages.where(size > oversize_bytes).repartition(n)
    return normal.unionByName(oversized)


def bucket_of(url_col, n_buckets: int):
    """Deterministic bucket id for checkpoint/resume (plans/checkpoint.py):
    non-negative xxhash64(url) mod n_buckets."""
    return (F.pmod(F.xxhash64(url_col), F.lit(n_buckets))).cast("int")
