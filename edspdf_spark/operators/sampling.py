"""Deterministic sampling / split assignment for training corpora.

The classic requirement: the train/val/test split of a 10^12-row
corpus must be (a) reproducible run-to-run, (b) stable under
repartitioning and insertion order, (c) computable without any global
state. Hash-splitting gives all three: bucket = md5(id || salt) mod
1000, thresholds carve the buckets. Pure codegen column math (the
md5-prefix BIGINT trick from functions.code15), zero shuffles, exact
DuckDB oracle.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..functions import code15

HASH_SPLIT_SALT = "split-v1"
# per-mille bucket allocation, applied in insertion order
HASH_SPLIT_WEIGHTS: Dict[str, int] = {"train": 900, "val": 50, "test": 50}


def hash_split(df: DataFrame, id_col: str = "doc_id",
               salt: str = HASH_SPLIT_SALT,
               weights: Optional[Dict[str, int]] = None) -> DataFrame:
    """(id, bucket, split): bucket = code15(id || ':' || salt) mod
    1000; splits carve [0,1000) in `weights` insertion order. Changing
    the salt produces an independent split; changing a weight moves
    ONLY rows at the carve boundary (stable subset property)."""
    weights = weights or HASH_SPLIT_WEIGHTS
    if sum(weights.values()) != 1000:
        raise ValueError("split weights must sum to 1000 (per-mille)")
    bucket = F.pmod(
        code15(F.concat(F.col(id_col).cast("string"),
                        F.lit(":" + salt))), F.lit(1000)).cast("bigint")
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = bucket < (lo + w)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
        lo += w
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"),
                     expr.alias("split"))


def stratified_sample(df: DataFrame, rates: Dict[str, int],
                      id_col: str = "doc_id",
                      domain_col: str = "source",
                      salt: str = "mix-v1",
                      default_rate: int = 1000) -> DataFrame:
    """Deterministic per-domain downsampling — the data-mixing step
    that rebalances a web corpus toward target domain weights: a row
    survives iff bucket(id) < rates[domain] (per-mille). Domains
    absent from `rates` use default_rate (1000 = keep all).

    Same guarantees as hash_split (reproducible, repartition-stable,
    no global state); the rates table rides the plan as a literal CASE
    (a handful of domains) — for a large rates table, broadcast-join a
    rates DataFrame instead. Pure codegen filter, zero shuffles."""
    bucket = F.pmod(
        code15(F.concat(F.col(id_col).cast("string"),
                        F.lit(":" + salt))), F.lit(1000)).cast("bigint")
    rate = None
    for dom, r in rates.items():
        cond = F.col(domain_col) == dom
        rate = (F.when(cond, F.lit(r)) if rate is None
                else rate.when(cond, F.lit(r)))
    rate = (rate.otherwise(F.lit(default_rate)) if rate is not None
            else F.lit(default_rate))
    return (df.withColumn("_bucket", bucket)
            .where(F.col("_bucket") < rate)
            .drop("_bucket"))
