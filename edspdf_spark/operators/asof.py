"""As-of (point-in-time) join — the time-series operator Spark lacks
natively: for each left row, attach the most recent right row at or
before the left row's timestamp within the same key (latest snapshot,
last-seen price, most recent login before a purchase, ...).

Plan shape: the classic SCALABLE formulation — union the two tagged
sides and run ONE keyed window with last(ignorenulls) — instead of the
naive `left JOIN right ON key AND r.ts <= l.ts` + rank, whose
intermediate blows up as |left| x |right| per key. The union window
moves each row exactly once through one hash exchange on the key;
state per partition is a single running struct. At 10^12 rows this is
the difference between a shuffle and an explosion. (The DuckDB oracle
deliberately USES the naive formulation — an independent derivation.)
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str, tie_col: str,
              value_cols: Optional[List[str]] = None,
              suffix: str = "_r",
              tolerance_s: Optional[float] = None) -> DataFrame:
    """left.* plus, per left row, the right row with the greatest
    (ts, tie) such that right.ts <= left.ts and right.key == left.key
    — NULLs when no such row. Ties on ts resolve to the larger
    `tie_col` (a unique id makes the match deterministic).

    `value_cols`: right columns to carry (default: all except
    key/ts/tie). Matched columns come back as <ts_col><suffix>,
    <tie_col><suffix>, <value><suffix>. `tolerance_s`: with a max age
    in seconds, older matches null out (the pandas merge_asof dial).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in (key_col, ts_col, tie_col)]
    pay_fields = [F.col(ts_col).alias("ts"), F.col(tie_col).alias("tie")]
    pay_fields += [F.col(v).alias(v) for v in value_cols]

    r = right.select(
        F.col(key_col), F.col(ts_col), F.lit(0).alias("_side"),
        F.col(tie_col).alias("_tie"),
        F.struct(*pay_fields).alias("_rpay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns if c != key_col])
    lt = left.select(
        F.col(key_col), F.col(ts_col), F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tie_col].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}")
          for c in left.columns if c != key_col])

    w = (Window.partitionBy(key_col)
         .orderBy(F.asc(ts_col), F.asc("_side"),
                  F.asc_nulls_first("_tie"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (r.unionByName(lt)
         .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
         .where(F.col("_side") == 1))
    if tolerance_s is not None:
        age = (F.col(ts_col).cast("double")
               - F.col("_m.ts").cast("double"))
        u = u.withColumn(
            "_m", F.when(age <= tolerance_s, F.col("_m")))

    out_cols = [F.col(key_col)]
    out_cols += [F.col(f"_l_{c}").alias(c)
                 for c in left.columns if c != key_col]
    out_cols += [F.col("_m.ts").alias(f"{ts_col}{suffix}"),
                 F.col("_m.tie").alias(f"{tie_col}{suffix}")]
    out_cols += [F.col(f"_m.{v}").alias(f"{v}{suffix}")
                 for v in value_cols]
    return u.select(*out_cols)
