"""Similarity search over embedding columns (array<float>).

Quantized-integer cosine: embeddings are quantized to integers
(round(x*1000)) so dot products are exact and order-independent —
deterministic across engines and across partitionings, unlike float
sums — then cosine = dot / (sqrt(dot_aa) * sqrt(dot_bb)) on those
exact integers. This mirrors standard int8 ANN practice and is what
makes the DuckDB oracle byte-exact.

* brute_force_topk — the correctness baseline: broadcast the (small)
  query set, score every corpus vector natively (zip_with fold inside
  codegen), window top-k per query.
* cosine_bucket_pairs — the scale path: sign-bit LSH bucket on the
  first `band_dims` dims restricts the pair join to same-bucket
  vectors (the IVF-style coarse quantizer); exact cosine verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from ..functions import int_dot, quantize


def _with_quantized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    q = quantize(F.col(vec_col))
    return (df.select(F.col(id_col).alias("id"), q.alias("qv"))
            .withColumn("norm2", int_dot(F.col("qv"), F.col("qv"))))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """(query_id, neighbor_id, cos) top-k by quantized cosine;
    excludes self-matches; ties broken by neighbor id."""
    c = _with_quantized(corpus, id_col, vec_col)
    q = (_with_quantized(queries, id_col, vec_col)
         .select(F.col("id").alias("query_id"), F.col("qv").alias("q_qv"),
                 F.col("norm2").alias("q_norm2")))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("id") != F.col("query_id"))
              .withColumn("dot", int_dot(F.col("qv"), F.col("q_qv")))
              .withColumn("cos", F.col("dot") /
                          (F.sqrt(F.col("norm2")) * F.sqrt(F.col("q_norm2")))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("query_id", F.col("id").alias("neighbor_id"), "cos",
                    F.col("rk").alias("rank")))


def cosine_bucket_pairs(df: DataFrame, threshold: float = 0.9,
                        band_dims: int = 8, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id_a, id_b, cos) for same-sign-bucket pairs with cos >=
    threshold. The bucket is the sign bitmask of the first band_dims
    quantized components — vectors in different buckets are never
    compared (recall/latency dial = band_dims)."""
    q = _with_quantized(df, id_col, vec_col)
    bucket = F.aggregate(
        F.slice(F.col("qv"), 1, band_dims),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc * 2 + F.when(x >= 0, 1).otherwise(0),
    )
    qb = q.withColumn("bucket", bucket)
    a = qb.select(F.col("id").alias("id_a"), F.col("qv").alias("qv_a"),
                  F.col("norm2").alias("n2_a"), "bucket")
    b = qb.select(F.col("id").alias("id_b"), F.col("qv").alias("qv_b"),
                  F.col("norm2").alias("n2_b"), "bucket")
    return (a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
            .withColumn("dot", int_dot(F.col("qv_a"), F.col("qv_b")))
            .withColumn("cos", F.col("dot") /
                        (F.sqrt(F.col("n2_a")) * F.sqrt(F.col("n2_b"))))
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))
