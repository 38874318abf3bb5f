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


def kmeans_fit(vectors, k: int = 16, iters: int = 20):
    """Deterministic Lloyd's k-means over a numpy sample (driver-side,
    like the reference trains off-cluster): init = first k rows,
    ties/empty cells keep their previous centroid. Returns centroids
    QUANTIZED to integers (round(x*1000)) so cell assignment is exact
    integer arithmetic — portable to the DuckDB oracle."""
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    cents = x[:k].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(0)
    return [[int(v) for v in np.round(c * 1000)] for c in cents]


def _cell_dists(centroids, qv_col="qv"):
    """Array<struct(d, j)> of squared-distance surrogates to every
    centroid: d_j = |c_j|^2 - 2*x.c_j over quantized ints (|x|^2 is
    constant per row and drops out of the argmin). One expression —
    struct ordering (d first, then j) makes array_min/array_sort the
    exact first-min-wins argmin, so no per-centroid columns or CASE
    chains regardless of centroid count."""
    cent = F.array(*[
        F.struct(F.lit(int(sum(v * v for v in c))).cast("bigint")
                 .alias("cn2"),
                 F.lit(j).alias("j"),
                 F.array(*[F.lit(int(v)) for v in c]).alias("cv"))
        for j, c in enumerate(centroids)])
    return F.transform(
        cent,
        lambda s: F.struct(
            (s["cn2"] - F.lit(2).cast("bigint") *
             int_dot(F.col(qv_col), s["cv"])).alias("d"),
            s["j"].alias("j")))


def _with_cell(df: DataFrame, centroids, qv_col="qv") -> DataFrame:
    """Add `cell` = argmin_j d_j (smallest-j tie-break).

    Corpus-side assignment is the N x K x D hot loop, so it runs as
    posexplode + broadcast component join + two codegen aggregations
    (sum-product, then min_by argmin) instead of higher-order-function
    lambdas — Spark's HOF interpreter is ~100x slower than whole-stage
    codegen for this shape (measured: 9 s -> sub-second at 2k x 64 x 64).
    Tie-break matches array_min over (d, j) structs: min_by on
    struct(d, cell) takes the smallest cell among equal distances."""
    spark = df.sparkSession
    comp_rows = [(j, p, int(v)) for j, c in enumerate(centroids)
                 for p, v in enumerate(c)]
    comps = F.broadcast(spark.createDataFrame(
        comp_rows, "cell int, pos int, cval bigint"))
    n2 = F.broadcast(spark.createDataFrame(
        [(j, int(sum(v * v for v in c))) for j, c in enumerate(centroids)],
        "cell int, cn2 bigint"))

    # explicit width: the corpus parquet is small in BYTES, so AQE/file
    # splitting would run the N x K x D compute in one task (same trap
    # as plans/salt.py — byte heuristics can't see arithmetic cost)
    width = df.sparkSession.sparkContext.defaultParallelism
    exploded = df.repartition(width).select(
        "*", F.posexplode(F.col(qv_col)).alias("pos", "_x"))
    dots = (exploded.join(comps, "pos")
            .groupBy(*df.columns, "cell")
            .agg(F.sum(F.col("_x") * F.col("cval")).alias("_dot"))
            .join(n2, "cell")
            .withColumn("_d", F.col("cn2")
                        - F.lit(2).cast("bigint") * F.col("_dot")))
    return (dots.groupBy(*df.columns)
            .agg(F.min_by(F.col("cell"),
                          F.struct(F.col("_d"), F.col("cell")))
                 .alias("cell")))


def _with_probes(df: DataFrame, centroids, n_probe: int,
                 qv_col="qv") -> DataFrame:
    """Add `cell` (exploded): the n_probe nearest centroid cells, for
    the query side of an IVF search."""
    probes = F.slice(F.array_sort(_cell_dists(centroids, qv_col)),
                     1, n_probe)
    return df.withColumn("cell",
                         F.explode(F.transform(probes, lambda s: s["j"])))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids,
             k: int = 5, n_probe: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: assign every corpus vector to its nearest coarse
    centroid cell (native integer argmin, pure map), probe each
    query's n_probe nearest cells, exact quantized cosine only within
    probed cells. brute_force_topk is the recall=1 baseline.

    Scale shape (100 TB framing): the search join shuffles the corpus
    on the cell id, so centroid count must scale with the corpus
    (~sqrt(N) cells keeps both the shuffle-key cardinality and the
    per-cell candidate list healthy; 8 cells would mean 8 hot
    reducers). Centroids should be trained on a corpus sample
    (kmeans_fit), not synthetic points — recall depends on the cells
    matching the data distribution. n_probe is the recall dial that
    does not touch the partitioning."""
    c = _with_cell(_with_quantized(corpus, id_col, vec_col), centroids)
    q = (_with_probes(_with_quantized(queries, id_col, vec_col), centroids,
                      n_probe)
         .select(F.col("id").alias("query_id"), F.col("qv").alias("q_qv"),
                 F.col("norm2").alias("q_norm2"), "cell"))
    scored = (c.join(q, "cell")
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
