"""Retrieval-prep operators: positional inverted index construction
and windowed co-occurrence (PMI) statistics — the two classic
corpus-to-index workloads (search indexing; word-vector / collocation
prep).

Both are shuffle-on-term plans with map-side partial aggregation: the
corpus explodes to token rows ONCE, aggregates to (term, doc) /
(pair) granularity before any exchange carries raw text, and every
score is integer-quantized (md5-prefix codes, bin-length log2) so the
DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..functions import tokens


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf, positions, df): the positional posting
    relation — `positions` is the comma-joined ascending 0-based
    token offsets (a STRING, deliberately: array columns stringify
    differently across engines, killing oracle comparability; a
    writer shards this relation by term into the index files).

    Shape: posexplode -> ONE shuffle to (term, doc) with map-side
    combine -> tiny term-level df table joined back broadcast. At
    10^12 docs the (term, doc) aggregate is the index itself — there
    is no cheaper exact plan."""
    base = (df.select(F.col(id_col).alias("doc_id"),
                      F.posexplode(tokens(F.col(text_col)))
                      .alias("pos", "term")))
    post = (base.groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.array_join(F.sort_array(F.collect_list("pos")), ",")
                 .alias("positions")))
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (post.join(F.broadcast(dfreq), "term")
            .select("term", "doc_id", F.col("tf").cast("bigint"),
                    "positions", F.col("df").cast("bigint")))


def cooc_pairs(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", window: int = 2,
               min_count: int = 5) -> DataFrame:
    """Directional co-occurrence pairs within a forward token window
    (a at position i, b at i+1..i+window) with an integer PMI score:

        pmi_ilog2 = ilog2(c_pair) + ilog2(total_pairs)
                  - ilog2(c_a) - ilog2(c_b)

    — the sum-of-floor-log2 decomposition keeps every term in BIGINT
    range at any corpus size (the naive c_pair*total*2^20/(ca*cb)
    numerator overflows past ~10^5-doc corpora). High pmi = words
    that appear together far above chance (collocations; word-vector
    training signal).

    Shape: pair construction is zip-with-shifted-slices (the
    word_shingles pattern — no position self-join, no range join);
    one shuffle to pair counts, token counts and the total as
    broadcast sides. min_count bounds output (and is the standard
    noise floor for PMI)."""
    toks = tokens(F.col(text_col))
    pair_arrays = [
        F.arrays_zip(F.slice(toks, 1,
                             F.greatest(F.size(toks) - d, F.lit(0)))
                     .alias("x"),
                     F.slice(toks, 1 + d,
                             F.greatest(F.size(toks) - d, F.lit(0)))
                     .alias("y"))
        for d in range(1, window + 1)]
    pairs = (df.select(F.explode(F.concat(*pair_arrays)).alias("p"))
             .select(F.col("p.x").alias("a"), F.col("p.y").alias("b")))
    cp = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_pair"))
    tot = pairs.groupBy().agg(F.count(F.lit(1)).alias("total_pairs"))
    ct = (df.select(F.explode(toks).alias("t"))
          .groupBy("t").agg(F.count(F.lit(1)).alias("c_tok")))
    ilog2 = lambda c: (F.length(F.bin(c)) - 1).cast("bigint")  # noqa: E731
    out = (cp.where(F.col("c_pair") >= min_count)
           .join(F.broadcast(ct.withColumnRenamed("t", "a")
                             .withColumnRenamed("c_tok", "c_a")), "a")
           .join(F.broadcast(ct.withColumnRenamed("t", "b")
                             .withColumnRenamed("c_tok", "c_b")), "b")
           .join(F.broadcast(tot)))
    return out.select(
        "a", "b", F.col("c_pair").cast("bigint"),
        F.col("c_a").cast("bigint"), F.col("c_b").cast("bigint"),
        (ilog2(F.col("c_pair")) + ilog2(F.col("total_pairs"))
         - ilog2(F.col("c_a")) - ilog2(F.col("c_b")))
        .alias("pmi_ilog2"))


# Okapi BM25 constants, milli-scaled so per-term scores are integers
# (float partial sums are aggregation-order-dependent; summing
# integer-quantized term scores is exact and partition-invariant)
BM25_K1_MILLI = 1200   # k1 = 1.2
BM25_B_MILLI = 750     # b  = 0.75
BM25_SCALE = 1 << 20


def bm25_topk(df: DataFrame, query_terms, top_k: int = 10,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Okapi BM25 retrieval: (doc_id, score_scaled, n_hit_terms, rk)
    — the top_k documents for a bag of query terms.

        idf_q  = ilog2(N * 2^20 / df_q)                (integer)
        tf'    = tf * 1000 * (k1+1)
        denom  = tf * 1000 + k1 * (1000 - b + b * dl*1000/avgdl)
        score  = sum over hit terms of idf_q * (tf' div denom-ish)

    All quantities are milli/2^20-scaled BIGINTs; the one division
    per (doc, term) happens BEFORE the sum, so the aggregate is a
    sum of integers — deterministic under any partitioning, exact in
    the oracle. Quantization changes scores by <0.1% vs float BM25;
    ranking ties break by doc_id.

    Shape: the corpus explodes once to (term, doc) aggregates
    (shuffle 1, map-side combined); query terms, df counts and
    corpus stats are all broadcast; top-k is a single ungrouped
    window over only the scored candidates (docs hitting >= 1 query
    term — a tiny fraction of the corpus for realistic queries).
    """
    q = sorted(set(query_terms))
    base = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(tokens(F.col(text_col)))
                      .alias("term")))
    dl = base.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"))
    tf = (base.where(F.col("term").isin(q))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # broadcast the CANDIDATE side into the corpus-sized dl table so
    # dl never shuffles (candidates = docs hitting a query term — tiny
    # for selective queries; for stopword-scale terms swap the hint)
    scored = dl.join(F.broadcast(tf.join(F.broadcast(dfreq), "term")),
                     "doc_id").join(F.broadcast(stats))
    # n_docs * 2^20 stays under BIGINT range through ~10^12 docs
    idf = (f"CAST(length(bin((n_docs * {BM25_SCALE}) div df)) - 1 "
           f"AS BIGINT)")
    dl_norm = (f"({BM25_K1_MILLI} * (1000 - {BM25_B_MILLI} + "
               f"({BM25_B_MILLI} * dl * n_docs) div total_tokens)) "
               f"div 1000")
    term_score = (f"({idf}) * ((tf * 1000 * ({BM25_K1_MILLI} + 1000)) "
                  f"div (tf * 1000 + ({dl_norm})))")
    scored = scored.withColumn("_ts", F.expr(term_score))
    agg = (scored.groupBy("doc_id")
           .agg(F.sum("_ts").alias("score_scaled"),
                F.count(F.lit(1)).alias("n_hit_terms")))
    from pyspark.sql import Window
    wnd = Window.orderBy(F.desc("score_scaled"), F.asc("doc_id"))
    return (agg.withColumn("rk", F.row_number().over(wnd)
                           .cast("bigint"))
            .where(F.col("rk") <= top_k)
            .select("doc_id", F.col("score_scaled").cast("bigint"),
                    F.col("n_hit_terms").cast("bigint"), "rk"))
