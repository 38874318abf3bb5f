"""Text analysis operators: quality scoring, language-ID, token
statistics, document fingerprinting.

All native column expressions (no Python workers), each with an exact
DuckDB-oracle rendering. Portability rules: split on single space
(no regex dialects), integer arithmetic where possible, md5-prefix
hashing (functions.code15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..functions import code15, tokens

# tiny per-language stopword lists for the n-gram-free heuristic;
# deterministic argmax order = list order here
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "und", "das", "ein"],
    "es": ["el", "la", "de", "y", "un"],
}


def _count_token(toks, word: str):
    return F.size(F.filter(toks, lambda t: t == word))


def text_quality(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-doc quality metrics: lengths, token stats, stopword ratio,
    subword estimate (ceil(len/4) per token — a BPE-rate proxy that
    needs no tokenizer and is engine-portable)."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop_hits = None
    for w in LANG_STOPWORDS["en"]:
        c = _count_token(toks, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    subwords = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("bigint"))
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint")
        .alias("n_distinct_tokens"),
        subwords.alias("n_subwords"),
        (stop_hits / F.when(n_tok == 0, 1).otherwise(n_tok))
        .alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)) /
         F.when(n_tok == 0, 1).otherwise(n_tok)).alias("ttr"),
    )


# GPT-2-style BPE pre-tokenization pattern, lookaround-free so it runs
# identically under Java regex (Spark) and RE2 (DuckDB): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs. Whitespace is an EXPLICIT class (Java \s includes
# \x0B, RE2's does not — a bare \s would un-oracle vertical tabs).
_WS_CLASS = r" \t\n\x0B\f\r"
BPE_SPLIT_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+"
                     rf"| ?[^{_WS_CLASS}\p{{L}}\p{{N}}]+|[{_WS_CLASS}]+")


def token_count(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_bpe_tokens, n_ws_tokens, n_chars, chars_per_bpe_token):
    corpus sizing for training-data budgets. BPE-ish count = matches of
    the GPT-2 pre-tokenizer regex (the real merge table only splits
    WITHIN pre-tokens, so this upper-bounds words and tracks token
    budgets within a constant factor); whitespace count for contrast.
    Pure codegen expressions — regexp_count runs JVM-side."""
    n_bpe = F.regexp_count(F.col(text_col),
                           F.lit(BPE_SPLIT_PATTERN)).cast("bigint")
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        n_bpe.alias("n_bpe_tokens"),
        F.size(toks).cast("bigint").alias("n_ws_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        (F.length(text_col).cast("bigint")
         / F.when(n_bpe == 0, F.lit(1).cast("bigint")).otherwise(n_bpe))
        .alias("chars_per_bpe_token"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Stopword-voting language ID with deterministic tie-break
    (language list order). Returns (id, lang_pred, vote_<lang>...)."""
    toks = tokens(F.col(text_col))
    votes = {}
    for lang, words in LANG_STOPWORDS.items():
        v = None
        for w in words:
            c = _count_token(toks, w)
            v = c if v is None else v + c
        votes[lang] = v
    langs = list(LANG_STOPWORDS)
    # argmax with first-wins tie-break, expressed as chained CASE
    best = F.lit(langs[0])
    best_v = votes[langs[0]]
    for lang in langs[1:]:
        cond = votes[lang] > best_v
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_v = F.when(cond, votes[lang]).otherwise(best_v)
    cols = [F.col(id_col).alias("id"), best.alias("lang_pred")]
    cols += [votes[lang].cast("bigint").alias(f"vote_{lang}")
             for lang in langs]
    return df.select(*cols)


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, content_md5, content_code, n_chars): cheap identity for
    lineage + exact-dup joins."""
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.lower(F.col(text_col))).alias("content_md5"),
        code15(F.lower(F.col(text_col))).alias("content_code"),
        F.length(text_col).cast("bigint").alias("n_chars"),
    )


# winnowing parameters: k-gram length, window width, polynomial base
# and modulus. B^j is precomputed mod M so every intermediate stays
# far below BIGINT range (sum of k terms < k * M * B).
WINNOW_K = 8
WINNOW_W = 4
WINNOW_B = 257
WINNOW_M = 1_000_003


WINNOW_MAX_LEN = 8192  # longest doc the literal power tables cover


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's
    local algorithm): polynomial rolling hash over character k-grams,
    then the DISTINCT minima of every w-wide window — the guarantee is
    that any match of length >= w+k-1 between two documents shares at
    least one selected fingerprint, at ~1/w the k-gram count.

    One row per (id, fp). Physical shape: posexplode chars -> running
    modular prefix sum + lead() over a per-doc window -> w-row min
    window -> distinct. One shuffle on id (the window), all integer
    column math — no Python, and no per-element re-evaluation of
    captured array expressions (the nested-lambda formulation is
    quadratic in Spark's interpreter). The k-gram hash is recovered
    from prefix sums via modular inverse powers:
        H_t = (S_{t+k-1} - S_{t-1}) * B^{-(t-1)}  (mod M)
    with B^j and B^{-j} mod M shipped as literal arrays. Texts longer
    than WINNOW_MAX_LEN are truncated to it (documented cap; the
    corpus case for longer docs is chunking upstream)."""
    from pyspark.sql import Window

    inv_b = pow(WINNOW_B, WINNOW_M - 2, WINNOW_M)  # M prime
    spark = df.sparkSession
    pow_df = F.broadcast(spark.createDataFrame(
        [(j, pow(WINNOW_B, j, WINNOW_M), pow(inv_b, j, WINNOW_M))
         for j in range(WINNOW_MAX_LEN)],
        "pos0 int, p bigint, ip bigint"))

    text = F.substring(F.lower(F.col(text_col)), 1, WINNOW_MAX_LEN)
    n = F.length(text)
    codes = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.ascii(F.substr(text, i, F.lit(1))).cast("bigint"))

    chars = (df.where(n >= k + w - 1)
             .select(F.col(id_col).alias("id"),
                     F.posexplode(codes).alias("pos0", "code"))
             .join(pow_df, "pos0"))
    # term_u = code_u * B^(u-1) mod M  (pos0 is 0-based => exponent pos0)
    term = (F.col("code") * F.col("p")) % WINNOW_M
    by_pos = Window.partitionBy("id").orderBy("pos0")
    run = chars.withColumn(
        "s", F.sum(term).over(
            by_pos.rowsBetween(Window.unboundedPreceding, 0)))
    # H_t for t = pos0+1: (S_{t+k-1} - S_{t-1}) * invB^(t-1) mod M
    s_hi = F.lead("s", k - 1).over(by_pos)
    s_lo = F.lag("s", 1).over(by_pos)
    h = F.pmod(
        F.pmod(s_hi - F.coalesce(s_lo, F.lit(0).cast("bigint")),
               F.lit(WINNOW_M))
        * F.col("ip"),
        F.lit(WINNOW_M))
    hashes = (run.withColumn("h", h)
              .where(F.col("h").isNotNull()))
    # w-window minima; only windows fully inside the hash sequence
    win_min = F.min("h").over(by_pos.rowsBetween(0, w - 1))
    n_hashes = F.count("h").over(Window.partitionBy("id"))
    mins = (hashes
            .withColumn("fp", win_min)
            .withColumn("_n", n_hashes)
            .where(F.col("pos0") < F.col("_n") - (w - 1)))
    return mins.select("id", "fp").distinct()
