"""Regression: documents with fewer than k tokens must not crash the
shingle path (Spark's sequence(0,-1) DESCENDS instead of being empty)
and must agree with the DuckDB oracle's empty-shingle behavior."""

import duckdb


def test_short_docs_shingle_pipeline(spark):
    from edspdf_spark.operators.dedup import (jaccard_pairs,
                                              minhash_lsh_pairs,
                                              shingle_table)

    rows = [(0, ""), (1, "hello"), (2, "hello world"),
            (3, "one two three"), (4, "one two three four"),
            (5, "one two three four")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sh = shingle_table(df, k=3)
    got = {(r.id, r.code) for r in sh.collect()}
    # docs 0-2 produce nothing; 3 has one shingle; 4/5 have two each
    assert {i for i, _c in got} == {3, 4, 5}

    # doc3's single shingle is contained in docs 4/5 -> jaccard 1/2,
    # exactly at threshold; (4,5) are identical -> jaccard 1.0
    jp = jaccard_pairs(sh, threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in jp} == {(3, 4), (3, 5), (4, 5)}

    ml = {(r.id_a, r.id_b): r.jaccard
          for r in minhash_lsh_pairs(df, k=3, threshold=0.5).collect()}
    assert (4, 5) in ml and ml[(4, 5)] == 1.0
    assert set(ml) <= {(3, 4), (3, 5), (4, 5)}  # LSH may miss subset pairs

    # DuckDB mini-oracle for the shingle counts
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM (VALUES (0,''),(1,'hello'),"
            "(2,'hello world'),(3,'one two three'),"
            "(4,'one two three four'),(5,'one two three four'))"
            " v(doc_id, text)")
    o = con.sql("""
      WITH toks AS (SELECT doc_id,
             list_filter(string_split(text,' '), x -> x <> '') t FROM t)
      SELECT doc_id, count(*) FROM (
        SELECT DISTINCT doc_id, unnest(list_transform(
          generate_series(1, greatest(len(t)-2, 0)),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s
        FROM toks) GROUP BY doc_id ORDER BY doc_id""").fetchall()
    want = {r[0]: r[1] for r in o}
    from collections import Counter
    got_counts = Counter(i for i, _c in got)
    assert dict(got_counts) == want


def test_winnowing_guarantee_shared_substring(spark):
    """Winnowing's core guarantee: two documents sharing a substring of
    length >= w + k - 1 share at least one selected fingerprint."""
    from edspdf_spark.operators.analysis import (WINNOW_K, WINNOW_W,
                                                 winnow_fingerprints)

    shared = "the quick brown fox jumps over it"  # > k + w - 1 chars
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    df = spark.createDataFrame(
        [(1, "AAAA " + shared + " BBBB"), (2, "xyzzy " + shared + " qq")],
        "doc_id long, text string")
    fps = winnow_fingerprints(df).collect()
    f1 = {r["fp"] for r in fps if r["id"] == 1}
    f2 = {r["fp"] for r in fps if r["id"] == 2}
    assert f1 & f2, "no shared fingerprint for a long shared substring"


def test_winnowing_short_docs_dropped(spark):
    from edspdf_spark.operators.analysis import (WINNOW_K, WINNOW_W,
                                                 winnow_fingerprints)

    df = spark.createDataFrame(
        [(1, "x" * (WINNOW_K + WINNOW_W - 2)), (2, "y" * 40)],
        "doc_id long, text string")
    got = winnow_fingerprints(df).collect()
    assert {r["id"] for r in got} == {2}


# --- containment_pairs -----------------------------------------------------

def test_containment_catches_excerpt_jaccard_misses(spark):
    from edspdf_spark.operators.dedup import (containment_pairs,
                                              jaccard_pairs,
                                              shingle_table)
    big = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(10))  # first 10 words
    df = spark.createDataFrame([(1, big), (2, excerpt)],
                               "doc_id long, text string")
    sh = shingle_table(df, k=3)
    # symmetric jaccard: 8 shared shingles / 58 union ~ 0.14 -> missed
    assert jaccard_pairs(sh, threshold=0.5).count() == 0
    got = containment_pairs(sh, threshold=0.9).collect()
    # only the excerpt->big direction passes (8/8 = 1.0); big->excerpt
    # is 8/58 and must NOT appear
    assert [(r.id_src, r.id_dst, r.containment) for r in got] == \
        [(2, 1, 1.0)]
    r = got[0]
    assert (r.inter, r.size_src, r.size_dst) == (8, 8, 58)


def test_containment_symmetric_dup_both_directions(spark):
    from edspdf_spark.operators.dedup import (containment_pairs,
                                              shingle_table)
    t = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame([(1, t), (2, t)],
                               "doc_id long, text string")
    got = sorted((r.id_src, r.id_dst)
                 for r in containment_pairs(shingle_table(df, k=3),
                                            threshold=0.99).collect())
    assert got == [(1, 2), (2, 1)]


# --- hot-shingle doc-frequency cap ----------------------------------------

def test_hot_shingle_cap_kills_stop_shingle_blowup(spark):
    """A stop-shingle present in EVERY doc must not generate the
    quadratic all-pairs set once the (default-on) cap fires: docs
    share only the stop phrase, so after the cap drops it no pair
    survives; uncapped, every pair appears."""
    from edspdf_spark.operators.dedup import (containment_pairs,
                                              jaccard_pairs,
                                              shingle_table)
    stop = "all rights reserved"
    rows = [(i, f"{stop} unique{i}a unique{i}b unique{i}c")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_table(df, k=3)

    # every doc carries the stop shingle -> doc freq 40 > cap 8
    capped = jaccard_pairs(sh, threshold=0.01, min_intersect=1,
                           max_doc_freq=8)
    assert capped.count() == 0
    assert containment_pairs(sh, threshold=0.01, min_intersect=1,
                             max_doc_freq=8).count() == 0
    # explicit opt-out reproduces the uncapped quadratic behavior
    uncapped = jaccard_pairs(sh, threshold=0.01, min_intersect=1,
                             max_doc_freq=None)
    assert uncapped.count() == 40 * 39 // 2


def test_hot_shingle_cap_default_transparent_on_clean_corpus(spark):
    """On a corpus with no hot shingles the default cap must be a
    no-op: identical pair sets and identical jaccard values."""
    from edspdf_spark.operators.dedup import jaccard_pairs, shingle_table
    rows = [(1, "one two three four five"),
            (2, "one two three four six"),
            (3, "seven eight nine ten eleven")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_table(df, k=3)
    got_default = {(r.id_a, r.id_b, r.jaccard)
                   for r in jaccard_pairs(sh, threshold=0.1).collect()}
    got_uncapped = {(r.id_a, r.id_b, r.jaccard)
                    for r in jaccard_pairs(sh, threshold=0.1,
                                           max_doc_freq=None).collect()}
    assert got_default == got_uncapped and got_default


# --- keep_best_per_cluster -------------------------------------------------

def test_keep_best_overrides_min_id(spark):
    """The higher-scoring LARGER id must win (min-id rule would pick
    the other)."""
    from pyspark.sql import functions as F
    from edspdf_spark.operators.components import keep_best_per_cluster
    corpus = spark.createDataFrame(
        [(1, "short"), (2, "a much longer better capture"),
         (3, "singleton")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    scores = corpus.select(
        "doc_id", F.length("text").cast("bigint").alias("score"))
    got = {r.id: r for r in
           keep_best_per_cluster(corpus, pairs, scores).collect()}
    assert not got[1].keep and got[2].keep          # best, not min id
    assert got[1].component == got[2].component == 1
    assert got[3].keep and got[3].component == 3    # singleton


def test_keep_best_tie_breaks_to_smallest_id(spark):
    from edspdf_spark.operators.components import keep_best_per_cluster
    corpus = spark.createDataFrame(
        [(5, "same"), (9, "same")], "doc_id long, text string")
    pairs = spark.createDataFrame([(5, 9)], "id_a long, id_b long")
    scores = spark.createDataFrame([(5, 10), (9, 10)],
                                   "doc_id long, score long")
    got = {r.id: r.keep for r in
           keep_best_per_cluster(corpus, pairs, scores).collect()}
    assert got == {5: True, 9: False}


def test_keep_best_works_with_string_ids(spark):
    """String doc ids (urls) must order correctly in the winner
    struct — the old -id negation only worked for numerics (r3
    ADVICE). Ties break to the lexicographically smallest id."""
    from edspdf_spark.operators.components import keep_best_per_cluster
    corpus = spark.createDataFrame(
        [("https://a.com/x",), ("https://b.com/x",), ("https://c.com/solo",)],
        "doc_id string")
    pairs = spark.createDataFrame(
        [("https://a.com/x", "https://b.com/x")], "id_a string, id_b string")
    scores = spark.createDataFrame(
        [("https://a.com/x", 3), ("https://b.com/x", 7),
         ("https://c.com/solo", 1)], "doc_id string, score long")
    got = {r.id: r.keep for r in
           keep_best_per_cluster(corpus, pairs, scores).collect()}
    assert got == {"https://a.com/x": False, "https://b.com/x": True,
                   "https://c.com/solo": True}
    # tie: smallest id wins, string order
    scores2 = spark.createDataFrame(
        [("https://a.com/x", 7), ("https://b.com/x", 7),
         ("https://c.com/solo", 1)], "doc_id string, score long")
    got2 = {r.id: r.keep for r in
            keep_best_per_cluster(corpus, pairs, scores2).collect()}
    assert got2["https://a.com/x"] and not got2["https://b.com/x"]


# --- edit_verified_pairs ---------------------------------------------------

def test_edit_verification_separates_true_and_false_candidates(spark):
    from edspdf_spark.operators.dedup import edit_verified_pairs
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),   # 3 edits
         (3, "a completely different sentence that shares nothing")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (1, 3)],
                                  "id_a long, id_b long")
    got = {(r.id_a, r.id_b): r
           for r in edit_verified_pairs(corpus, pairs,
                                        max_dist_milli=100).collect()}
    near = got[(1, 2)]
    assert near.dist == 3 and near.verified
    assert near.dist_milli == 1000 * 3 // 43
    far = got[(1, 3)]
    assert not far.verified and far.dist > 20


# --- intra_doc_line_dedup --------------------------------------------------

def test_intra_doc_dedup_scope_is_per_document(spark):
    from edspdf_spark.operators.dedup import intra_doc_line_dedup
    t1 = "a repeated long line\nunique middle text\na repeated long line"
    t2 = "a repeated long line\nother body"     # same line, other doc
    df = spark.createDataFrame([(1, t1), (2, t2)],
                               "doc_id long, text string")
    got = {r.id: r for r in intra_doc_line_dedup(df).collect()}
    assert got[1].text == "a repeated long line\nunique middle text"
    assert (got[1].n_lines, got[1].n_kept) == (3, 2)
    # doc 2 keeps its copy — scope is within-document only
    assert got[2].text == t2 and got[2].n_kept == 2


def test_intra_doc_dedup_short_lines_always_kept(spark):
    from edspdf_spark.operators.dedup import intra_doc_line_dedup
    df = spark.createDataFrame([(1, "ok\nbody line that is long\nok")],
                               "doc_id long, text string")
    r = intra_doc_line_dedup(df).collect()[0]
    assert r.text.count("ok") == 2 and r.n_kept == 3


def test_intra_doc_dedup_zero_shuffle(spark):
    from edspdf_spark.operators.dedup import intra_doc_line_dedup
    df = spark.createDataFrame([(1, "x\ny")], "doc_id long, text string")
    plan = intra_doc_line_dedup(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_domain_hll_matches_global_when_one_group(spark):
    from edspdf_spark.operators.analysis import hll_distinct, hll_distinct_by
    df = spark.createDataFrame(
        [(i, "g", f"text {i % 40}") for i in range(200)],
        "id long, source string, text string")
    by = hll_distinct_by(df, "source", "text").collect()[0]
    g = hll_distinct(df, "text", exact=False).collect()[0]
    assert (by.used_registers, by.s_scaled) == \
        (g.used_registers, g.s_scaled)
    assert by.estimate == g.estimate


# --- lsh_params advisor (pure math, no Spark) ------------------------------

def test_lsh_params_advisor():
    from edspdf_spark.functions import lsh_params
    import pytest as _pytest
    # the contract config: 8 hashes at threshold 0.5 -> bands of 2
    got = lsh_params(0.5, 8)
    assert (got["band_size"], got["n_bands"]) == (2, 4)
    assert got["midpoint"] == _pytest.approx(0.5, abs=0.01)
    # S-curve: catches well above threshold, thins below
    assert got["p_at_125t"] > got["p_at_threshold"] > got["p_at_075t"]
    # high threshold wants wider bands (more specific candidates)
    hi = lsh_params(0.9, 8)
    assert hi["band_size"] >= got["band_size"]
    with _pytest.raises(ValueError):
        lsh_params(1.5, 8)
