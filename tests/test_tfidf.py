"""TF-IDF top terms (operators/analysis.py): hand-computed golden,
rare-term dominance, deterministic tie-breaks, plan pins."""

import pytest
from pyspark.sql import functions as F

from edspdf_spark.operators.analysis import (TFIDF_IDF_SCALE,
                                             tfidf_top_terms)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ilog2(x: int) -> int:
    return x.bit_length() - 1


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(0, "apple apple banana shared"),
         (1, "banana banana banana shared"),
         (2, "cherry shared shared")],
        "doc_id long, text string")


def test_hand_computed_scores(corpus):
    got = {(r.id, r.term): (r.tf, r.df, r.score_scaled)
           for r in tfidf_top_terms(corpus, top_k=10).collect()}
    n = 3
    # apple: doc0 tf=2, df=1
    s_apple = 2 * _ilog2(n * TFIDF_IDF_SCALE // 1)
    assert got[(0, "apple")] == (2, 1, s_apple)
    # shared: appears in all 3 docs -> idf = ilog2(2^20) = 20
    assert got[(0, "shared")] == (1, 3, 1 * _ilog2(n * TFIDF_IDF_SCALE // 3))
    assert got[(2, "shared")][2] == 2 * _ilog2(n * TFIDF_IDF_SCALE // 3)
    # banana in doc1: tf=3, df=2
    assert got[(1, "banana")] == (3, 2, 3 * _ilog2(n * TFIDF_IDF_SCALE // 2))


def test_rare_term_outranks_ubiquitous(corpus):
    top1 = {r.id: r.term
            for r in tfidf_top_terms(corpus, top_k=1).collect()}
    assert top1[0] == "apple"      # tf=2 rare beats tf=1 'shared'
    assert top1[1] == "banana"
    # doc2: quantized idf(df=1)=21 vs idf(df=3)=20, so tf=2 'shared'
    # (40) legitimately beats tf=1 'cherry' (21)
    assert top1[2] == "shared"


def test_tie_break_is_term_order(spark):
    df = spark.createDataFrame([(0, "zebra apple")],
                               "doc_id long, text string")
    rows = sorted((r.rk, r.term)
                  for r in tfidf_top_terms(df, top_k=2).collect())
    # identical tf and df -> alphabetical
    assert rows == [(1, "apple"), (2, "zebra")]


def test_rank_caps_at_top_k(corpus):
    rows = tfidf_top_terms(corpus, top_k=2).collect()
    assert all(r.rk <= 2 for r in rows)
    assert len([r for r in rows if r.id == 0]) == 2


def test_plan_broadcasts_both_small_sides(corpus):
    plan = _plan(tfidf_top_terms(corpus))
    assert "EvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # one-row n_docs
