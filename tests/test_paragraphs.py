"""jusText-style paragraph classification (operators/analysis.py):
context-free thresholds, nearest-decisive context inheritance in both
directions, blank handling, plan pins."""

import pytest

from edspdf_spark.operators.analysis import paragraph_classify

STOPS = ["the", "of", "and"]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _classify(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = paragraph_classify(df, STOPS, **kw).collect()
    return sorted((r.para_idx, r.init_class, r.final_class) for r in rows)


GOOD = "the quick fox of the meadow and the hound of the valley run far"
BAD = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
MID = "the alpha beta gamma delta epsilon zeta eta theta iota kappa " \
      "lambda mu nu xi"          # 1/15 tokens ~ 66 milli -> near-good


def test_context_free_classes(spark):
    got = _classify(spark, f"{GOOD}\n{BAD}\nhi")
    assert got == [(0, "good", "good"), (1, "bad", "bad"),
                   (2, "short", "bad")]


def test_short_inherits_from_next_good(spark):
    got = _classify(spark, f"hi\n{GOOD}")
    assert got[0] == (0, "short", "good")


def test_short_inherits_from_prev_good_over_gap(spark):
    # short between good and bad: prev decisive good wins
    got = _classify(spark, f"{GOOD}\nhi\n{BAD}")
    assert got[1] == (1, "short", "good")


def test_near_good_promoted_next_to_good(spark):
    got = _classify(spark, f"{MID}\n{GOOD}", stop_lo_milli=50)
    assert got[0] == (0, "near-good", "good")


def test_near_good_demoted_between_bads(spark):
    got = _classify(spark, f"{BAD}\n{MID}\n{BAD}", stop_lo_milli=50)
    assert got[1] == (1, "near-good", "bad")


def test_ambiguous_only_document_all_bad(spark):
    got = _classify(spark, "hi\nyo")
    assert got == [(0, "short", "bad"), (1, "short", "bad")]


def test_blank_paragraphs_dropped(spark):
    got = _classify(spark, f"{GOOD}\n   \n{BAD}")
    assert [i for i, _, _ in got] == [0, 2]


def test_plan_single_exchange_no_python(spark):
    df = spark.createDataFrame([(0, f"{GOOD}\n{BAD}")],
                               "doc_id long, text string")
    plan = _plan(paragraph_classify(df, STOPS))
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1, plan
