"""As-of join: hand-computed matches, tie-break, tolerance, and the
no-range-join plan shape."""

from datetime import datetime

import pytest


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 10), 100, 9.9),
         ("u1", datetime(2024, 1, 1, 12), 101, 8.8),
         ("u2", datetime(2024, 1, 1, 11), 102, 7.7),
         ("u3", datetime(2024, 1, 1, 11), 103, 6.6)],  # no right rows
        "user string, ts timestamp, event_id long, value double")
    right = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 9), 1, 1.0),
         ("u1", datetime(2024, 1, 1, 11), 2, 2.0),
         ("u1", datetime(2024, 1, 1, 11), 3, 3.0),   # same-ts tie
         ("u1", datetime(2024, 1, 1, 13), 4, 4.0),   # future: never
         ("u2", datetime(2024, 1, 1, 11), 5, 5.0)],  # exact-ts match
        "user string, ts timestamp, event_id long, value double")
    return left, right


def test_asof_join_matches_and_ties(spark, frames):
    from edspdf_spark.operators.asof import asof_join

    left, right = frames
    rows = {r["event_id"]: r.asDict()
            for r in asof_join(left, right, "user", "ts", "event_id",
                               ["value"]).collect()}
    assert len(rows) == 4
    assert rows[100]["event_id_r"] == 1          # only 9:00 precedes
    assert rows[101]["event_id_r"] == 3          # 11:00 tie -> max id
    assert rows[101]["value_r"] == 3.0
    assert rows[102]["event_id_r"] == 5          # r.ts == l.ts matches
    assert rows[103]["event_id_r"] is None       # no right rows at all
    assert rows[103]["value"] == 6.6             # left payload intact


def test_asof_join_tolerance(spark, frames):
    from edspdf_spark.operators.asof import asof_join

    left, right = frames
    rows = {r["event_id"]: r["event_id_r"]
            for r in asof_join(left, right, "user", "ts", "event_id",
                               ["value"],
                               tolerance_s=3600.0).collect()}
    assert rows[100] == 1      # exactly 1h old -> still inside
    assert rows[101] == 3      # 1h-old tie winner
    assert rows[102] == 5      # age 0


def test_asof_join_plan_has_no_join_node(spark, frames):
    """The scalable shape: ONE key exchange + ONE window, zero Join
    operators (the naive range join explodes |l|x|r| per key)."""
    from edspdf_spark.operators.asof import asof_join

    left, right = frames
    plan = (asof_join(left, right, "user", "ts", "event_id", ["value"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1, plan
    assert "EvalPython" not in plan
