"""Crawl-refresh operators: snapshot_diff (operators/dedup.py) and
fix_mojibake (operators/analysis.py)."""

from edspdf_spark.operators.analysis import fix_mojibake
from edspdf_spark.operators.dedup import snapshot_diff


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_snapshot_diff_all_four_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone")],
        "url string, text string")
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "fresh")],
        "url string, text string")
    got = {r.key: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed",
                   "u3": "removed", "u4": "added"}


def test_snapshot_diff_hashes_not_text(spark):
    """The join plan must carry md5 columns, never the text column."""
    old = spark.createDataFrame([("u1", "x" * 1000)],
                                "url string, text string")
    new = spark.createDataFrame([("u1", "y" * 1000)],
                                "url string, text string")
    d = snapshot_diff(old, new)
    plan = _plan(d)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan, plan
    r = d.collect()[0]
    assert r.status == "changed" and len(r.old_md5) == 32


def test_mojibake_repairs_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "the cafÃ© donâ€™t"), (1, "clean text"),
         (2, "â€œxâ€“yâ€¦ Ã¼ber")],
        "doc_id long, text string")
    got = {r.id: r for r in fix_mojibake(df).collect()}
    assert got[0].text_fixed == "the café don’t"
    assert got[0].n_fixes == 2 and got[0].had_mojibake
    assert got[1].text_fixed == "clean text"
    assert got[1].n_fixes == 0 and not got[1].had_mojibake
    assert got[2].text_fixed == "“x–y… über"
    assert got[2].n_fixes == 4


def test_mojibake_idempotent(spark):
    df = spark.createDataFrame([(0, "rÃ©sumÃ©")],
                               "doc_id long, text string")
    once = fix_mojibake(df).collect()[0]
    again = fix_mojibake(
        df.sparkSession.createDataFrame([(0, once.text_fixed)],
                                        "doc_id long, text string")
    ).collect()[0]
    assert once.text_fixed == "résumé" and once.n_fixes == 2
    assert again.text_fixed == once.text_fixed and again.n_fixes == 0


def test_mojibake_plan_pure_codegen(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = _plan(fix_mojibake(df))
    assert "EvalPython" not in plan
    assert "Exchange" not in plan, plan


# --- normalize_text / domain_top_terms -------------------------------------

def test_normalize_folds_and_collapses(spark):
    from edspdf_spark.operators.analysis import normalize_text
    df = spark.createDataFrame(
        [(0, "It’s “Fine” – really…  ok then "),
         (1, "it's \"fine\" - really... ok then")],
        "doc_id long, text string")
    rows = {r.id: r for r in normalize_text(df).collect()}
    assert rows[0].text_norm == "it's \"fine\" - really... ok then"
    assert rows[0].text_norm == rows[1].text_norm
    assert rows[0].norm_code == rows[1].norm_code


def test_normalize_plan_zero_shuffle(spark):
    from edspdf_spark.operators.analysis import normalize_text
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = normalize_text(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_domain_top_terms_distinctive(spark):
    from edspdf_spark.operators.analysis import domain_top_terms
    df = spark.createDataFrame(
        [(1, "cooking", "recipe soup recipe bread shared"),
         (2, "cooking", "recipe cake shared"),
         (3, "sports", "goal match goal shared"),
         (4, "sports", "match referee shared")],
        "doc_id long, source string, text string")
    top1 = {r.domain: r.term
            for r in domain_top_terms(df, top_k=1).collect()}
    assert top1 == {"cooking": "recipe", "sports": "goal"}


def test_normalize_idempotent_random(spark):
    import random
    from edspdf_spark.operators.analysis import normalize_text
    rng = random.Random(11)
    alphabet = "aA zZ09’‘“”–—… \t.,-'\""
    rows = [(i, "".join(rng.choice(alphabet) for _ in
                        range(rng.randint(0, 60))))
            for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = {r.id: r.text_norm for r in normalize_text(df).collect()}
    df2 = spark.createDataFrame(list(once.items()),
                                "doc_id long, text string")
    twice = {r.id: r.text_norm for r in normalize_text(df2).collect()}
    assert once == twice


def test_intra_line_dedup_idempotent_random(spark):
    import random
    from edspdf_spark.operators.dedup import intra_doc_line_dedup
    rng = random.Random(13)
    lines = ["a boilerplate line here", "another long line of text",
             "hi", "third distinct long line"]
    rows = [(i, "\n".join(rng.choice(lines)
                          for _ in range(rng.randint(0, 8))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = {r.id: r.text
            for r in intra_doc_line_dedup(df).collect()}
    df2 = spark.createDataFrame(list(once.items()),
                                "doc_id long, text string")
    twice = {r.id: r.text
             for r in intra_doc_line_dedup(df2).collect()}
    assert once == twice
