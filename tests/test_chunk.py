"""Overlapping token-window chunker (operators/pack.py):
boundary/coverage semantics and a zero-shuffle plan pin."""

import pytest
from pyspark.sql import functions as F

from edspdf_spark.operators.pack import chunk_windows


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _chunks(spark, text, window, stride):
    return sorted(
        (r.chunk_idx, r.start, r.chunk_text)
        for r in chunk_windows(_mk(spark, text), window=window,
                               stride=stride).collect())


def test_boundaries(spark):
    five = "a b c d e"
    # n < window -> single clamped chunk
    assert _chunks(spark, five, 8, 4) == [(0, 0, "a b c d e")]
    # n == window -> exactly one
    assert _chunks(spark, five, 5, 2) == [(0, 0, "a b c d e")]
    # n == window + 1 -> two, second reaches the end
    assert _chunks(spark, five, 4, 2) == [
        (0, 0, "a b c d"), (1, 2, "c d e")]
    # empty doc -> no rows
    assert _chunks(spark, "   ", 4, 2) == []


def test_every_token_covered_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(23))
    rows = chunk_windows(_mk(spark, text), window=8,
                         stride=5).collect()
    covered = set()
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert len(toks) <= 8
        covered.update(range(r.start, r.start + len(toks)))
        assert toks == [f"t{i}" for i in
                        range(r.start, r.start + len(toks))]
    assert covered == set(range(23))
    assert all(r.n_chunks == len(rows) for r in rows)


def test_no_degenerate_tail(spark):
    """A tail start inside the previous window's coverage of the end
    must not produce a fully-contained chunk."""
    text = " ".join(f"t{i}" for i in range(10))
    rows = _chunks(spark, text, 8, 4)
    # starts 0 and 4 (end 10 <= 4+8); start 8 would be contained
    assert [r[1] for r in rows] == [0, 4]


def test_validation(spark):
    df = _mk(spark, "a b c")
    with pytest.raises(ValueError):
        chunk_windows(df, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_windows(df, window=0, stride=0)


def test_plan_zero_shuffle_zero_python(spark):
    df = _mk(spark, "a b c d e f g h i j")
    plan = _plan(chunk_windows(df, window=4, stride=2))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_coverage_invariant_random_corpus(spark):
    """Seeded-random property: for any doc and any (window, stride),
    chunks tile the token sequence — first chunk starts at 0, strides
    are constant, the last chunk reaches the end, and overlap-trimmed
    concatenation reconstructs the document."""
    import random
    rng = random.Random(7)
    rows = [(i, " ".join(f"t{i}_{j}" for j in
                         range(rng.randint(0, 40))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for window, stride in [(8, 8), (8, 5), (16, 3)]:
        got = {}
        for r in chunk_windows(df, window=window,
                               stride=stride).collect():
            got.setdefault(r.id, []).append(r)
        for i, text in rows:
            toks = text.split(" ") if text else []
            toks = [t for t in toks if t]
            chunks = sorted(got.get(i, []), key=lambda r: r.chunk_idx)
            if not toks:
                assert not chunks
                continue
            assert chunks[0].start == 0
            assert all(c.start == k * stride
                       for k, c in enumerate(chunks))
            last = chunks[-1]
            last_toks = last.chunk_text.split(" ")
            assert last.start + len(last_toks) == len(toks)
            rebuilt = chunks[0].chunk_text.split(" ")
            for c in chunks[1:]:
                ct = c.chunk_text.split(" ")
                rebuilt.extend(ct[len(rebuilt) - c.start:])
            assert rebuilt == toks
