"""Compression/entropy complexity signals (operators/analysis.py):
kernel goldens vs direct zlib/entropy math (this operator is
rows-only in the driver contract — these ARE its value checks)."""

import math
import zlib

import pytest
from pyspark.sql import functions as F

from edspdf_spark.operators.analysis import complexity_signals


def _expected(text: str):
    raw = text.encode("utf-8")
    n = len(raw)
    comp = len(zlib.compress(raw, 6))
    counts = {}
    for b in raw:
        counts[b] = counts.get(b, 0) + 1
    ent = -sum((c / n) * math.log2(c / n) for c in counts.values()) \
        if n else 0.0
    return (n, comp, 1000 * comp // n if n else 0, int(ent * 1000))


@pytest.fixture(scope="module")
def got(spark):
    texts = {
        0: "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",       # degenerate
        1: "the quick brown fox jumps over the lazy dog",     # language
        2: "k9$Qz!x7Lw@3pR#vN8&mT2^jH5*bY4(cF6)dG1a",        # noise
        3: "héllo wörld ünïcode",                             # multibyte
    }
    rows = {r.id: r for r in complexity_signals(
        spark.createDataFrame(list(texts.items()),
                              "doc_id long, text string")).collect()}
    return texts, rows


def test_matches_direct_python(got):
    texts, rows = got
    for i, t in texts.items():
        e = _expected(t)
        r = rows[i]
        assert (r.n_bytes, r.deflate_bytes, r.compress_milli,
                r.entropy_milli) == e, (i, e)


def test_signal_separates_degenerate_from_noise(got):
    _, rows = got
    # repetition compresses far below language, noise far above
    assert rows[0].compress_milli < rows[1].compress_milli \
        < rows[2].compress_milli
    assert rows[0].entropy_milli < rows[1].entropy_milli \
        < rows[2].entropy_milli


def test_multibyte_counts_bytes_not_chars(got):
    texts, rows = got
    assert rows[3].n_bytes == len(texts[3].encode("utf-8"))
    assert rows[3].n_bytes > len(texts[3])


def test_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"text number {i} with words {i % 7}") for i in range(40)],
        "doc_id long, text string")
    a = sorted(map(tuple, complexity_signals(df).collect()))
    b = sorted(map(tuple,
                   complexity_signals(df.repartition(13)).collect()))
    assert a == b


def test_null_and_empty(spark):
    df = spark.createDataFrame([(0, None), (1, "")],
                               "doc_id long, text string")
    rows = {r.id: r for r in complexity_signals(df).collect()}
    assert 0 not in rows                      # null docs dropped
    assert rows[1].n_bytes == 0 and rows[1].entropy_milli == 0
    assert rows[1].compress_milli == 0
