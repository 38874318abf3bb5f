"""Stateful streaming dedup (applyInPandasWithState): first-seen
semantics hold within a micro-batch, across micro-batches, and across
RESTARTS (checkpointed state)."""

import datetime as dt

import pandas as pd
import pytest

from edspdf_spark.streaming.stateful import (keyed_hashes,
                                             run_first_seen_stream)

T0 = dt.datetime(2024, 1, 1)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, T0, c.encode(), "", None) for u, c in rows],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string")


def test_keyed_hashes_sharding(spark):
    df = _pages(spark, [("u1", "aaa"), ("u2", "aaa"), ("u3", "bbb")])
    rows = keyed_hashes(df).collect()
    by_url = {r["url"]: r for r in rows}
    assert by_url["u1"]["content_md5"] == by_url["u2"]["content_md5"]
    assert by_url["u1"]["shard"] == by_url["u1"]["content_md5"][0]
    assert len(by_url["u1"]["content_md5"]) == 15


def test_keyed_hashes_binary_payloads_do_not_collide(spark):
    """Distinct binary payloads that decode identically under lossy
    UTF-8 replacement (invalid sequences) must hash differently — the
    md5 runs on raw bytes, never on a string cast."""
    import hashlib

    df = spark.createDataFrame(
        [("u1", T0, b"\xff\xfe A", "", None),
         ("u2", T0, b"\xfe\xff A", "", None)],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string")
    rows = {r["url"]: r["content_md5"] for r in keyed_hashes(df).collect()}
    assert rows["u1"] != rows["u2"]
    assert rows["u1"] == hashlib.md5(b"\xff\xfe A").hexdigest()[:15]


def test_first_seen_across_batches_and_restart(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    schema = ("url string, warc_ts timestamp, html binary, text string,"
              " lang string")

    # batch 1: u2 duplicates u1's content within the batch
    b1 = _pages(spark, [("u1", "alpha"), ("u2", "alpha"), ("u3", "beta")])
    b1.write.mode("append").parquet(in_dir)
    q = run_first_seen_stream(spark, in_dir, out_dir, ck,
                              spark.read.parquet(in_dir).schema)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir).toPandas()
    assert sorted(got1["content_md5"].unique()) == \
        sorted(got1["content_md5"].tolist())  # one row per content
    assert set(got1["content_md5"]) == {
        r["content_md5"] for r in keyed_hashes(b1).collect()}
    n1 = len(got1)
    assert n1 == 2  # alpha once, beta once

    # batch 2 after RESTART: repeats alpha/beta, adds gamma — only
    # gamma may emit (state survived the checkpoint)
    b2 = _pages(spark, [("u4", "alpha"), ("u5", "beta"), ("u6", "gamma")])
    b2.write.mode("append").parquet(in_dir)
    q2 = run_first_seen_stream(spark, in_dir, out_dir, ck,
                               spark.read.parquet(in_dir).schema)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir).toPandas()
    assert len(got2) == n1 + 1
    new = got2[~got2["content_md5"].isin(got1["content_md5"])]
    assert list(new["url"]) == ["u6"]
    assert bool(new["first_seen"].iloc[0])


# --- streaming near-dup (per-band state) -----------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_row_bands_match_batch_lsh(spark):
    """Streaming per-row band keys carry the same minhash values as
    the batch signature path for identical text."""
    from edspdf_spark.operators.dedup import (minhash_signatures,
                                              shingle_table)
    from edspdf_spark.streaming.stateful import row_minhash_bands

    corpus = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6 w7 w8")], "doc_id long, text string")
    sig = minhash_signatures(shingle_table(corpus, k=3),
                             n_hashes=8).collect()[0]
    got = sorted(r.band_key for r in row_minhash_bands(
        _docs(spark, [("u", "w1 w2 w3 w4 w5 w6 w7 w8")]),
        k=3, n_hashes=8, band_size=2).collect())
    want = sorted(f"{i}:{sig[f'h{2*i}']}:{sig[f'h{2*i+1}']}"
                  for i in range(4))
    assert got == want


def test_streaming_near_dup_across_batches(spark, tmp_path):
    from edspdf_spark.streaming.stateful import (band_near_dup_rollup,
                                                 run_near_dup_stream)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    base = "alpha beta gamma delta epsilon zeta eta theta"

    b1 = _docs(spark, [("u1", base), ("u2", "totally different words "
                                            "one two three four")])
    b1.write.mode("append").parquet(in_dir)
    q = run_near_dup_stream(spark, in_dir, out_dir, ck,
                            spark.read.parquet(in_dir).schema)
    q.awaitTermination(120)
    got1 = {r.url: r for r in band_near_dup_rollup(
        spark.read.parquet(out_dir)).collect()}
    assert not got1["u1"].near_dup and not got1["u2"].near_dup

    # batch 2 after restart: u3 = u1's text with one word changed at
    # the END (shares leading bands); u4 unrelated
    b2 = _docs(spark, [("u3", base.rsplit(" ", 1)[0] + " CHANGED"),
                       ("u4", "another unrelated document body here")])
    b2.write.mode("append").parquet(in_dir)
    q2 = run_near_dup_stream(spark, in_dir, out_dir, ck,
                             spark.read.parquet(in_dir).schema)
    q2.awaitTermination(120)
    got2 = {r.url: r for r in band_near_dup_rollup(
        spark.read.parquet(out_dir)).collect()}
    assert got2["u3"].near_dup and got2["u3"].matched_url == "u1"
    assert not got2["u4"].near_dup
    # earlier verdicts unchanged
    assert not got2["u1"].near_dup and not got2["u2"].near_dup


def test_streaming_short_docs_emit_nothing(spark):
    from edspdf_spark.streaming.stateful import row_minhash_bands
    assert row_minhash_bands(
        _docs(spark, [("u", "one two")]), k=3).count() == 0
