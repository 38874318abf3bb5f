"""WARC source: kernel parse tests (pure Python) + Spark round-trip
(render native -> parse kernel -> original rows) + file reader."""

import pytest


def _record(url=b"http://x/a", ts=b"2024-01-01T00:00:00Z",
            payload=b"hello", wtype=b"response", extra=b""):
    return (b"WARC/1.0\r\n"
            b"WARC-Type: " + wtype + b"\r\n"
            b"WARC-Target-URI: " + url + b"\r\n"
            b"WARC-Date: " + ts + b"\r\n" + extra +
            b"Content-Length: " + str(len(payload)).encode() +
            b"\r\n\r\n" + payload + b"\r\n\r\n")


def test_parse_single_record():
    from edspdf_spark.sources.warc import parse_warc

    recs = parse_warc(_record())
    assert recs == [("http://x/a", "2024-01-01T00:00:00Z",
                     "response", b"hello")]


def test_parse_concatenated_and_binary_payload():
    from edspdf_spark.sources.warc import parse_warc

    # payload contains CRLFCRLF and even a fake version line: the
    # Content-Length slice must not be fooled
    tricky = b"a\r\n\r\nWARC/1.0\r\nstuff\x00\xff"
    blob = _record(payload=tricky) + _record(url=b"http://x/b",
                                             payload=b"", wtype=b"request")
    recs = parse_warc(blob)
    assert len(recs) == 2
    assert recs[0][3] == tricky
    assert recs[1] == ("http://x/b", "2024-01-01T00:00:00Z",
                       "request", b"")


def test_parse_case_insensitive_headers_and_truncation():
    from edspdf_spark.sources.warc import parse_warc

    blob = (b"WARC/1.0\r\ncontent-length: 3\r\n"
            b"warc-target-uri: u\r\n\r\nabc\r\n\r\n")
    assert parse_warc(blob) == [("u", "", "", b"abc")]
    # truncated final record is dropped, earlier ones kept
    full = _record() + _record(url=b"http://x/c", payload=b"0123456789")
    assert len(parse_warc(full[:-8])) == 1
    # record with unparseable length is skipped, scan continues
    bad = (b"WARC/1.0\r\nContent-Length: zzz\r\n\r\n" + _record())
    assert len(parse_warc(bad)) == 1


@pytest.fixture(scope="module")
def roundtrip_df(spark):
    from pyspark.sql import functions as F

    from edspdf_spark.sources.warc import (parse_warc_column,
                                           render_warc_record)

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, ""), (2, "line1\nline2"), (3, None)],
        "doc_id long, text string")
    blobs = docs.select(render_warc_record(
        F.concat(F.lit("u/"), F.col("doc_id").cast("string")),
        F.lit("2024-01-01T00:00:00Z"), F.col("text")).alias("blob"))
    return parse_warc_column(blobs, "blob")


def test_spark_roundtrip_recovers_rows(spark, roundtrip_df):
    rows = {r["url"]: r.asDict() for r in roundtrip_df.collect()}
    # NULL text -> NULL record (concat of NULL) -> no row
    assert set(rows) == {"u/0", "u/1", "u/2"}
    assert rows["u/0"]["content"] == b"hello world"
    assert rows["u/0"]["n_bytes"] == 11
    assert rows["u/1"]["content"] == b""
    assert rows["u/2"]["content"] == b"line1\nline2"
    assert all(r["warc_type"] == "response" for r in rows.values())


def test_read_warc_files(spark, tmp_path):
    from edspdf_spark.sources.warc import read_warc

    (tmp_path / "a.warc").write_bytes(
        _record() + _record(url=b"http://x/b", payload=b"bb"))
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "c.warc").write_bytes(
        _record(url=b"http://x/c", payload=b"ccc"))
    (tmp_path / "ignored.txt").write_bytes(b"not warc")
    rows = {r["url"]: r["n_bytes"]
            for r in read_warc(spark, str(tmp_path)).collect()}
    assert rows == {"http://x/a": 5, "http://x/b": 2, "http://x/c": 3}


def test_parse_warc_gz_member_per_record():
    import gzip

    from edspdf_spark.sources.warc import parse_warc

    # Common Crawl layout: one gzip MEMBER per record, concatenated
    gz = (gzip.compress(_record()) +
          gzip.compress(_record(url=b"http://x/b", payload=b"bb")))
    recs = parse_warc(gz)
    assert [(r[0], r[3]) for r in recs] == [("http://x/a", b"hello"),
                                            ("http://x/b", b"bb")]
    # truncated second member: first record still recovered
    assert parse_warc(gz[:len(gz) - 6])[0][0] == "http://x/a"
    # plain (non-gz) input keeps working through the same entry point
    assert len(parse_warc(_record())) == 1
