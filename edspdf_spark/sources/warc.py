"""WARC record source — Common-Crawl-style ingestion.

The canonical pages table `(url, warc_ts, html, text, lang)` mirrors
what a Common Crawl WARC dump carries; this module closes the loop by
reading actual WARC/1.0 response records into that shape (and
rendering them, so the round-trip is testable without external data).

* render_warc_record — a NATIVE column expression building one
  WARC/1.0 response record per row (header block + Content-Length +
  payload). Pure codegen string/binary concat, zero Python.
* parse_warc — the inverse kernel over raw bytes: splits records on
  the version line, reads headers case-insensitively, slices payload
  by Content-Length (never by delimiter scanning, so payloads may
  contain anything, including "WARC/1.0").
* read_warc — directory of *.warc / *.warc.gz files -> one row per
  record via the binaryFile datasource + a mapInArrow batch parse
  (.gz = one gzip member per record, the Common Crawl layout).

Scale shape: WARC files are independently splittable at record
granularity but binaryFile loads whole files — Common Crawl segments
are ~1 GB gz members, which is the right task granularity anyway (one
task per segment file, thousands of segments per crawl). The parse is
a streaming scan over each blob: O(bytes), no backtracking.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType)

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"

WARC_RECORD_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", StringType()),
    StructField("warc_type", StringType()),
    StructField("content", BinaryType()),
    StructField("n_bytes", LongType()),
])


def render_warc_record(url_col: Column, ts_col: Column,
                       payload_col: Column) -> Column:
    """One WARC/1.0 response record as a BINARY column: version line,
    WARC-Type/-Target-URI/-Date headers, Content-Length in octets,
    blank line, payload, record separator. All native concat —
    whole-stage codegen, no Python."""
    payload = payload_col.cast("binary")
    head = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: "), url_col, F.lit("\r\n"),
        F.lit("WARC-Date: "), ts_col, F.lit("\r\n"),
        F.lit("Content-Length: "),
        F.length(payload).cast("string"), F.lit("\r\n\r\n"))
    return F.concat(head.cast("binary"), payload,
                    F.lit("\r\n\r\n").cast("binary"))


def render_wet_record(url_col: Column, ts_col: Column,
                      text_col: Column) -> Column:
    """One WET record (WARC/1.0 `conversion` record, the Common-Crawl
    extracted-text artifact) as a BINARY column: the pipeline shape is
    read WARC -> extract main text -> write WET. Content-Length is in
    OCTETS of the utf-8 payload (F.length on binary counts bytes).
    All native concat — whole-stage codegen, no Python; oracled
    engine-portably (DuckDB octet_length agrees on the byte count)."""
    payload = F.encode(text_col, "UTF-8")
    head = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: conversion\r\n"),
        F.lit("WARC-Target-URI: "), url_col, F.lit("\r\n"),
        F.lit("WARC-Date: "), ts_col, F.lit("\r\n"),
        F.lit("Content-Type: text/plain\r\n"),
        F.lit("Content-Length: "),
        F.length(payload).cast("string"), F.lit("\r\n\r\n"))
    return F.concat(head.cast("binary"), payload,
                    F.lit("\r\n\r\n").cast("binary"))


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a .warc.gz payload: Common Crawl gzips each record
    as its own member and concatenates, so decompression must loop
    over members (one zlib stream ends where the next begins).
    Truncated trailing members yield what decompressed so far."""
    import zlib

    out = []
    pos = 0
    while pos < len(blob) and blob[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(blob[pos:]))
        except zlib.error:
            break
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0 or not d.eof:
            break
        pos += consumed
    return b"".join(out)


def parse_warc(blob: bytes) -> List[Tuple[str, str, str, bytes]]:
    """Parse concatenated WARC/1.0 records from raw bytes.

    Returns [(url, warc_ts, warc_type, payload)]. Payloads are sliced
    by Content-Length exactly; malformed trailing bytes end the scan
    (truncated final records are dropped, matching lenient production
    readers). Header names are case-insensitive per the WARC spec.
    """
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    out: List[Tuple[str, str, str, bytes]] = []
    pos = 0
    n = len(blob)
    while True:
        start = blob.find(WARC_VERSION, pos)
        if start < 0:
            break
        hdr_end = blob.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers = {}
        for line in blob[start:hdr_end].split(_CRLF)[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        if body_start + length > n:
            break  # truncated record
        payload = blob[body_start:body_start + length]
        out.append((
            headers.get(b"warc-target-uri", b"").decode(
                "utf-8", "replace"),
            headers.get(b"warc-date", b"").decode("utf-8", "replace"),
            headers.get(b"warc-type", b"").decode("utf-8", "replace"),
            payload,
        ))
        pos = body_start + length
    return out


def parse_warc_column(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Explode a binary column of WARC bytes into record rows
    (WARC_RECORD_SCHEMA). Arrow-batched; one task may emit many
    records per input row."""
    import pyarrow as pa

    idx_schema = WARC_RECORD_SCHEMA

    def fn(batches: Iterator["pa.RecordBatch"]):
        for batch in batches:
            col = batch.column(blob_col)
            urls: list = []
            tss: list = []
            types: list = []
            payloads: list = []
            sizes: list = []
            for v in col:
                blob = v.as_py()
                if blob is None:
                    continue
                for url, ts, wtype, payload in parse_warc(blob):
                    urls.append(url)
                    tss.append(ts)
                    types.append(wtype)
                    payloads.append(payload)
                    sizes.append(len(payload))
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(tss, pa.string()),
                 pa.array(types, pa.string()),
                 pa.array(payloads, pa.binary()),
                 pa.array(sizes, pa.int64())],
                names=[f.name for f in idx_schema.fields])

    return df.select(blob_col).mapInArrow(fn, schema=idx_schema)


def read_warc(spark: SparkSession, path: str,
              recursive: bool = True) -> DataFrame:
    """Directory of *.warc / *.warc.gz files -> one row per WARC
    record (WARC_RECORD_SCHEMA), via binaryFile + the batch parse
    kernel (member-wise gunzip is transparent)."""
    reader = (spark.read.format("binaryFile")
              .option("pathGlobFilter", "*.warc*"))
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path).select(F.col("content").alias("blob"))
    return parse_warc_column(files, "blob")
