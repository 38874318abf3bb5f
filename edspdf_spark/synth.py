"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Generates the Common-Crawl-style `pages` table required by
BASELINE.json's input_hint: (url STRING, warc_ts TIMESTAMP,
html BINARY, text STRING, lang STRING). The `html` column carries
deterministic synthetic PDF bytes (built with kernels.pdf.build_pdf)
or, for the HTML path, synthetic boilerplate-wrapped HTML.

Per-doc recipe (seed = doc index i, no RNG state shared across docs):
* page count: 1 + (i % 3)
* per page: header line near y_top=0.05, body lines in x [0.12, 0.88],
  y [0.15, 0.70] with line pitches exercising the aggregator's " ",
  "\n" and "\n\n" separator regimes
  (reference thresholds: simple.py:156-166), footer near y_top=0.95
* every 7th doc: bold and italic spans (style path)
* every 13th doc: truncated bytes -> extractor must yield error=true
* every 17th doc: oversized (max pages, 30+ lines/page) for skew tests
* every 5th doc (i%5==2): FlateDecode-compressed content streams —
  the compressed-parse path runs inside every e2e pipeline
* every 9th doc (i%9==4): PDF-1.5 /ObjStm layout (dict objects packed
  into one compressed object stream) — the other ubiquitous real-PDF
  structure, also exercised inside every e2e pipeline
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, List, Optional, Tuple

from .kernels.pdf import (PAGE_HEIGHT, PAGE_WIDTH, Line, Segment, build_pdf)

_VOCAB = [
    "data", "table", "query", "spark", "scan", "batch", "merge", "row",
    "column", "filter", "window", "group", "sort", "join", "hash", "value",
    "stream", "vector", "page", "line", "text", "body", "header", "extract",
]

_LANGS = ["en", "fr", "de"]

# body font size used everywhere; normalized line height = SIZE / PAGE_HEIGHT
SIZE = 10.0
LINE_H = SIZE  # ascent-descent span = size under the monospaced model


def _words(i: int, p: int, k: int, n: int) -> str:
    out = []
    state = (i * 1_000_003 + p * 10_007 + k * 101 + 17) & 0x7FFFFFFF
    for j in range(n):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(_VOCAB[state % len(_VOCAB)])
    return " ".join(out)


def make_pdf_bytes(i: int) -> bytes:
    """Deterministic PDF bytes for doc index i (may be corrupt by design)."""
    oversized = (i % 17) == 0 and i > 0
    n_pages = 3 if oversized else 1 + (i % 3)
    styled = (i % 7) == 0

    pages: List[List[Line]] = []
    for p in range(n_pages):
        lines: List[Line] = []
        # header near normalized top y=0.05 -> pdf baseline y
        lines.append(Line.simple(
            x=0.12 * PAGE_WIDTH,
            y=PAGE_HEIGHT * (1 - 0.05) - LINE_H,
            text=f"Page {p + 1} of doc {i:08d}", size=SIZE))

        n_body = 34 if oversized else 3 + ((i * 7 + p) % 6)
        # walk y downward from 0.15; dy (in units of line height) cycles
        # through the three separator regimes of simple.py:156-166:
        #   0.5 / 0.1 -> lines overlap vertically          -> " "
        #   1.3       -> disjoint, 0.2 < dy/h <= 1.5       -> "\n"
        #   2.5       -> disjoint, dy/h > 1.5              -> "\n\n"
        # Layouts are INVERSION-FREE under the reference Box.__lt__
        # relation (generation order == reading order, making the e2e
        # output closed-form SQL-derivable): a line that vertically
        # overlaps its predecessor (dy mult 0.5/0.1) copies the
        # predecessor's x and word count, which bounds the shrunk-box
        # width ratio below the horizontal-disjointness threshold; the
        # ambiguous-order cases stay covered by the reading-order
        # kernel's differential tests.
        y_top = 0.15
        dy_mults = [1.3, 2.5, 0.5, 1.3, 0.1, 2.5, 1.3]
        h_norm = LINE_H / PAGE_HEIGHT
        for k in range(n_body):
            src = k - 1 if k > 0 and dy_mults[(i + k - 1) % 7] < 1.0 else k
            x_norm = 0.12 + 0.02 * ((i + src) % 5)
            baseline = PAGE_HEIGHT * (1 - y_top) - LINE_H * 0.8
            n_words = 3 + ((i + p + src) % 4)
            if styled and k == 1:
                segs = [
                    Segment(text=_words(i, p, k, 2) + " ", size=SIZE),
                    Segment(text=_words(i, p, k + 50, 1), font="Helvetica-Bold",
                            size=SIZE),
                    Segment(text=" " + _words(i, p, k + 90, 1),
                            font="Helvetica-Italic", size=SIZE),
                ]
                lines.append(Line(x=x_norm * PAGE_WIDTH, y=baseline,
                                  segments=segs))
            else:
                lines.append(Line.simple(x=x_norm * PAGE_WIDTH, y=baseline,
                                         text=_words(i, p, k, n_words),
                                         size=SIZE))
            y_top += dy_mults[(i + k) % len(dy_mults)] * h_norm
            # guard only (never fires: 34 lines * mean dy 1.36 * h stays
            # under 0.88) — a y reset would re-enter already-covered
            # vertical space and break the inversion-free property
            if y_top > 0.88:
                y_top = 0.88
        # footer near y=0.95
        lines.append(Line.simple(
            x=0.40 * PAGE_WIDTH,
            y=PAGE_HEIGHT * (1 - 0.95) - LINE_H * 0.2,
            text=f"footer {i % 100}", size=8.0))
        pages.append(lines)

    data = build_pdf(pages, compress=(i % 5) == 2, objstm=(i % 9) == 4)
    if (i % 13) == 0 and i > 0:
        return data[:100]  # deliberately corrupt
    return data


def synth_html_bytes(i: int) -> bytes:
    """Deterministic boilerplate-wrapped HTML page for the HTML path."""
    body_paras = [
        f"<p>{_words(i, 0, 10 + k, 12)}.</p>" for k in range(3 + i % 4)
    ]
    html = (
        "<html><head><title>doc {i}</title>"
        "<style>.x{{color:red}}</style>"
        "<script>var a = 1;</script></head><body>"
        "<nav><ul><li><a href='/'>home</a></li><li><a href='/x'>x</a></li>"
        "</ul></nav>"
        "<header><h1>site banner</h1></header>"
        "<div id='main'><article>{paras}</article></div>"
        "<aside>ads ads ads</aside>"
        "<footer>copyright footer {j}</footer>"
        "</body></html>"
    ).format(i=i, paras="".join(body_paras), j=i % 10)
    return html.encode("utf-8")


def iter_pages(n: int, kind: str = "pdf") -> Iterator[Tuple[str, _dt.datetime,
                                                            bytes, str, str]]:
    """Yield (url, warc_ts, html, text, lang) rows for doc indices 0..n-1."""
    t0 = _dt.datetime(2024, 1, 1, 0, 0, 0)
    for i in range(n):
        if kind == "pdf":
            payload = make_pdf_bytes(i)
        elif kind == "html":
            payload = synth_html_bytes(i)
        else:
            raise ValueError(kind)
        yield (
            f"https://example.org/doc/{i:08d}.pdf",
            t0 + _dt.timedelta(seconds=i),
            payload,
            "",
            _LANGS[i % len(_LANGS)],
        )


def pages_pandas(n: int, kind: str = "pdf"):
    """pages table as a pandas DataFrame (Arrow-friendly dtypes)."""
    import pandas as pd

    rows = list(iter_pages(n, kind=kind))
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"])


def pages_spark(spark, n: int, kind: str = "pdf", num_partitions: Optional[int] = None):
    """pages table as a Spark DataFrame.

    Rows are generated ON THE EXECUTORS from a range of doc indices —
    never collected on the driver — so this scales to arbitrary n: the
    10^12-row premise is a `spark.range` + generator map, exactly how a
    real backfill over Iceberg-scanned WARC ids would look.
    """
    from pyspark.sql import functions as F  # noqa: N812

    from .schemas import PAGES_SCHEMA

    rng = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        import pandas as pd

        t0 = _dt.datetime(2024, 1, 1, 0, 0, 0)
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = []
            for i in ids:
                payload = make_pdf_bytes(i) if kind == "pdf" else synth_html_bytes(i)
                rows.append((f"https://example.org/doc/{i:08d}.pdf",
                             t0 + _dt.timedelta(seconds=int(i)), payload, "",
                             _LANGS[i % len(_LANGS)]))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html",
                                              "text", "lang"])

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp"))
