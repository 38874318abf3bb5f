"""Annotation overlay operator — show_annotations for a cluster
(reference visualization/annotations.py:34-130, reimplemented without
pypdfium2/PIL in kernels/pdf.py): each document's classified blocs are
drawn as colored rectangle outlines INTO the PDF itself, so the dump
is viewable in any PDF tool and round-trips through the extractor
unchanged.

Plan shape: one mapInPandas over (url, html) — extract, classify,
rewrite — zero shuffles, same as the fused pipeline; pair with
sources.writers.write_files for an annotation-tool export."""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels.alignment import classify_with_masks
from ..kernels.extract import extract_doc
from ..kernels.pdf import PdfParseError, annotate_pdf
from .fused import PipelineConfig


def annotate_doc(url: str, html: bytes, cfg: PipelineConfig,
                 colors: Optional[dict] = None) -> bytes:
    """One document: extract -> mask-classify -> overlay. Documents the
    extractor cannot parse (corrupt, HTML payloads) pass through
    unchanged — annotation is best-effort tooling, never a failure."""
    res = extract_doc(html)
    if res["error"] or not res["blocs"]:
        return bytes(html)
    blocs = res["blocs"]
    keys = [(b["page_num"], b["x0"], b["x1"], b["y0"], b["y1"])
            for b in blocs]
    labels = classify_with_masks(cfg.masks, keys, threshold=cfg.threshold)
    annotations = [(b["page_num"], b["x0"], b["x1"], b["y0"], b["y1"], lab)
                   for b, lab in zip(blocs, labels)]
    try:
        return annotate_pdf(bytes(html), annotations, colors)
    except PdfParseError:  # pragma: no cover - extract_doc just parsed it
        return bytes(html)


def run_annotate(pages: DataFrame, cfg: PipelineConfig,
                 colors: Optional[dict] = None) -> DataFrame:
    """pages(url, html, ...) -> (url, html) with overlay rectangles."""
    pruned = pages.select("url", "html")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "url": pdf["url"],
                "html": [annotate_doc(u, h if h is not None else b"",
                                      cfg, colors)
                         for u, h in zip(pdf["url"].tolist(),
                                         pdf["html"].tolist())],
            })
            yield out

    return pruned.mapInPandas(fn, schema="url string, html binary")
