"""Fused extract->classify->aggregate pipeline: ONE mapInPandas pass.

Every reference operator is document-local (SURVEY.md §2.9), so the
whole pipeline is an embarrassingly-parallel map: no bloc explosion,
no re-grouping shuffle, no window. The plan is

    scan(url, html) -> [salted repartition] -> mapInPandas -> sink

which is the plan that survives a 100x scale-up: the only shuffle is
the optional skew-defusing repartition, and each Python worker sees
Arrow batches of (url, html) and emits (url, label, text, ...) rows.

Per-doc accounting columns (bytes_in, n_blocs, partition_id) ride on
the output so the metrics rollup (plans/metrics.py) is a cheap
aggregate instead of a second parse.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple, Union

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels.aggregate import aggregate_doc, to_markdown
from ..kernels.alignment import classify_with_masks
from ..kernels.extract import extract_doc
from ..kernels.html import extract_html_text, looks_like_html
from ..schemas import FUSED_SCHEMA

# (page_num|None, x0, x1, y0, y1, label) — kernel mask layout
KernelMask = Tuple[Optional[int], float, float, float, float, str]


@dataclass
class PipelineConfig:
    """Everything the reference configures through its registry
    (SURVEY.md §1.4), as one broadcastable value object."""

    masks: List[KernelMask] = field(default_factory=list)
    threshold: float = 1.0
    extract_style: bool = False
    sort: bool = False
    new_line_threshold: float = 0.2
    new_paragraph_threshold: float = 1.5
    label_map: Optional[Dict[str, Union[str, List[str]]]] = None
    markdown: bool = False
    keep_labels: Optional[Sequence[str]] = None  # None => keep all
    # nested §2.7 embedding component spec (plans/config.py
    # parse_embedding_spec); consumed by embeddings.embed_from_spec
    embedding_spec: Optional[Dict] = None


def process_doc(url: str, html: bytes, cfg: PipelineConfig
                ) -> List[Tuple]:
    """One document through the full chain. Returns FUSED_SCHEMA tuples.

    Content sniffing: %PDF payloads take the layout path; HTML
    payloads take the boilerplate-strip path (north rule: the corpus
    is Common-Crawl-style, so both arrive in the same binary column).
    """
    n_bytes = len(html) if html is not None else 0
    if html is not None and not html.startswith(b"%PDF-") \
            and looks_like_html(html):
        text, stats = extract_html_text(html)
        label = "body" if text else None
        if cfg.keep_labels is not None and label is not None \
                and label not in cfg.keep_labels:
            return []
        return [(url, label, text if text else None, [], False, 1,
                 int(stats["n_blocks"]), n_bytes, -1)]

    res = extract_doc(html, extract_style=cfg.extract_style)
    if res["error"]:
        return [(url, None, None, [], True, 0, 0, n_bytes, -1)]

    blocs = res["blocs"]
    keys = [(b["page_num"], b["x0"], b["x1"], b["y0"], b["y1"]) for b in blocs]
    labels = classify_with_masks(cfg.masks, keys, threshold=cfg.threshold)
    for b, lab in zip(blocs, labels):
        b["label"] = lab

    agg = aggregate_doc(blocs, sort=cfg.sort,
                        new_line_threshold=cfg.new_line_threshold,
                        new_paragraph_threshold=cfg.new_paragraph_threshold,
                        label_map=cfg.label_map)
    rows = []
    for label, t in agg.items():
        if cfg.keep_labels is not None and label not in cfg.keep_labels:
            continue
        text, props = t["text"], t["properties"]
        if cfg.markdown:
            text, props = to_markdown(text, props), []
        rows.append((url, label, text, props, False,
                     int(res["num_pages"]), len(blocs), n_bytes, -1))
    if not rows:
        rows.append((url, None, None, [], False, int(res["num_pages"]),
                     len(blocs), n_bytes, -1))
    return rows


_PROPS_PA_FIELDS = [("italic", "bool_"), ("bold", "bool_"),
                    ("begin", "int32"), ("end", "int32"),
                    ("fontname", "string")]


def run_fused(pages: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """pages(url, html, ...) -> FUSED_SCHEMA. Zero-shuffle map.

    Uses mapInArrow, not mapInPandas: the input payload column is
    large binary, and skipping the Arrow<->pandas conversion on both
    sides is worth ~20% end-to-end on this pipeline (measured)."""
    import pyarrow as pa

    props_type = pa.list_(pa.struct(
        [(n, getattr(pa, t)()) for n, t in _PROPS_PA_FIELDS]))

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for batch in batches:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            rows: List[Tuple] = []
            for url, html in zip(urls, htmls):
                doc_rows = process_doc(
                    url, html if html is not None else b"", cfg)
                rows.extend(r[:-1] + (pid,) for r in doc_rows)
            if not rows:
                continue
            cols = list(zip(*rows))
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[0], pa.string()),
                 pa.array(cols[1], pa.string()),
                 pa.array(cols[2], pa.string()),
                 pa.array(cols[3], props_type),
                 pa.array(cols[4], pa.bool_()),
                 pa.array(cols[5], pa.int32()),
                 pa.array(cols[6], pa.int32()),
                 pa.array(cols[7], pa.int64()),
                 pa.array(cols[8], pa.int32())],
                names=[f.name for f in FUSED_SCHEMA.fields])

    return pages.select("url", "html").mapInArrow(fn, schema=FUSED_SCHEMA)
