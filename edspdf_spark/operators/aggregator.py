"""Aggregation operator: labeled blocs -> (url, label, text, properties).

The exact reference kernel (kernels.aggregate, mirroring
pipes/aggregators/simple.py:108-173) applied per document. Physical
strategy: repartition by url + sortWithinPartitions, then ONE
mapInPandas whose kernel walks url groups inside each Arrow batch,
buffering groups that span batch boundaries. This is Spark's
applyInPandas semantics without its per-group overhead (one pandas
frame per ARROW BATCH instead of one per url — ~100x fewer Python
round-trips when documents are small).

This is the pipeline's ONLY shuffle (co-locate all blocs of a url);
the fused pipeline (operators/fused.py) avoids even that by never
exploding blocs out of the document.

A pure-SQL variant of the separator logic exists (lead() window +
median + concat) but float/median/ordering parity makes the Arrow
kernel the correctness-bearing path (SURVEY.md §2.6); the SQL form is
the independent ORACLE in __spark_entry__, not the engine.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..kernels.aggregate import aggregate_doc, to_markdown
from ..schemas import TEXTS_SCHEMA

LabelMap = Dict[str, Union[str, List[str]]]

_IN_COLS = ["url", "page_num", "order_idx", "x0", "x1", "y0", "y1",
            "text", "props", "label", "error"]
_OUT_COLS = ["url", "label", "text", "properties", "error"]


def _agg_one(url: str, blocs: List[dict], error: bool, sort, nl, np_,
             label_map, markdown) -> List[tuple]:
    out = aggregate_doc(blocs, sort=sort, new_line_threshold=nl,
                        new_paragraph_threshold=np_, label_map=label_map)
    rows = []
    for label, t in out.items():
        text, props = t["text"], t["properties"]
        if markdown:
            text, props = to_markdown(text, props), []
        rows.append((url, label, text, props, error))
    if not rows:
        rows.append((url, None, None, [], error))
    return rows


def aggregate(labeled_blocs: DataFrame, sort: bool = False,
              new_line_threshold: float = 0.2,
              new_paragraph_threshold: float = 1.5,
              label_map: Optional[LabelMap] = None,
              markdown: bool = False) -> DataFrame:
    """Group by url and stitch label-wise text. Input needs columns
    url, page_num, order_idx, x0, x1, y0, y1, text, props, label, error."""
    nl, np_ = new_line_threshold, new_paragraph_threshold

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tail: Optional[pd.DataFrame] = None
        for pdf in batches:
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
                tail = None
            if len(pdf) == 0:
                continue
            # the last url may continue into the next Arrow batch
            last_url = pdf["url"].iloc[-1]
            is_tail = pdf["url"] == last_url
            tail = pdf[is_tail]
            head = pdf[~is_tail]
            if len(head):
                yield _process(head)
        if tail is not None and len(tail):
            yield _process(tail)

    def _process(pdf: pd.DataFrame) -> pd.DataFrame:
        # plain-list group walk: rows arrive sorted by (url, page_num,
        # order_idx) — sortWithinPartitions upstream, order preserved
        # through the batch-boundary tail concat — so the former
        # per-group pandas sort_values was a stable no-op, and the
        # groupby/itertuples machinery cost ~10x the kernel on small
        # documents
        rows: List[tuple] = []
        urls = pdf["url"].tolist()
        pages = pdf["page_num"].tolist()
        x0s, x1s = pdf["x0"].tolist(), pdf["x1"].tolist()
        y0s, y1s = pdf["y0"].tolist(), pdf["y1"].tolist()
        texts, labels = pdf["text"].tolist(), pdf["label"].tolist()
        props_col, errs = pdf["props"].tolist(), pdf["error"].tolist()
        n = len(urls)
        i = 0
        while i < n:
            url = urls[i]
            j = i
            error = False
            blocs: List[dict] = []
            while j < n and urls[j] == url:
                if errs[j]:
                    error = True
                if pages[j] >= 0:
                    props = props_col[j]
                    blocs.append({
                        "page_num": int(pages[j]),
                        "x0": float(x0s[j]), "y0": float(y0s[j]),
                        "x1": float(x1s[j]), "y1": float(y1s[j]),
                        "text": texts[j], "label": labels[j],
                        "props": [dict(p) if not isinstance(p, dict)
                                  else p
                                  for p in (props if props is not None
                                            else [])],
                    })
                j += 1
            rows.extend(_agg_one(url, blocs, error, sort, nl, np_,
                                 label_map, markdown))
            i = j
        return pd.DataFrame(rows, columns=_OUT_COLS)

    # explicit numPartitions: without it AQE may coalesce this tiny-by-
    # bytes shuffle to ~1 partition and serialize the (CPU-heavy)
    # Python stage behind it — shuffle-size heuristics see bytes, not
    # kernel cost (same trap as plans/salt.py)
    n_parts = labeled_blocs.sparkSession.sparkContext.defaultParallelism * 2
    prepared = (labeled_blocs.select(*_IN_COLS)
                .repartition(n_parts, F.col("url"))
                .sortWithinPartitions("url", "page_num", "order_idx"))
    return prepared.mapInPandas(fn, schema=TEXTS_SCHEMA)
