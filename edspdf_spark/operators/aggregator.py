"""Aggregation operator: labeled blocs -> (url, label, text, properties).

`applyInPandas` grouped by url running the exact reference kernel
(kernels.aggregate, mirroring pipes/aggregators/simple.py:108-173).
This is the pipeline's ONLY shuffle (group all blocs of a url
together); the fused pipeline (operators/fused.py) avoids even that
by never exploding blocs out of the document.

A pure-SQL variant of the separator logic exists (lead() window +
percentile median + concat) but float/median/ordering parity makes
the Arrow kernel the correctness-bearing path (SURVEY.md §2.6); the
SQL form is used as the independent ORACLE in __spark_entry__, not as
the engine.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels.aggregate import aggregate_doc, to_markdown
from ..schemas import TEXTS_SCHEMA

LabelMap = Dict[str, Union[str, List[str]]]


def aggregate(labeled_blocs: DataFrame, sort: bool = False,
              new_line_threshold: float = 0.2,
              new_paragraph_threshold: float = 1.5,
              label_map: Optional[LabelMap] = None,
              markdown: bool = False) -> DataFrame:
    """Group by url and stitch label-wise text. Input needs columns
    url, page_num, order_idx, x0, y0, y1, text, props, label, error."""

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        error = bool(pdf["error"].any()) if "error" in pdf else False
        body = pdf[pdf["page_num"] >= 0].sort_values(["page_num", "order_idx"])
        blocs = [{
            "page_num": int(r.page_num), "x0": float(r.x0), "y0": float(r.y0),
            "x1": float(r.x1), "y1": float(r.y1), "text": r.text,
            "label": r.label,
            "props": [dict(p) if not isinstance(p, dict) else p
                      for p in (r.props or [])],
        } for r in body.itertuples()]
        out = aggregate_doc(blocs, sort=sort,
                            new_line_threshold=new_line_threshold,
                            new_paragraph_threshold=new_paragraph_threshold,
                            label_map=label_map)
        rows = []
        for label, t in out.items():
            text = t["text"]
            props = t["properties"]
            if markdown:
                text = to_markdown(text, props)
                props = []
            rows.append((url, label, text, props, error))
        if not rows:
            rows.append((url, None, None, [], error))
        return pd.DataFrame(rows, columns=["url", "label", "text",
                                           "properties", "error"])

    return labeled_blocs.groupBy("url").applyInPandas(per_doc,
                                                      schema=TEXTS_SCHEMA)
