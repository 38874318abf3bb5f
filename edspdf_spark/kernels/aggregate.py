"""Label-wise text aggregation.

Replicates `SimpleAggregator.__call__`
(`/root/reference/edspdf/pipes/aggregators/simple.py:108-173`) over
plain dict blocs:

* row_height = mean(y1-y0) over ALL text boxes, computed BEFORE the
  empty/unlabeled filter (simple.py:110)
* optional re-sort by (label, page_num, y1 // row_height, x0)
* label_map fan-out: one input label may feed several output labels,
  duplicating the bloc (simple.py:101-104, 123-132); mapped output
  labels are pre-seeded so they exist even when empty (simple.py:129)
* per output label: height = np.median(y1-y0); separator between
  consecutive lines: page change -> "\n\n"; dy/height > 1.5 AND
  next.y0 > cur.y1 -> "\n\n"; dy/height > 0.2 AND disjoint -> "\n";
  else " " (simple.py:139-166; thresholds strictly >)
* style spans rebased by the cumulative text length (simple.py:147-153)

Also provides the markdown post-pass from the reference recipe
(`tests/recipes/test_markdown_aggregator.py:6-36`).

Doc-local, pure Python/numpy float64; called from applyInPandas /
mapInPandas kernels. Never a distributed group-sort: the bloc lists
here are one document's.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

Bloc = Dict[str, object]
LabelMap = Dict[str, Union[str, List[str]]]

_NAN = np.float64("nan")


def _median_f64(vals: List[float]) -> np.float64:
    """np.median over a small float list without the array-creation
    overhead (this runs once per document-label): bit-identical —
    same sort-and-middle selection, even length averages the two
    middles as (a+b)/2 in float64 (what np.mean of two elements
    computes), any NaN or an empty input yields NaN. Returned as
    np.float64 so downstream division keeps numpy semantics
    (x/0 -> inf/nan, never ZeroDivisionError — the reference's
    simple.py:159-163 behavior)."""
    n = len(vals)
    if n == 0:
        return _NAN
    for v in vals:
        if v != v:
            return _NAN
    s = sorted(vals)
    m = n >> 1
    if n & 1:
        return np.float64(s[m])
    return np.float64((s[m - 1] + s[m]) / 2.0)


def aggregate_doc(blocs: Sequence[Bloc], sort: bool = False,
                  new_line_threshold: float = 0.2,
                  new_paragraph_threshold: float = 1.5,
                  label_map: Optional[LabelMap] = None
                  ) -> Dict[str, Dict[str, object]]:
    """blocs: dicts with page_num, x0, y0, y1, text, label, props.

    Returns {label: {"text": str, "properties": [span, ...]}}.
    """
    label_map = {
        label: [olds] if not isinstance(olds, list) else olds
        for label, olds in (label_map or {}).items()
    }

    all_lines = list(blocs)
    row_height = sum(float(b["y1"]) - float(b["y0"]) for b in all_lines) / max(
        1, len(all_lines))
    all_lines = [b for b in all_lines
                 if len(b["text"]) > 0 and b.get("label") is not None]
    if sort:
        all_lines = sorted(
            all_lines,
            key=lambda b: (b["label"], b["page_num"],
                           float(b["y1"]) // row_height, float(b["x0"])),
        )

    inv_label_map: Dict[str, List[str]] = defaultdict(list)
    for new_label, old_labels in label_map.items():
        for old in old_labels:
            inv_label_map[old].append(new_label)

    lines_per_label: Dict[str, List[Bloc]] = defaultdict(list)
    lines_per_label.update({k: [] for k in label_map})
    for line in all_lines:
        for new_label in inv_label_map.get(line["label"], [line["label"]]):
            lines_per_label[new_label].append(line)

    out: Dict[str, Dict[str, object]] = {}
    for label, lines in lines_per_label.items():
        spans: List[Dict[str, object]] = []
        text = ""
        pairs = list(zip(lines, [*lines[1:], None]))
        dys = [
            float(nxt["y1"]) - float(cur["y1"])
            if nxt is not None and cur["page_num"] == nxt["page_num"]
            else None
            for cur, nxt in pairs
        ]
        height = _median_f64(
            [float(b["y1"]) - float(b["y0"]) for b in lines])
        # np.errstate: a zero-height label (all y1 == y0) divides by
        # zero below; the reference (simple.py:159-163) relies on the
        # resulting inf/nan comparisons, so only the RuntimeWarning is
        # suppressed — values are unchanged (r5 VERDICT #4; pinned by
        # test_zero_height_label_golden)
        with np.errstate(divide="ignore", invalid="ignore"):
            for (cur, nxt), dy in zip(pairs, dys):
                for style in cur.get("props") or []:
                    spans.append({
                        "italic": style["italic"],
                        "bold": style["bold"],
                        "begin": int(style["begin"]) + len(text),
                        "end": int(style["end"]) + len(text),
                        "fontname": style.get("fontname"),
                    })
                text = text + str(cur["text"])
                if nxt is None:
                    continue
                if cur["page_num"] != nxt["page_num"]:
                    text = text + "\n\n"
                else:
                    ratio = dy / height
                    if (ratio > new_paragraph_threshold
                            and float(nxt["y0"]) > float(cur["y1"])):
                        text = text + "\n\n"
                    elif (ratio > new_line_threshold
                          and float(nxt["y0"]) > float(cur["y1"])):
                        text = text + "\n"
                    else:
                        text = text + " "
        out[label] = {"text": text, "properties": spans}
    return out


def to_markdown(text: str, properties: Sequence[Dict[str, object]]) -> str:
    """Markdown post-pass (reference recipe,
    tests/recipes/test_markdown_aggregator.py:8-36)."""
    fragments: List[str] = []
    offset = 0
    for s in properties:
        begin, end = int(s["begin"]), int(s["end"])
        if begin >= end:
            continue
        if offset < begin:
            fragments.append(text[offset:begin])
        offset = end
        snippet = text[begin:end]
        if s["bold"]:
            snippet = f"**{snippet}**"
        if s["italic"]:
            snippet = f"_{snippet}_"
        fragments.append(snippet)
    if offset < len(text):
        fragments.append(text[offset:])
    return "".join(fragments)
