"""Mask-vs-bloc label alignment.

Replicates the vectorized overlap math of the reference
(`/root/reference/edspdf/utils/alignment.py:13-111`):

* per destination page, source masks with page_num=None apply everywhere
* an implicit catch-all source box (-INF..INF) carrying `pollution_label`
  is appended (alignment.py:23-28)
* overlap = clip(dx,0)*clip(dy,0); zero areas are treated as 1
* score = overlap/src_area, zeroed where overlap/dst_area < threshold
* argmax over sources with FIRST-max-wins => earlier mask priority
  (alignment.py:54)

Doc-local numpy kernel (float64 throughout), called from Arrow UDFs.
The engine-level mask classifier appends its own explicit catch-all
"pollution" mask (±10000)² before calling this, mirroring
`pipes/classifiers/mask.py:204-212`.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

INF = 100000.0

# a mask is (page_num|None, x0, x1, y0, y1, label)
Mask = Tuple[Optional[int], float, float, float, float, Any]
# a bloc key is (page_num, x0, x1, y0, y1)
BlocKey = Tuple[Optional[int], float, float, float, float]


# pages at or below this (sources+1) x dst cell count use the plain-
# Python path below — elementwise float64 min/max/mul/div/compare are
# IEEE-identical to the numpy formulation (no reductions, no FMA), and
# the numpy array setup costs ~75us/page, which dominates the 2-3 mask
# x ~15 bloc pages the extractor produces (tests pin fast == numpy)
_SMALL_ALIGN_CELLS = 512


def _align_on_page(src: List[Mask], dst: List[BlocKey], threshold: float,
                   pollution_label: Any) -> List[Any]:
    if len(src) == 0 or len(dst) == 0:
        return []

    if (len(src) + 1) * len(dst) <= _SMALL_ALIGN_CELLS:
        rows = [(m[1], m[2], m[3], m[4], m[5]) for m in src]
        rows.append((-INF, INF, -INF, INF, pollution_label))
        out: List[Any] = []
        for b in dst:
            dx0, dx1, dy0, dy1 = b[1], b[2], b[3], b[4]
            d_area = (dx1 - dx0) * (dy1 - dy0)
            if d_area == 0.0:
                d_area = 1.0
            best = None
            best_lab = None
            for sx0, sx1, sy0, sy1, lab in rows:
                ddx = (sx1 if sx1 < dx1 else dx1) \
                    - (sx0 if sx0 > dx0 else dx0)
                ddy = (sy1 if sy1 < dy1 else dy1) \
                    - (sy0 if sy0 > dy0 else dy0)
                if ddx < 0.0:
                    ddx = 0.0
                if ddy < 0.0:
                    ddy = 0.0
                overlap = ddx * ddy
                s_area = (sx1 - sx0) * (sy1 - sy0)
                if s_area == 0.0:
                    s_area = 1.0
                score = overlap / s_area
                if overlap / d_area < threshold:
                    score = 0.0
                if best is None or score > best:   # first max wins
                    best = score
                    best_lab = lab
            out.append(best_lab)
        return out

    labels = [m[5] for m in src] + [pollution_label]

    src_coords = np.asarray(
        [(m[1], m[2], m[3], m[4]) for m in src] + [(-INF, INF, -INF, INF)],
        dtype=np.float64,
    )
    dst_coords = np.asarray([(b[1], b[2], b[3], b[4]) for b in dst],
                            dtype=np.float64)

    sx0, sx1, sy0, sy1 = src_coords.T[:, :, None]
    dx0, dx1, dy0_, dy1_ = dst_coords.T[:, None, :]

    dx = np.minimum(sx1, dx1) - np.maximum(sx0, dx0)
    dy = np.minimum(sy1, dy1_) - np.maximum(sy0, dy0_)
    overlap = np.clip(dx, 0, None) * np.clip(dy, 0, None)

    src_area = (sx1 - sx0) * (sy1 - sy0)
    dst_area = (dx1 - dx0) * (dy1_ - dy0_)
    src_area[src_area == 0] = 1
    dst_area[dst_area == 0] = 1

    covered_src_ratio = overlap / src_area
    covered_dst_ratio = overlap / dst_area

    score = covered_src_ratio
    score[covered_dst_ratio < threshold] = 0.0

    winners = score.argmax(0)  # first max wins per column (dst)
    return [labels[i] for i in winners]


def align_labels(masks: Sequence[Mask], blocs: Sequence[BlocKey],
                 threshold: float = 0.0001,
                 pollution_label: Any = None) -> List[Any]:
    """Label every bloc. Returns labels in an order matching blocs grouped
    by ascending page (identical to the reference, which rebuilds dst_boxes
    page-by-page, alignment.py:94-111), together with that permutation
    being the identity whenever `blocs` is already page-sorted — which is
    always the case downstream of the extractor.

    Documented deviation (empty source masks): when a page has NO
    applicable mask, the reference's _align_box_labels_on_page returns
    [] — those dst boxes are silently DROPPED from its output. This
    positional API must return one label per input bloc, so it assigns
    pollution_label instead of dropping. The native mask_classify
    operator implements the reference's drop semantics
    (operators/classifiers.py); callers needing exact parity for the
    masks=[] corner should go through that operator.
    """
    out_labels: List[Any] = [None] * len(blocs)
    pages = sorted({b[0] for b in blocs}, key=lambda p: (p is not None, p))
    if None in {b[0] for b in blocs} and len(pages) > 1:
        # the reference emits a page_num=None dst box once PER page
        # group (alignment.py:94-111), duplicating it in the output;
        # this positional API cannot represent that — refuse loudly
        # rather than silently keep only the last page's label. The
        # engine never produces None-page blocs (extractor always sets
        # page_num), so this guards external callers only.
        raise NotImplementedError(
            "page_num=None dst boxes mixed with paged boxes are not "
            "supported by the positional align_labels API")
    for page in pages:
        idxs = [i for i, b in enumerate(blocs)
                if page is None or b[0] is None or b[0] == page]
        page_src = [m for m in masks
                    if page is None or m[0] is None or m[0] == page]
        page_dst = [blocs[i] for i in idxs]
        labels = _align_on_page(page_src, page_dst, threshold, pollution_label)
        if not labels:
            labels = [pollution_label] * len(page_dst)
        for i, lab in zip(idxs, labels):
            out_labels[i] = lab
    return out_labels


def classify_with_masks(masks: Sequence[Mask], blocs: Sequence[BlocKey],
                        threshold: float = 1.0) -> List[Any]:
    """`MaskClassifier` semantics (mask.py:187-224): user masks plus the
    explicit catch-all pollution mask, then align."""
    full = list(masks) + [(None, -10000.0, 10000.0, -10000.0, 10000.0,
                           "pollution")]
    return align_labels(full, blocs, threshold=threshold)
