"""Reading-order comparator.

Replicates the pairwise box ordering relation of the reference
(`/root/reference/edspdf/structures.py:197-234`): page first, then a
shrunk-box (alpha=0.2) vertical/horizontal disjointness test, falling
back to lexicographic (center_y, center_x).

This is NOT a key sort — the relation is not a total order — so the
reference's behaviour (Python `sorted()` driving `__lt__` under
Timsort) is reproduced exactly by sorting wrapper objects whose
`__lt__` delegates to the same relation. The sort is always doc/page
local (a few dozen boxes), never distributed.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

_ALPHA = 0.2
_BETA = 1.0 - _ALPHA


def box_lt(a: Tuple[int, float, float, float, float],
           b: Tuple[int, float, float, float, float]) -> bool:
    """`a < b` in reading order; boxes are (page_num, x0, x1, y0, y1)."""
    a_page, ax0, ax1, ay0, ay1 = a
    b_page, bx0, bx1, by0, by1 = b
    if (a_page or 0) < (b_page or 0):
        return True
    if (a_page or 0) > (b_page or 0):
        return False

    sx0 = ax0 * _BETA + ax1 * _ALPHA
    sx1 = ax0 * _ALPHA + ax1 * _BETA
    sy0 = ay0 * _BETA + ay1 * _ALPHA
    sy1 = ay0 * _ALPHA + ay1 * _BETA

    ox0 = bx0 * _BETA + bx1 * _ALPHA
    ox1 = bx0 * _ALPHA + bx1 * _BETA
    oy0 = by0 * _BETA + by1 * _ALPHA
    oy1 = by0 * _ALPHA + by1 * _BETA

    dy0 = oy1 - sy0
    dy1 = oy0 - sy1
    if dy0 > 0 and dy1 > 0:
        return True
    if dy0 < 0 and dy1 < 0:
        return False

    dx0 = ox1 - sx0
    dx1 = ox0 - sx1
    if dx0 > 0 and dx1 > 0:
        return True
    if dx0 < 0 and dx1 < 0:
        return False

    return ((ay0 + ay1) / 2, (ax0 + ax1) / 2) < ((by0 + by1) / 2, (bx0 + bx1) / 2)


class _Ordered:
    __slots__ = ("key", "idx")

    def __init__(self, key, idx):
        self.key = key
        self.idx = idx

    def __lt__(self, other: "_Ordered") -> bool:
        return box_lt(self.key, other.key)


def reading_order(boxes: Sequence[Tuple[int, float, float, float, float]]) -> List[int]:
    """Return the permutation of indices that sorts `boxes` exactly as the
    reference's `sorted(content_boxes)` would (stable Timsort over __lt__).
    """
    wrapped = [_Ordered(b, i) for i, b in enumerate(boxes)]
    wrapped.sort()
    return [w.idx for w in wrapped]
