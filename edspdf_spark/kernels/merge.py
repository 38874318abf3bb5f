"""Same-label box merging for annotation/visualization tooling.

Replicates `merge_boxes` (/root/reference/edspdf/visualization/
merge.py:11-113): boxes sharing a merge key may merge when the bbox
of the hypothetical merger overlaps no box of a different key;
mergeable pairs form a graph whose maximal cliques become the new
keys; iterate to fixpoint (overlapping cliques re-key and re-run),
then emit each group's bounding box carrying the first box's label.

networkx is unavailable here, so maximal cliques come from a
self-written Bron-Kerbosch with pivoting (same algorithm family as
networkx.find_cliques). Clique enumeration ORDER can differ from
networkx in adversarial inputs, which may alter intermediate
re-keying; the reference's own golden case and the fixpoint semantics
are preserved (tests/test_merge.py mirrors the reference suite's
tests/visualization/test_merge.py:6-27).

Doc-local kernel — annotation tooling, never the hot path.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Set

import numpy as np

Box = Dict[str, object]  # {page_num, x0, x1, y0, y1, label}


def find_cliques(adj: Dict[int, Set[int]]) -> Iterator[List[int]]:
    """Maximal cliques via Bron-Kerbosch with pivot (iterative,
    mirroring the networkx formulation)."""
    if not adj:
        return
    q: List[int] = [-1]
    subg = set(adj)
    cand = set(adj)
    u = max(subg, key=lambda v: len(cand & adj[v]))
    ext_u = cand - adj[u]
    stack = []
    try:
        while True:
            if ext_u:
                v = ext_u.pop()
                cand.discard(v)
                q[-1] = v
                adj_v = adj[v]
                subg_v = subg & adj_v
                if not subg_v:
                    yield q[:]
                else:
                    cand_v = cand & adj_v
                    if cand_v:
                        stack.append((subg, cand, ext_u))
                        q.append(-1)
                        subg = subg_v
                        cand = cand_v
                        u = max(subg, key=lambda v2: len(cand & adj[v2]))
                        ext_u = cand - adj[u]
                    else:
                        yield q[:]
            else:
                q.pop()
                if not stack:
                    return
                subg, cand, ext_u = stack.pop()
    except IndexError:
        return


def merge_boxes(boxes: Sequence[Box]) -> List[Box]:
    n = len(boxes)
    if n == 0:
        return []
    coords = np.asarray([(b["x0"], b["x1"], b["y0"], b["y1"])
                         for b in boxes], dtype=np.float64)
    labels = [b["label"] for b in boxes]
    _, merge_keys = np.unique(np.asarray(labels, dtype=object),
                              return_inverse=True)
    merge_keys = merge_keys.copy()

    while True:
        adj_m = np.zeros((n, n), dtype=bool)
        for key in np.unique(merge_keys):
            key_filter = merge_keys == key
            x0, x1, y0, y1 = coords[key_filter].T
            ox0, ox1, oy0, oy1 = coords[~key_filter].T

            a = (slice(None), None, None)
            b = (None, slice(None), None)
            mx0 = np.minimum(x0[a], x0[b])
            mx1 = np.maximum(x1[a], x1[b])
            my0 = np.minimum(y0[a], y0[b])
            my1 = np.maximum(y1[a], y1[b])

            dx = np.minimum(mx1, ox1) - np.maximum(mx0, ox0)
            dy = np.minimum(my1, oy1) - np.maximum(my0, oy0)
            blocked = (dx > 0) & (dy > 0)
            ok = (~blocked).all(-1)

            idxs = np.flatnonzero(key_filter)
            adj_m[idxs[:, None], idxs[None, :]] = ok

        graph = {i: set(np.flatnonzero(adj_m[i])) - {i} for i in range(n)}
        conflicting = False
        seen: Set[int] = set()
        for clique_idx, clique in enumerate(find_cliques(graph)):
            for box_idx in clique:
                if box_idx in seen:
                    conflicting = True
                else:
                    seen.add(box_idx)
                    merge_keys[box_idx] = clique_idx
        if not conflicting:
            break

    merged: List[Box] = []
    for group_key in dict.fromkeys(merge_keys.tolist()):
        idxs = [i for i, k in enumerate(merge_keys.tolist())
                if k == group_key]
        first = boxes[idxs[0]]
        merged.append({
            **first,
            "x0": min(coords[i, 0] for i in idxs),
            "x1": max(coords[i, 1] for i in idxs),
            "y0": min(coords[i, 2] for i in idxs),
            "y1": max(coords[i, 3] for i in idxs),
        })
    return merged
