"""merge_boxes golden case (reference tests/visualization/
test_merge.py:6-27) + clique/fixpoint sanity."""

from edspdf_spark.kernels.merge import find_cliques, merge_boxes


def _b(page, x0, x1, y0, y1, label):
    return {"page_num": page, "x0": x0, "x1": x1, "y0": y0, "y1": y1,
            "label": label}


def test_merge_reference_golden():
    lines = [
        _b(0, 0, 1, 0, 0.1, "body"),
        _b(0, 0, 1, 0.1, 0.2, "body"),
        _b(0, 0, 0.4, 0.2, 0.3, "body"),
        _b(0, 0.6, 1, 0.2, 0.3, "other"),
        _b(1, 0.6, 1, 0.2, 0.3, "body"),
    ]
    out = merge_boxes(lines)
    assert len(out) == 4
    key = lambda b: (b["label"], b["x0"], b["x1"], b["y0"], b["y1"])  # noqa
    assert sorted(map(key, out)) == sorted(map(key, [
        _b(0, 0.0, 1.0, 0.0, 0.2, "body"),
        _b(0, 0.0, 0.4, 0.2, 0.3, "body"),
        _b(0, 0.6, 1.0, 0.2, 0.3, "other"),
        _b(1, 0.6, 1.0, 0.2, 0.3, "body"),
    ]))


def test_merge_single_and_empty():
    assert merge_boxes([]) == []
    one = [_b(0, 0.1, 0.2, 0.1, 0.2, "x")]
    assert merge_boxes(one) == one


def test_merge_all_same_label_collapses():
    lines = [_b(0, 0, 1, i / 10, (i + 1) / 10, "body") for i in range(5)]
    out = merge_boxes(lines)
    assert len(out) == 1
    assert out[0]["y0"] == 0.0 and out[0]["y1"] == 0.5


def test_find_cliques_triangle_plus_pendant():
    adj = {0: {1, 2}, 1: {0, 2}, 2: {0, 1, 3}, 3: {2}}
    cliques = sorted(sorted(c) for c in find_cliques(adj))
    assert cliques == [[0, 1, 2], [2, 3]]
