"""Property-based differential tests: each kernel vs an INDEPENDENT
scalar re-derivation of the reference math, over hypothesis-generated
inputs. Catches vectorization mistakes the golden cases miss."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from edspdf_spark.kernels.aggregate import aggregate_doc
from edspdf_spark.kernels.alignment import align_labels
from edspdf_spark.kernels.reading_order import box_lt, reading_order
from edspdf_spark.kernels.styles import walk_line

coord = st.floats(min_value=0.0, max_value=1.0, allow_nan=False,
                  width=64).map(lambda v: round(v, 3))


@st.composite
def boxes(draw, min_size=0, max_size=8, pages=2):
    n = draw(st.integers(min_size, max_size))
    out = []
    for _ in range(n):
        x0, x1 = sorted(draw(st.tuples(coord, coord)))
        y0, y1 = sorted(draw(st.tuples(coord, coord)))
        out.append((draw(st.integers(0, pages - 1)), x0, x1, y0, y1))
    return out


# --- alignment vs scalar re-derivation -------------------------------

def _align_naive(masks, blocs, threshold):
    """Per-bloc scalar transcription of alignment.py:37-55 (per page,
    first-max-wins argmax, implicit INF catch-all with None label)."""
    out = []
    for page, bx0, bx1, by0, by1 in blocs:
        cands = [m for m in masks if m[0] is None or m[0] == page]
        cands = cands + [(None, -100000.0, 100000.0, -100000.0, 100000.0,
                          None)]
        best_i, best_s = 0, -1.0
        for i, (_pg, mx0, mx1, my0, my1, _lab) in enumerate(cands):
            dx = min(mx1, bx1) - max(mx0, bx0)
            dy = min(my1, by1) - max(my0, by0)
            overlap = max(dx, 0.0) * max(dy, 0.0)
            src_area = (mx1 - mx0) * (my1 - my0) or 1.0
            dst_area = (bx1 - bx0) * (by1 - by0) or 1.0
            score = 0.0 if overlap / dst_area < threshold \
                else overlap / src_area
            if score > best_s:
                best_i, best_s = i, score
        out.append(cands[best_i][5])
    return out


@settings(max_examples=150, deadline=None)
@given(blocs=boxes(min_size=1, max_size=6),
       masks=boxes(min_size=1, max_size=4),
       threshold=st.sampled_from([0.0001, 0.3, 0.5, 0.9, 1.0]),
       global_mask=st.booleans())
def test_alignment_matches_naive(blocs, masks, threshold, global_mask):
    labeled = [(None if global_mask else m[0], m[1], m[2], m[3], m[4],
                f"L{i}") for i, m in enumerate(masks)]
    got = align_labels(labeled, blocs, threshold=threshold)
    want = _align_naive(labeled, blocs, threshold)
    assert got == want


# --- reading order properties ----------------------------------------

@settings(max_examples=100, deadline=None)
@given(bs=boxes(max_size=8))
def test_reading_order_is_permutation_and_page_monotonic(bs):
    perm = reading_order(bs)
    assert sorted(perm) == list(range(len(bs)))
    pages = [bs[i][0] for i in perm]
    assert pages == sorted(pages)


@settings(max_examples=100, deadline=None)
@given(bs=boxes(min_size=2, max_size=6))
def test_reading_order_deterministic(bs):
    assert reading_order(bs) == reading_order(list(bs))


def test_box_lt_vertical_disjoint_cases():
    a = (0, 0.1, 0.5, 0.1, 0.2)
    b = (0, 0.1, 0.5, 0.5, 0.6)
    assert box_lt(a, b) and not box_lt(b, a)


# --- style walk properties ---------------------------------------------

printable = st.text(alphabet=st.characters(min_codepoint=32,
                                           max_codepoint=126), max_size=12)
ws_chars = st.sampled_from([" ", "\t", "\n", "x", "y", "Q", "."])


@settings(max_examples=150, deadline=None)
@given(chars=st.lists(st.tuples(
    ws_chars,
    st.sampled_from(["Helvetica", "Helvetica-Bold", "Helvetica-Italic"]),
    st.booleans()), max_size=20))
def test_walk_line_invariants(chars):
    text, spans = walk_line(chars)
    assert "  " not in text          # no double spaces
    assert not text.startswith(" ")  # no leading space
    assert text == text.rstrip()     # rstripped
    prev_begin = -1
    for s in spans:
        assert 0 <= s["begin"] <= s["end"]
        assert s["begin"] >= prev_begin
        prev_begin = s["begin"]
    # deterministic
    assert walk_line(list(chars)) == (text, spans)


# --- aggregation vs scalar separator re-derivation --------------------

@st.composite
def doc_lines(draw):
    n = draw(st.integers(1, 8))
    lines = []
    y = 0.05
    for i in range(n):
        h = draw(st.sampled_from([0.05, 0.1]))
        gap = draw(st.sampled_from([0.0, 0.02, 0.07, 0.2, 0.3]))
        page = draw(st.integers(0, 1))
        lines.append({"page_num": page, "x0": 0.1, "x1": 0.9,
                      "y0": round(y, 4), "y1": round(y + h, 4),
                      "text": f"t{i}", "label": "body", "props": []})
        y += h + gap
        if y > 0.9:
            y = 0.05
    return lines


def _agg_naive(lines, nl=0.2, np_=1.5):
    """Scalar transcription of simple.py:134-166 for one label."""
    ordered = lines  # caller passes in already-ordered lines
    heights = sorted(ln["y1"] - ln["y0"] for ln in ordered)
    m = len(heights)
    if m % 2:
        height = heights[m // 2]
    else:
        height = (heights[m // 2 - 1] + heights[m // 2]) / 2
    text = ""
    for i, ln in enumerate(ordered):
        text += ln["text"]
        if i + 1 == len(ordered):
            break
        nxt = ordered[i + 1]
        dy = nxt["y1"] - ln["y1"]
        if ln["page_num"] != nxt["page_num"]:
            text += "\n\n"
        elif dy / height > np_ and nxt["y0"] > ln["y1"]:
            text += "\n\n"
        elif dy / height > nl and nxt["y0"] > ln["y1"]:
            text += "\n"
        else:
            text += " "
    return text


@settings(max_examples=150, deadline=None)
@given(lines=doc_lines())
def test_aggregate_matches_naive_separators(lines):
    got = aggregate_doc(lines)["body"]["text"]
    assert got == _agg_naive(lines)


# --- annotation overlays never perturb extraction ---------------------

@st.composite
def synth_pages(draw):
    """1-2 pages of 1-5 plain lines at safe in-bounds positions."""
    pages = []
    for _p in range(draw(st.integers(1, 2))):
        lines = []
        for _i in range(draw(st.integers(1, 5))):
            x = draw(st.integers(40, 400))
            y = draw(st.integers(60, 720))
            size = draw(st.sampled_from([8.0, 10.0, 12.0]))
            text = draw(st.text(
                alphabet="abcXYZ 019()\\", min_size=1, max_size=24))
            lines.append(_Line.simple(float(x), float(y), text, size=size))
        pages.append(lines)
    return pages


from edspdf_spark.kernels.pdf import Line as _Line  # noqa: E402
from edspdf_spark.kernels.pdf import annotate_pdf, build_pdf  # noqa: E402
from edspdf_spark.kernels.extract import extract_doc  # noqa: E402


@given(pages=synth_pages(), compress=st.booleans(), objstm=st.booleans(),
       boxes_=boxes(min_size=0, max_size=6))
@settings(max_examples=60, deadline=None)
def test_annotate_is_extraction_invariant(pages, compress, objstm, boxes_):
    """Whatever rectangles are drawn, over any writer layout variant,
    extraction output is byte-identical to the unannotated file."""
    data = build_pdf(pages, compress=compress, objstm=objstm)
    anns = [(p, x0, x1, y0, y1, "body") for p, x0, x1, y0, y1 in boxes_]
    annotated = annotate_pdf(data, anns)
    assert extract_doc(annotated, extract_style=True) == \
        extract_doc(data, extract_style=True)
