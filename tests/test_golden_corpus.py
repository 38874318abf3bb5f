"""Frozen-corpus golden test: the reference's own ground-truth boxes
(/root/reference/tests/pipes/extractors/blocks_ground_truth.py — the
42-box expected output of pdfminer over tests/resources/test.pdf) are
pinned against THIS engine's extraction semantics.

pdfminer itself is absent here, so the corpus is exercised by
INVERTING the normalization (extract.py:75-83 / the reference
pdfminer.py:103-111): each frozen TextBox is mapped back to PDF user
space on the real test.pdf page geometry (595.32 x 841.92), written
with a per-line proportional /Widths font whose uniform advance
reproduces the frozen extent, and re-extracted. Agreement within the
reference's own tolerance (nested_approx abs=5e-2,
tests/pipes/extractors/test_pdfminer.py:11) — and a 40x tighter bound
— pins the full normalize/y-flip/extent pipeline on real-world-shaped
data, including proportional font metrics the monospaced synth corpus
never exercises."""

import pytest

from edspdf_spark.kernels.extract import extract_doc
from edspdf_spark.kernels.pdf import (DESCENT, Line, Segment, build_pdf,
                                      read_xref_stream)

GROUND_TRUTH = ("/root/reference/tests/pipes/extractors/"
                "blocks_ground_truth.py")
PAGE_W, PAGE_H = 595.32, 841.92  # test.pdf MediaBox


def _load_frozen():
    """Exec the reference literals with a shim TextBox (the real one
    needs the reference package; only the fields matter here)."""
    class TextBox(dict):
        def __init__(self, **kw):
            super().__init__(**kw)

    ns = {"TextBox": TextBox}
    src = open(GROUND_TRUTH).read()
    exec(compile("\n".join(
        ln for ln in src.splitlines()
        if not ln.startswith("from edspdf")), GROUND_TRUTH, "exec"), ns)
    return ns["pdf_blocks"]


def _rebuild_pdf(frozen, **kw):
    """Invert normalization: frozen (x0, x1, y0, y1) -> baseline (x, y)
    + font size + a uniform-width /Widths font reproducing the
    extent."""
    lines, fonts = [], {}
    for li, tb in enumerate(frozen):
        size = (tb["y1"] - tb["y0"]) * PAGE_H  # box height == size
        yb = (1 - tb["y1"]) * PAGE_H - DESCENT * size / 1000.0
        adv = (tb["x1"] - tb["x0"]) * PAGE_W  # points
        w = round(adv * 1000.0 / (size * len(tb["text"])))
        name = f"Frozen{li}"
        fonts[name] = ([w] * 95, 32)
        lines.append(Line(x=tb["x0"] * PAGE_W, y=yb,
                          segments=[Segment(text=tb["text"], font=name,
                                            size=size)]))
    return build_pdf([lines], page_width=PAGE_W, page_height=PAGE_H,
                     custom_fonts=fonts, **kw)


@pytest.mark.parametrize("kw", [
    {},
    {"objstm": True, "xref_stream": True, "compress": True},
], ids=["classic", "objstm_xref"])
def test_frozen_corpus_roundtrip(kw):
    frozen = _load_frozen()
    assert len(frozen) == 41  # the full test.pdf ground-truth corpus
    blob = _rebuild_pdf(frozen, **kw)
    if kw:
        assert b"/ObjStm" in blob and b"/XRef" in blob

    res = extract_doc(blob)
    assert not res["error"]
    got = res["blocs"]
    assert len(got) == len(frozen)

    def key(b):
        return (round(b["y0"], 3), round(b["x0"], 3), b["text"])

    for g, f in zip(sorted(got, key=key), sorted(frozen, key=key)):
        assert g["text"] == f["text"]
        assert g["page_num"] == f["page_num"]
        for fld in ("x0", "x1", "y0", "y1"):
            # the reference's own tolerance, then 40x tighter
            assert g[fld] == pytest.approx(f[fld], abs=5e-2), fld
            assert g[fld] == pytest.approx(f[fld], abs=1.25e-3), fld


def test_frozen_corpus_needs_proportional_metrics():
    """The monospaced model CANNOT reproduce the frozen extents — the
    corpus genuinely exercises /Widths parsing (a ~100-char Lorem line
    at ~10pt would be ~1 page-width monospaced vs the frozen ~0.77)."""
    frozen = _load_frozen()
    tb = max(frozen, key=lambda t: len(t["text"]))
    size = (tb["y1"] - tb["y0"]) * PAGE_H
    mono_x1 = tb["x0"] + len(tb["text"]) * 600 * size / 1000.0 / PAGE_W
    assert abs(mono_x1 - tb["x1"]) > 5e-2


@pytest.mark.parametrize("kw", [
    {"xref_stream": True},
    {"xref_stream": True, "objstm": True},
], ids=["xref_only", "xref_objstm"])
def test_xref_stream_reader_matches_scan(kw):
    """read_xref_stream's type-1 offsets point at the object headers
    the scanner finds; type-2 entries name the ObjStm container and
    the member's index within it."""
    frozen = _load_frozen()[:3]
    data = _rebuild_pdf(frozen, **kw)
    entries = read_xref_stream(data)
    assert entries[0][0] == 0  # free head
    saw_type2 = False
    for oid, (typ, f2, f3) in entries.items():
        if typ == 1:
            assert data[f2:].startswith(f"{oid} 0 obj".encode()), oid
        elif typ == 2:
            saw_type2 = True
            stm_off = entries[f2][1]
            assert data[stm_off:].startswith(f"{f2} 0 obj".encode())
            assert b"/ObjStm" in data[stm_off:stm_off + 200]
            assert f3 >= 0
    assert saw_type2 == ("objstm" in kw)
