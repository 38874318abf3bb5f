"""Annotation overlay (show_annotations analog, kernels/pdf.py +
operators/annotate.py): rectangles land in the right places with the
reference's color assignment, and extraction is unaffected."""

import pytest

from edspdf_spark import synth
from edspdf_spark.kernels.extract import extract_doc
from edspdf_spark.kernels.pdf import (CATEGORY20, annotate_pdf,
                                      compare_pdfs, parse_pdf)
from edspdf_spark.operators.annotate import annotate_doc, run_annotate
from edspdf_spark.operators.fused import PipelineConfig

CFG = PipelineConfig(masks=[(None, 0.1, 0.9, 0.1, 0.9, "body")],
                     threshold=0.1)


def _annotations(data):
    res = extract_doc(data)
    return [(b["page_num"], b["x0"], b["x1"], b["y0"], b["y1"], "body")
            for b in res["blocs"]]


@pytest.mark.parametrize("i", [1, 2, 4, 7, 17, 22])  # raw/flate/objstm mix
def test_annotate_preserves_extraction(i):
    data = synth.make_pdf_bytes(i)
    ann = annotate_pdf(data, _annotations(data))
    assert extract_doc(ann) == extract_doc(data)
    assert b" re S Q" in ann  # outline ops present
    # reference color 0 for the first label, as stroke RGB
    r, g, b = (int(CATEGORY20[0].lstrip("#")[k:k + 2], 16) / 255.0
               for k in (0, 2, 4))
    assert f"{r:g} {g:g} {b:g} RG".encode() in ann


def test_annotate_rect_count_and_geometry():
    data = synth.make_pdf_bytes(1)
    ann_list = _annotations(data)
    ann = annotate_pdf(data, ann_list)
    assert ann.count(b" re S Q") == len(ann_list)
    # first rectangle: header bloc on page 0
    page0 = parse_pdf(data)[0]
    b0 = ann_list[0]
    expect = (f"{b0[1] * page0.width:g} {(1 - b0[4]) * page0.height:g} "
              f"{(b0[2] - b0[1]) * page0.width:g} "
              f"{(b0[4] - b0[3]) * page0.height:g} re S").encode()
    assert expect in ann


def test_annotate_color_assignment_encounter_order():
    data = synth.make_pdf_bytes(1)
    res = extract_doc(data)
    anns = []
    for k, b in enumerate(res["blocs"]):
        label = ["header", "body", "footer"][k % 3]
        anns.append((b["page_num"], b["x0"], b["x1"], b["y0"], b["y1"],
                     label))
    ann = annotate_pdf(data, anns)
    for idx in range(3):  # first three unique labels -> CATEGORY20[0..2]
        r, g, b_ = (int(CATEGORY20[idx].lstrip("#")[k:k + 2], 16) / 255.0
                    for k in (0, 2, 4))
        assert f"{r:g} {g:g} {b_:g} RG".encode() in ann


def test_compare_pdfs_shared_colors():
    data = synth.make_pdf_bytes(1)
    anns = _annotations(data)
    gold = [(a[0], a[1], a[2], a[3], a[4], "gold") for a in anns]
    p, g = compare_pdfs(data, anns, gold)
    assert extract_doc(p) == extract_doc(data) == extract_doc(g)
    # pred labels get color 0, gold labels color 1 (shared assignment)
    c1 = tuple(int(CATEGORY20[1].lstrip("#")[k:k + 2], 16) / 255.0
               for k in (0, 2, 4))
    assert f"{c1[0]:g} {c1[1]:g} {c1[2]:g} RG".encode() in g


def test_annotate_doc_passthrough_on_error():
    corrupt = synth.make_pdf_bytes(13)
    assert annotate_doc("u", corrupt, CFG) == corrupt
    html = synth.synth_html_bytes(3)
    assert annotate_doc("u", html, CFG) == html


def test_run_annotate_spark(spark):
    from edspdf_spark.sources.readers import from_iterable

    rows = [(f"u{i}", synth.make_pdf_bytes(i)) for i in (1, 2, 13)]
    out = {r["url"]: bytes(r["html"])
           for r in run_annotate(from_iterable(spark, rows), CFG).collect()}
    assert out["u13"] == rows[2][1]  # corrupt passthrough
    for u, orig in rows[:2]:
        assert b" re S Q" in out[u]
        assert extract_doc(out[u]) == extract_doc(orig)
