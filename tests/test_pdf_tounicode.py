"""/ToUnicode CMap support: simple fonts whose character codes differ
from the extracted unicode (the embedded/subset-font situation the
reference handles via pdfminer's CMapDB, pdfminer.six cmapdb.py).
Writer emits a bfchar CMap stream; parser handles bfchar + both
bfrange destination forms."""

import pytest

from edspdf_spark.kernels.extract import extract_doc
from edspdf_spark.kernels.pdf import (Line, PdfParseError, Segment,
                                      build_pdf, parse_cmap, parse_pdf)

CMAP = {0x41: "é", 0x42: "ffi", 0x43: "→"}


def _text(pages):
    return "".join(ch for ch, _f, _v in pages[0].lines[0].chars)


def test_tounicode_roundtrip_classic():
    pdf = build_pdf([[Line.simple(72, 700, "ABCD", font="Coded")]],
                    to_unicode={"Coded": CMAP})
    # unmapped code D passes through (pdfminer CMapDB behavior)
    assert _text(parse_pdf(pdf)) == "éffi→D"


def test_tounicode_roundtrip_objstm_xref_compressed():
    pdf = build_pdf([[Line.simple(72, 700, "AB", font="Coded")]],
                    to_unicode={"Coded": CMAP},
                    objstm=True, xref_stream=True, compress=True)
    assert _text(parse_pdf(pdf)) == "éffi"


def test_tounicode_with_proportional_widths():
    """Advance widths key on the CODE; only emitted text remaps —
    x-extent must match the same doc without a CMap."""
    fonts = {"Coded": ([500] * 95, 32)}
    line = [Line(x=72, y=700, segments=[Segment("AB", "Coded", 10.0)])]
    plain = parse_pdf(build_pdf([line], custom_fonts=fonts))
    mapped = parse_pdf(build_pdf([line], custom_fonts=fonts,
                                 to_unicode={"Coded": CMAP}))
    assert plain[0].lines[0].x1 == mapped[0].lines[0].x1
    assert _text(mapped) == "éffi"


def test_tounicode_through_extract_doc():
    pdf = build_pdf([[Line.simple(72, 700, "AB C", font="Coded")]],
                    to_unicode={"Coded": CMAP})
    res = extract_doc(pdf)
    assert res["error"] is False
    assert res["blocs"][0]["text"] == "éffi →"


def test_parse_cmap_bfrange_forms():
    cm = parse_cmap(b"""
1 beginbfchar
<e9> <00E9>
endbfchar
2 beginbfrange
<41> <43> <0061>
<50> <51> [<0058> <0059005A>]
endbfrange
""")
    assert [cm[c] for c in (0x41, 0x42, 0x43)] == ["a", "b", "c"]
    assert cm[0x50] == "X" and cm[0x51] == "YZ"
    assert cm[0xE9] == "é"


@pytest.mark.parametrize("bad", [
    b"1 beginbfchar <4> <0041> endbfchar",          # odd hex
    b"1 beginbfrange <43> <41> <0061> endbfrange",  # descending
    b"1 beginbfrange <41> <43> [<0061>] endbfrange",  # arr len mismatch
    b"1 beginbfchar <41> <0041> <42> endbfchar",    # unpaired
])
def test_parse_cmap_rejects_malformed(bad):
    with pytest.raises(PdfParseError):
        parse_cmap(bad)


def test_writer_rejects_wide_codes():
    with pytest.raises(ValueError):
        build_pdf([[Line.simple(72, 700, "A", font="X")]],
                  to_unicode={"X": {0x1F600: "emoji"}})
