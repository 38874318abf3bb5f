"""HTML boilerplate-strip kernel + mixed-corpus fused pipeline."""

from edspdf_spark.kernels import extract_html_text, looks_like_html
from edspdf_spark.synth import synth_html_bytes


def test_boilerplate_stripped():
    text, stats = extract_html_text(synth_html_bytes(3))
    assert "home" not in text          # nav link
    assert "site banner" not in text   # header
    assert "ads ads ads" not in text   # aside
    assert "copyright footer" not in text
    assert "var a = 1" not in text     # script
    assert "color:red" not in text     # style
    assert len(text) > 100             # article paragraphs kept
    assert stats["title"] == "doc {i}".format(i=3) or stats["title"]


def test_blocks_joined_with_blank_lines():
    html = (b"<html><body><article><p>" + b"alpha " * 10 + b"</p><p>" +
            b"beta " * 10 + b"</p></article></body></html>")
    text, _ = extract_html_text(html)
    assert "\n\n" in text
    assert text.startswith("alpha")


def test_link_density_drops_nav_like_blocks():
    html = (b"<html><body>"
            b"<div><a href='/a'>one</a> <a href='/b'>two</a> "
            b"<a href='/c'>three little links here padding</a></div>"
            b"<div>" + b"real content words " * 5 + b"</div>"
            b"</body></html>")
    text, _ = extract_html_text(html)
    assert "real content" in text
    assert "three little links" not in text


def test_malformed_html_never_raises():
    for payload in [b"<html><p>unclosed", b"<<<>>><html", b"", b"\xff\xfe<html>",
                    b"<html>" + b"<div>" * 500]:
        text, stats = extract_html_text(payload)
        assert isinstance(text, str)


def test_entities_unescaped():
    text, _ = extract_html_text(
        b"<html><body><p>fish &amp; chips &lt;best&gt; in town, "
        b"forty&nbsp;words of padding padding</p></body></html>")
    assert "fish & chips <best>" in text


def test_looks_like_html():
    assert looks_like_html(b"<!DOCTYPE html><html>...")
    assert looks_like_html(b"  <html lang='en'>")
    assert not looks_like_html(b"%PDF-1.4 ...")
    assert not looks_like_html(b"plain text")


def test_fused_pipeline_mixed_corpus(spark):
    """PDF and HTML payloads in the same binary column, one pipeline."""
    import datetime

    from edspdf_spark.operators import PipelineConfig, run_fused
    from edspdf_spark.schemas import PAGES_SCHEMA
    from edspdf_spark.synth import make_pdf_bytes

    t0 = datetime.datetime(2024, 1, 1)
    rows = [("pdf://1", t0, make_pdf_bytes(1), "", "en"),
            ("html://2", t0, synth_html_bytes(2), "", "en"),
            ("junk://3", t0, b"\x00garbage", "", "en")]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    cfg = PipelineConfig(masks=[(None, 0.1, 0.9, 0.1, 0.9, "body")],
                         threshold=0.1)
    out = {r.url: r for r in run_fused(pages, cfg).collect()
           if r.label == "body" or r.error}
    assert out["pdf://1"].label == "body" and out["pdf://1"].n_blocs > 0
    assert out["html://2"].label == "body"
    assert "ads ads" not in out["html://2"].text
    assert out["junk://3"].error


def test_unescape_numeric_and_named_refs():
    from edspdf_spark.kernels.html import _unescape

    assert _unescape("a &#x27;b&#x27; &#38; c") == "a 'b' & c"
    assert _unescape("1 &mdash; 2&hellip;") == "1 — 2…"
    assert _unescape("&copy;2024 &#169;") == "©2024 ©"
    # strict: no semicolon -> literal; out-of-range -> literal
    assert _unescape("AT&T &#x110000; &#0;") == "AT&T &#x110000; &#0;"
    # surrogate code points stay literal
    assert _unescape("&#xD800;") == "&#xD800;"
    # lenient legacy behavior pinned: &amp;#39; double-unescapes
    assert _unescape("&amp;#39;") == "'"


def test_extract_html_text_numeric_entities_in_blocks():
    from edspdf_spark.kernels.html import extract_html_text

    html = ("<html><body><p>" + "word " * 10 +
            "caf&#233; &#x2014; fine</p></body></html>").encode()
    text, stats = extract_html_text(html)
    assert "café — fine" in text


def test_extract_html_text_fuzz_never_raises_and_deterministic():
    """Property fuzz over adversarial byte soups: the extractor must
    never raise, must be deterministic, and must never emit raw tag
    markup for well-nested inputs it chose to keep."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from edspdf_spark.kernels.html import extract_html_text

    tagish = st.sampled_from(
        ["<p>", "</p>", "<div>", "</div>", "<a href=\"x\">", "</a>",
         "<script>", "</script>", "<nav>", "</nav>", "<title>",
         "</title>", "<!doctype html>", "<!--", "-->", "<", ">", "&",
         "&amp;", "&#65;", "&#x110000;", "\x00", "\xff"])
    words = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=0, max_size=24)
    soup = st.lists(st.one_of(tagish, words), min_size=0, max_size=40)

    @settings(max_examples=200, deadline=None)
    @given(soup)
    def run(parts):
        data = "".join(parts).encode("utf-8", errors="surrogatepass")
        t1, s1 = extract_html_text(data)
        t2, s2 = extract_html_text(data)
        assert (t1, s1) == (t2, s2)          # deterministic
        assert isinstance(t1, str)
        assert s1["n_blocks"] >= s1["n_dropped"] >= 0

    run()


def test_charset_sniffing_decodes_declared_encodings():
    from edspdf_spark.kernels.html import (decode_html, extract_html_text,
                                           sniff_charset)

    body = "café résumé naïve " + "filler words here " * 5
    page = ("<html><head><meta charset=\"{cs}\"></head><body><p>"
            + body + "</p></body></html>")

    latin = page.format(cs="iso-8859-1").encode("latin-1")
    assert sniff_charset(latin) == "latin-1"
    text, _ = extract_html_text(latin)
    assert "café résumé naïve" in text

    cp1252 = page.format(cs="windows-1252").encode("cp1252")
    assert "café" in extract_html_text(cp1252)[0]

    # http-equiv form
    he = ("<html><head><meta http-equiv=\"Content-Type\" "
          "content=\"text/html; charset=ISO-8859-1\"></head><body><p>"
          + body + "</p></body></html>").encode("latin-1")
    assert "café" in extract_html_text(he)[0]

    # BOM beats declaration; utf-8 stays default
    bom = b"\xef\xbb\xbf" + page.format(cs="iso-8859-1").encode("utf-8")
    assert sniff_charset(bom) == "utf-8-sig"
    assert "café" in extract_html_text(bom)[0]
    assert sniff_charset(b"<html><p>plain</p>") == "utf-8"

    # unknown charset falls back to utf-8; junk never raises
    unk = page.format(cs="x-weird-enc").encode("utf-8")
    assert "café" in extract_html_text(unk)[0]
    assert decode_html(b"\xff\xfe\x00") is not None

    # cyrillic page declared cp1251
    ru = ("<html><head><meta charset=\"windows-1251\"></head><body><p>"
          "Привет мир это документ с достаточно длинным текстом"
          "</p></body></html>").encode("cp1251")
    assert "Привет мир" in extract_html_text(ru)[0]


def test_utf16_bom_consumed_and_meta_anchored_sniff():
    """r5 ADVICE fixes: (1) UTF-16 BOMs decode via the 'utf-16' codec
    so U+FEFF never leaks into the text (consistent with utf-8-sig);
    (2) the charset sniff only fires inside a <meta ...> tag — a page
    whose early BODY TEXT mentions 'charset=shift_jis' stays UTF-8."""
    from edspdf_spark.kernels.html import decode_html, sniff_charset

    body = "café wide text " + "filler words here " * 5
    page = ("<html><head><title>t</title></head><body><p>"
            + body + "</p></body></html>")
    for enc, bom in (("utf-16-le", b"\xff\xfe"), ("utf-16-be", b"\xfe\xff")):
        data = bom + page.encode(enc)
        assert sniff_charset(data) == "utf-16"
        decoded = decode_html(data)
        assert not decoded.startswith("﻿"), repr(decoded[:4])
        assert "café" in decoded

    trap = ("<html><body><p>to set charset=shift_jis in a meta tag "
            + body + "</p></body></html>").encode("utf-8")
    assert sniff_charset(trap) == "utf-8"
    # real meta declarations (plain and http-equiv) still sniff
    meta = ("<html><head><meta charset='iso-8859-1'></head><body><p>"
            + body + "</p></body></html>").encode("latin-1")
    assert sniff_charset(meta) == "latin-1"
