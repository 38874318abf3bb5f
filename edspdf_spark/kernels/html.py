"""HTML main-content extraction: boilerplate strip + DOM heuristics.

Dependency-free, deterministic kernel for the Common-Crawl-style HTML
payloads the north rule targets. The approach is the classic public
block-scoring family (boilerpipe/jusText-style, reimplemented from
scratch):

1. lex the byte stream into tags and text (regex tokenizer; contents
   of script/style/noscript/svg/template are skipped outright)
2. track a tag stack; any text inside semantic boilerplate containers
   (nav, header, footer, aside, form, button) is dropped
3. split remaining text into BLOCKS at block-level tag boundaries
4. score each block: keep it when its whitespace-normalized text is
   long enough AND its link density (chars inside <a> / total chars)
   is below a threshold — short, link-heavy blocks are navigation
5. join kept blocks with a blank line

Pure Python, doc-local, called from Arrow-batched UDFs only.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

_RAWTEXT = {"script", "style", "noscript", "svg", "template"}
_DROP_CONTAINERS = {"nav", "header", "footer", "aside", "form", "button"}
_BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "li", "ul", "ol", "table",
    "tr", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
    "pre", "br", "hr", "body", "title",
}

_TAG_RE = re.compile(
    r"<\s*(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",
    re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_DOCTYPE_RE = re.compile(r"<![^>]*>", re.S)
_WS_RE = re.compile(r"\s+")

_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&apos;": "'", "&nbsp;": " ", "&#39;": "'",
    # the frequent punctuation/symbol names real pages carry
    "&mdash;": "—", "&ndash;": "–", "&hellip;": "…",
    "&copy;": "©", "&reg;": "®", "&trade;": "™",
    "&rsquo;": "’", "&lsquo;": "‘",
    "&ldquo;": "“", "&rdquo;": "”",
    "&laquo;": "«", "&raquo;": "»",
    "&middot;": "·", "&times;": "×", "&shy;": "­",
}

# strict numeric character references (semicolon required — the
# HTML5 prefix-matching leniency would rewrite innocent '&' runs)
_NUM_ENT_RE = re.compile(r"&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")


def _num_entity(m: "re.Match") -> str:
    v = m.group(1)
    cp = int(v[1:], 16) if v[0] in "xX" else int(v)
    if 0 < cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
        return chr(cp)
    return m.group(0)  # out-of-range/surrogate: leave literal


def _unescape(text: str) -> str:
    if "&" not in text:
        return text
    for ent, ch in _ENTITIES.items():
        text = text.replace(ent, ch)
    # numeric refs AFTER the named table, preserving the table's
    # lenient double-unescape of '&amp;#39;' (tested behavior)
    return _NUM_ENT_RE.sub(_num_entity, text)


# charset declarations a crawl actually sees, mapped to stdlib
# codecs. Sniffing is deterministic: BOM first, else the FIRST
# `charset=` token in the head bytes, else utf-8. Unknown charsets
# fall back to utf-8-replace (never raises, the crawl contract).
_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""",
    re.I)
_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "iso8859-1": "latin-1", "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "windows-1250": "cp1250",
    "koi8-r": "koi8-r",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "euc-jp": "euc-jp", "euc-kr": "euc-kr",
    "gb2312": "gb18030", "gbk": "gb18030", "gb18030": "gb18030",
    "big5": "big5",
    "iso-8859-2": "iso-8859-2", "iso-8859-15": "iso-8859-15",
    "us-ascii": "ascii", "ascii": "ascii",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


def sniff_charset(data: bytes) -> str:
    """Deterministic charset sniff for crawl payloads: BOM wins, then
    the first `charset=` declaration in the leading 2048 bytes
    (handles both `<meta charset=...>` and the http-equiv
    Content-Type form), else utf-8."""
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if data.startswith(b"\xff\xfe") or data.startswith(b"\xfe\xff"):
        # 'utf-16' (not the endian-specific codecs) so Python consumes
        # the BOM — the -le/-be forms left U+FEFF as the first char of
        # every decoded text, inconsistent with the utf-8-sig branch
        # (r5 ADVICE #1)
        return "utf-16"
    m = _CHARSET_RE.search(data[:2048])
    if m:
        name = m.group(1).decode("ascii", "replace").lower()
        return _CHARSET_ALIASES.get(name, "utf-8")
    return "utf-8"


def decode_html(data: bytes) -> str:
    """bytes -> str via the sniffed charset, replace-on-error; any
    codec failure falls back to utf-8-replace. Never raises."""
    enc = sniff_charset(data)
    try:
        return data.decode(enc, errors="replace")
    except Exception:
        return data.decode("utf-8", errors="replace")


def extract_html_text(data: bytes, min_block_chars: int = 30,
                      max_link_density: float = 0.5) -> Tuple[str, dict]:
    """bytes -> (main_text, stats). Never raises on malformed HTML —
    the tokenizer degrades to treating stray '<' as text. Input bytes
    are decoded via the sniffed declared charset (sniff_charset) —
    ascii-compatible pages behave exactly as before; declared
    latin-1/cp125x/CJK pages now round-trip their non-ascii text."""
    try:
        html = decode_html(data)
    except Exception:
        html = ""
    html = _COMMENT_RE.sub(" ", html)
    html = _DOCTYPE_RE.sub(" ", html)

    blocks: List[List[Tuple[str, bool]]] = [[]]  # [(text, inside_link)]
    drop_depth = 0
    link_depth = 0
    raw_skip: Optional[str] = None
    title = ""
    in_title = False

    pos = 0
    for m in _TAG_RE.finditer(html):
        if m.start() > pos:
            text = html[pos:m.start()]
            if raw_skip is None and drop_depth == 0 and text.strip():
                if in_title:
                    title += text
                else:
                    blocks[-1].append((_unescape(text), link_depth > 0))
        pos = m.end()

        closing, name = m.group(1) == "/", m.group(2).lower()
        if raw_skip is not None:
            if closing and name == raw_skip:
                raw_skip = None
            continue
        if name in _RAWTEXT and not closing:
            raw_skip = name
            continue
        if name == "title":
            in_title = not closing
            continue
        if name in _DROP_CONTAINERS:
            drop_depth += -1 if closing else 1
            drop_depth = max(0, drop_depth)
            continue
        if name == "a":
            link_depth += -1 if closing else 1
            link_depth = max(0, link_depth)
            continue
        if name in _BLOCK_TAGS and blocks[-1]:
            blocks.append([])

    if pos < len(html):
        tail = html[pos:]
        if raw_skip is None and drop_depth == 0 and tail.strip():
            blocks[-1].append((_unescape(tail), False))

    kept: List[str] = []
    n_blocks = 0
    n_dropped = 0
    for block in blocks:
        if not block:
            continue
        n_blocks += 1
        text = _WS_RE.sub(" ", "".join(t for t, _l in block)).strip()
        if not text:
            continue
        link_chars = sum(len(t) for t, is_link in block if is_link)
        total_chars = sum(len(t) for t, _l in block)
        density = link_chars / total_chars if total_chars else 1.0
        if len(text) >= min_block_chars and density <= max_link_density:
            kept.append(text)
        else:
            n_dropped += 1

    stats = {"title": _WS_RE.sub(" ", _unescape(title)).strip(),
             "n_blocks": n_blocks, "n_dropped": n_dropped}
    return "\n\n".join(kept), stats


def looks_like_html(data: bytes) -> bool:
    head = data[:256].lstrip().lower()
    return head.startswith((b"<!doctype", b"<html", b"<head", b"<body")) or \
        b"<html" in head
