"""Per-line character walk: text normalization + style runs.

Replicates `extract_properties_from_line`
(`/root/reference/edspdf/pipes/extractors/pdfminer.py:197-249`):

* every whitespace char becomes a single space
* no leading space, no double spaces
* style runs keyed by (fontname, italic, bold), where
  italic = (not upright) or "italic" in fontname.lower(), and
  bold = "bold" in fontname.lower() (pdfminer.py:225-227)
* a space inherits the style of the preceding character
* trailing whitespace is stripped from the text (style spans keep
  their original char offsets)

Pure Python, doc-local; invoked from Arrow-batched UDFs only.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Tuple

_WS = re.compile(r"\s")

StyleSpan = Dict[str, object]  # {italic, bold, begin, end, fontname}

# memoized per-char regex result and per-fontname style bits — pure
# caches of the exact computations below (chars/fontnames repeat
# millions of times per batch; capped against adversarial alphabets)
_WS_CACHE: Dict[str, str] = {}
_FONT_CACHE: Dict[str, Tuple[bool, bool]] = {}


def _ws_norm(raw: str) -> str:
    v = _WS_CACHE.get(raw)
    if v is None:
        v = _WS.sub(" ", raw)
        if len(_WS_CACHE) < 4096:
            _WS_CACHE[raw] = v
    return v


def _font_bits(fontname: str) -> Tuple[bool, bool]:
    v = _FONT_CACHE.get(fontname)
    if v is None:
        lowered = fontname.lower()
        v = ("italic" in lowered, "bold" in lowered)
        if len(_FONT_CACHE) < 4096:
            _FONT_CACHE[fontname] = v
    return v


# full style-key memo: (fontname_in, upright) -> the exact
# (fontname, italic, bold) tuple the per-char math below produces.
# Returning the SAME tuple object for repeated inputs also lets the
# run-change test short-circuit on identity (hot path: same font as
# the previous char).
_KEY_CACHE: Dict[Tuple[Optional[str], bool],
                 Tuple[str, bool, bool]] = {}
_NONE_KEY: Tuple[Optional[str], Optional[bool], Optional[bool]] = \
    (None, None, None)


_MULTISPACE = re.compile(r" {2,}")


def walk_line_text(runs: Iterable[Tuple[str, Optional[str]]]) -> str:
    """Text-only walk_line over (text, fontname) runs of SINGLE-CHAR
    granularity text (the built-in parser's layout): identical
    normalized text, no span accounting — the fast path when
    extract_style is off, where the per-char style-key machinery is
    pure overhead.

    Equivalence to walk_line's per-char state machine (pinned by
    test_kernels.test_walk_line_text_matches_walk_line): every
    whitespace char becomes one space (same \\s regex applied to the
    whole string substitutes each char identically), skipping a space
    when the output is empty or already ends with one IS collapse +
    leading-strip, and the final rstrip() sees only plain spaces as
    trailing whitespace in both forms."""
    raw = "".join(t for t, _f in runs)
    norm = _WS.sub(" ", raw)
    if "  " in norm:
        norm = _MULTISPACE.sub(" ", norm)
    return norm.lstrip(" ").rstrip()


def walk_line(chars: Iterable[Tuple[str, Optional[str], bool]]
              ) -> Tuple[str, List[StyleSpan]]:
    """chars: iterable of (char_text, fontname, upright).

    Returns (normalized_text_rstripped, style_spans).

    This is the hottest loop of the extraction kernel (~37% of
    per-doc cost before r5), so the per-char work is inlined: the
    whitespace normalization and the style-key derivation are single
    dict probes against the module caches (value-identical to
    _ws_norm/_font_bits — the differential and golden tests pin the
    semantics char for char).
    """
    spans: List[StyleSpan] = []
    current: Optional[StyleSpan] = None
    # list buffer + integer length instead of per-char string concat
    # (same values: n == len(text), new_n == len(new_text))
    buf: List[str] = []
    append = buf.append
    n = 0
    ends_space = False
    last: Optional[Tuple[Optional[str], Optional[bool], Optional[bool]]] = None
    ws_cache = _WS_CACHE
    key_cache = _KEY_CACHE

    for raw, fontname_in, upright in chars:
        ch = ws_cache.get(raw)
        if ch is None:
            ch = _WS.sub(" ", raw)
            if len(ws_cache) < 4096:
                ws_cache[raw] = ch
        if not (ch == " " and (ends_space or n == 0)):
            append(ch)
            new_n = n + len(ch)
            new_ends_space = ch.endswith(" ")
        else:
            new_n = n
            new_ends_space = ends_space

        if ch == " ":
            # a space inherits the style of the preceding character
            key = last if last is not None else _NONE_KEY
        else:
            fk = (fontname_in, upright)
            key = key_cache.get(fk)
            if key is None:
                fontname = fontname_in if fontname_in is not None else ""
                lowered = fontname.lower()
                key = (fontname,
                       (not upright) or ("italic" in lowered),
                       "bold" in lowered)
                if len(key_cache) < 4096:
                    key_cache[fk] = key

        if key is not last and key != last:
            if current is not None:
                spans.append(current)
            current = {
                "fontname": key[0],
                "italic": key[1],
                "bold": key[2],
                "begin": n,
                "end": new_n,
            }
        elif ch != " ":
            current["end"] = new_n  # type: ignore[index]
        n = new_n
        ends_space = new_ends_space
        last = key

    if current is not None:
        spans.append(current)

    return "".join(buf).rstrip(), spans
