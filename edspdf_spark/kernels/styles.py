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


def walk_line(chars: Iterable[Tuple[str, Optional[str], bool]]
              ) -> Tuple[str, List[StyleSpan]]:
    """chars: iterable of (char_text, fontname, upright).

    Returns (normalized_text_rstripped, style_spans).
    """
    spans: List[StyleSpan] = []
    current: Optional[StyleSpan] = None
    text = ""
    last: Optional[Tuple[Optional[str], Optional[bool], Optional[bool]]] = None

    for raw, fontname_in, upright in chars:
        ch = _WS.sub(" ", raw)
        if not (ch == " " and (text.endswith(" ") or text == "")):
            new_text = text + ch
        else:
            new_text = text

        if ch == " ":
            if last is not None:
                fontname, italic, bold = last
            else:
                fontname, italic, bold = (None, None, None)
        else:
            fontname = fontname_in if fontname_in is not None else ""
            lowered = (fontname or "").lower()
            italic = (not upright) or ("italic" in lowered)
            bold = "bold" in lowered

        key = (fontname, italic, bold)
        if key != last:
            if current is not None:
                spans.append(current)
            current = {
                "fontname": fontname,
                "italic": italic,
                "bold": bold,
                "begin": len(text),
                "end": len(new_text),
            }
        elif ch != " ":
            assert current is not None
            current["end"] = len(new_text)
        text = new_text
        last = key

    if current is not None:
        spans.append(current)

    return text.rstrip(), spans
