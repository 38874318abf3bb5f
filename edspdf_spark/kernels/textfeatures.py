"""Token-level text features of the reference's simple-text-embedding
(§2.7): word shape, prefix/suffix, normalized form, and the word
tokenizer (/root/reference/edspdf/pipes/embeddings/
simple_text_embedding.py:31-70, 108-113, 198-233).

The torch embedding layers that consume these features are out of
scope (torch absent); the FEATURES themselves are pure Python and are
what a Spark featurization stage ships to a scoring UDF. anyascii is
absent here, so `norm` falls back to plain lowercasing behind an
import-try (documented deviation; shapes/prefixes/suffixes are exact).
"""

from __future__ import annotations

from typing import Dict, List

import regex

try:  # optional, matches the reference's normalization when present
    from anyascii import anyascii as _anyascii
except Exception:  # pragma: no cover
    def _anyascii(s: str) -> str:
        return s

# reference word_regex (simple_text_embedding.py:108-113)
_PUNCT = "[:punct:]" + "\"'ˊ＂〃ײ᳓″״‶˶ʺ“”˝"
_NUM_LIKE = r"\d+(?:[.,]\d+)?"
_DEFAULT = rf"[^\d{_PUNCT}'\n[[:space:]]+(?:['ˊ](?=[[:alpha:]]|$))?"
WORD_REGEX = regex.compile(
    rf"({_NUM_LIKE}|[{_PUNCT}]|[\n\r\t]|[^\S\r\n\t]+|{_DEFAULT})"
    rf"([^\S\r\n\t])?")


def word_shape(text: str) -> str:
    """spaCy-style shape (exact replication of
    simple_text_embedding.py:31-70): X/x/d per char class, runs capped
    at 4, LONG for >=100 chars."""
    if len(text) >= 100:
        return "LONG"
    shape: List[str] = []
    last = ""
    seq = 0
    for char in text:
        if char.isalpha():
            shape_char = "X" if char.isupper() else "x"
        elif char.isdigit():
            shape_char = "d"
        else:
            shape_char = char
        if shape_char == last:
            seq += 1
        else:
            seq = 0
            last = shape_char
        if seq < 4:
            shape.append(shape_char)
    return "".join(shape)


def tokenize_words(text: str) -> List[str]:
    """The reference's word tokenizer: numbers, punctuation, newlines,
    space runs, and word-ish spans (with trailing apostrophe glue)."""
    return [m.group(1) for m in WORD_REGEX.finditer(text)]


def token_features(token: str) -> Dict[str, str]:
    """shape / prefix3 / suffix3 / norm for one token
    (simple_text_embedding.py:198-233 vocabulary features)."""
    norm = _anyascii(token.lower())
    return {
        "shape": word_shape(token),
        "prefix": norm[:3],
        "suffix": norm[-3:],
        "norm": norm,
    }


def text_token_features(text: str) -> List[Dict[str, str]]:
    """All tokens of a line, featurized — the per-bloc record a Spark
    featurization stage emits for the trainable text path."""
    return [token_features(t) for t in tokenize_words(text)
            if t.strip() != ""]
