"""Token-level text features of the reference's simple-text-embedding
(§2.7): word shape, prefix/suffix, normalized form, and the word
tokenizer (/root/reference/edspdf/pipes/embeddings/
simple_text_embedding.py:31-70, 108-113, 198-233).

Feature composition follows the reference preprocess exactly
(simple_text_embedding.py:214-227): tokens are `m.group(0)` of every
regex match (whitespace runs included — the sequence LENGTH matches
the reference), `ascii_str = anyascii(word).strip()` is computed once,
then shape = word_shape(ascii_str) and prefix/suffix/norm =
ascii_str.lower() slices. anyascii is absent in this sandbox, so the
transliteration step falls back to identity behind an import-try:
features are EXACT for ASCII input; for non-ASCII input they deviate
only by the missing transliteration (documented deviation).
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
    space runs, and word-ish spans (with trailing apostrophe glue).
    One token per regex match, `m.group(0)` (word + optional trailing
    whitespace char) exactly as the reference preprocess consumes it
    (simple_text_embedding.py:214)."""
    return [m.group(0) for m in WORD_REGEX.finditer(text)]


def token_features(token: str) -> Dict[str, str]:
    """shape / prefix3 / suffix3 / norm for one token, composed as the
    reference does (simple_text_embedding.py:216-227): transliterate,
    strip, then derive every feature from the stripped ascii form."""
    ascii_str = _anyascii(token).strip()
    lower = ascii_str.lower()
    return {
        "shape": word_shape(ascii_str),
        "prefix": lower[:3],
        "suffix": lower[-3:],
        "norm": lower,
    }


def text_token_features(text: str) -> List[Dict[str, str]]:
    """All tokens of a line, featurized — one record per regex match
    (whitespace runs produce empty-string features, exactly like the
    reference preprocess, so downstream sequence consumers see the
    same lengths)."""
    return [token_features(t) for t in tokenize_words(text)]
