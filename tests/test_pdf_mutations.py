"""Adversarial REAL-file corpus (r4 VERDICT #4): every reference
resource PDF, re-expressed through 9 file-structure mutations a
real-world writer could have chosen — object-stream repacking,
classic-table rewrites, split content arrays, indirect lengths and
resources, reversed object numbering, incremental updates that
vandalize the original stream bytes, and re/de-compression — must
parse to the EXACT same bloc set as the unmutated file (which is
itself pinned byte-identical to the reference's frozen pdfminer
ground truth by test_real_pdf_parity.py).

Mutants are built by edspdf_spark/kernels/pdf_rewrite.py, which
serializes through an independent writer: a scanner bug that mangled
structure would produce a mutant whose parse diverges here, not one
that round-trips the bug invisibly."""

import pytest

from edspdf_spark.kernels.extract import extract_doc
from edspdf_spark.kernels.pdf import PdfParseError
from edspdf_spark.kernels.pdf_rewrite import ALL_MUTATIONS

RES = "/root/reference/tests/resources"
DOCS = ["test", "styles", "letter"]


def _blocs(data: bytes):
    res = extract_doc(data)
    assert not res["error"], res
    return sorted(
        (b["page_num"], b["text"], b["x0"], b["x1"], b["y0"], b["y1"])
        for b in res["blocs"])


@pytest.fixture(scope="module")
def originals():
    out = {}
    for name in DOCS + ["blank"]:
        data = open(f"{RES}/{name}.pdf", "rb").read()
        out[name] = (data, _blocs(data))
    return out


@pytest.mark.parametrize("mutation", sorted(ALL_MUTATIONS))
@pytest.mark.parametrize("name", DOCS)
def test_mutated_real_pdf_parses_identically(originals, name, mutation):
    data, want = originals[name]
    try:
        mutant = ALL_MUTATIONS[mutation](data)
    except PdfParseError as exc:
        pytest.skip(f"{mutation} inapplicable to {name}.pdf: {exc}")
    assert mutant != data
    assert _blocs(mutant) == want, (name, mutation)


@pytest.mark.parametrize("mutation", ["classicize", "objstm_repack",
                                      "renumber_reversed"])
def test_mutated_blank_pdf_stays_blank(originals, mutation):
    data, want = originals["blank"]
    assert want == []
    mutant = ALL_MUTATIONS[mutation](data)
    assert _blocs(mutant) == []


def test_mutations_compose(originals):
    """Chained mutations (repack -> renumber -> split -> indirect
    lengths -> classicize) still parse identically — the structure
    features compose the way real writer pipelines stack them."""
    data, want = originals["test"]
    m = ALL_MUTATIONS["objstm_repack"](data)
    m = ALL_MUTATIONS["renumber_reversed"](m)
    m = ALL_MUTATIONS["split_contents"](m)
    m = ALL_MUTATIONS["indirect_lengths"](m)
    m = ALL_MUTATIONS["classicize"](m)
    assert _blocs(m) == want


def test_incremental_override_vandalized_base_is_garbage(originals):
    """The incremental mutant's FIRST copy of each content stream is
    vandalized in place — proof the parser really honors
    last-occurrence-wins rather than happening to read bytes that are
    still valid."""
    from edspdf_spark.kernels.pdf_rewrite import (incremental_override,
                                                  parse_objects,
                                                  write_classic)
    data, want = originals["test"]
    mutant = incremental_override(data)
    assert _blocs(mutant) == want
    # truncating the file before the appended section leaves only the
    # vandalized copies: the parse must NOT reproduce the document
    base_len = len(write_classic(parse_objects(data)))
    truncated = mutant[:base_len]
    res = extract_doc(truncated)
    got = sorted((b["page_num"], b["text"]) for b in res["blocs"])
    assert res["error"] or got != sorted((p, t) for p, t, *_ in want)


def test_extract_doc_byte_flip_fuzz_never_raises():
    """Common-Crawl reality: truncated/bit-rotted PDFs. Any byte
    corruption of a valid document must either still parse or come
    back as an error row — extract_doc never raises and never hangs.
    Deterministic RNG so failures reproduce."""
    import random

    from edspdf_spark.kernels import extract_doc
    from edspdf_spark.synth import make_pdf_bytes

    rng = random.Random(20260818)
    base = bytearray(make_pdf_bytes(7))
    for trial in range(60):
        data = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            pos = rng.randrange(len(data))
            data[pos] = rng.randrange(256)
        res = extract_doc(bytes(data))
        assert isinstance(res["error"], bool), trial
        assert isinstance(res["blocs"], list), trial

    # truncations at every granularity
    for cut in (0, 1, 16, len(base) // 3, len(base) // 2, len(base) - 7):
        res = extract_doc(bytes(base[:cut]))
        assert isinstance(res["error"], bool)
