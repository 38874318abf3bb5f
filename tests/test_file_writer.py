"""FileWriter equivalent (reference data/files.py:110-180): per-doc
.pdf + .json dump, overwrite refusal, and the annotation-tool
round-trip (write -> read_pdf_files -> identical blocs)."""

import json
import os

import pytest

from edspdf_spark import synth
from edspdf_spark.kernels.extract import extract_doc
from edspdf_spark.sources.readers import from_iterable, read_pdf_files
from edspdf_spark.sources.writers import write_files


def _pages(spark, n=6):
    rows = [(f"https://example.org/doc/{i:08d}.pdf", synth.make_pdf_bytes(i))
            for i in range(n) if i % 13 != 0 or i == 0]
    return from_iterable(spark, rows), rows


def test_write_files_roundtrip(spark, tmp_path):
    out = tmp_path / "dump"
    df, rows = _pages(spark)
    write_files(df, str(out))
    pdfs = sorted(p for p in os.listdir(out) if p.endswith(".pdf"))
    jsons = sorted(p for p in os.listdir(out) if p.endswith(".json"))
    assert len(pdfs) == len(rows) and len(jsons) == len(rows)

    # .json carries the non-content record fields
    with open(out / jsons[0]) as f:
        rec = json.load(f)
    assert set(rec) == {"warc_ts", "text", "lang"}

    # round-trip: read the dump back, blocs identical per doc
    back = {os.path.basename(r["url"]): bytes(r["html"])
            for r in read_pdf_files(spark, str(out)).collect()}
    assert len(back) == len(rows)
    for url, payload in rows:
        name = os.path.basename(url)
        assert back[name] == payload
        assert extract_doc(back[name]) == extract_doc(payload)


def test_write_files_overwrite_refusal(spark, tmp_path):
    out = tmp_path / "dump"
    df, _ = _pages(spark, 3)
    write_files(df, str(out))
    with pytest.raises(FileExistsError, match="overwrite=True"):
        write_files(df, str(out))
    # non-pdf/json content does not trigger the refusal
    other = tmp_path / "other"
    other.mkdir()
    (other / "notes.txt").write_text("x")
    write_files(df, str(other))
    # and overwrite=True always proceeds
    write_files(df, str(out), overwrite=True)


def test_write_files_refuses_basename_collisions(spark, tmp_path):
    rows = [("https://x/a/doc.pdf", b"%PDF-1"), ("https://x/b/doc.pdf", b"%PDF-2")]
    df = from_iterable(spark, rows)
    with pytest.raises(ValueError, match="collision"):
        write_files(df, str(tmp_path / "dump3"))


def test_write_files_meta_cols_subset(spark, tmp_path):
    df, _ = _pages(spark, 3)
    out = tmp_path / "dump2"
    write_files(df, str(out), meta_cols=["lang"])
    j = sorted(p for p in os.listdir(out) if p.endswith(".json"))[0]
    with open(out / j) as f:
        assert set(json.load(f)) == {"lang"}
