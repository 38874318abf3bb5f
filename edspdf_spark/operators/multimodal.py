"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns exactly like `html` does
for PDFs. The Spark-side machinery — schema, Arrow batch shape,
partitioning, UDF signatures — is real and tested; the actual media
DECODE is stubbed (this container has no image/audio libraries):
`decode_stub=True` produces a deterministic fake feature vector from
the bytes, and `decode_stub=False` raises NotImplementedError at the
point where PIL/torchaudio/ffmpeg would be invoked.

binary_metadata() is pure native expressions (magic-byte sniffing via
hex prefixes) — no Python; extract_features() is the mapInPandas
pattern for the heavy decode path (batch in, batch out, bounded by
Arrow batch size like the PDF extractor).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import (ArrayType, FloatType, IntegerType, StringType,
                               StructField, StructType)

_MAGIC = [
    ("25504446", "pdf"),       # %PDF
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),      # wav/avi container
    ("3c68746d6c", "html"),    # <html
    ("3c21444f43", "html"),    # <!DOC
]


def binary_metadata(df: DataFrame, id_col: str = "url",
                    bin_col: str = "html") -> DataFrame:
    """(id, n_bytes, magic_hex, media_type): native magic sniffing."""
    hexpfx = F.lower(F.hex(F.substring(F.col(bin_col), 1, 8)))
    mt = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        mt = F.when(hexpfx.startswith(magic.lower()), F.lit(name)).otherwise(mt)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(bin_col).alias("n_bytes"),
        F.substring(hexpfx, 1, 8).alias("magic_hex"),
        mt.alias("media_type"),
    )


FEATURES_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("feature", ArrayType(FloatType())),
])


def extract_features(df: DataFrame, id_col: str = "url",
                     bin_col: str = "html", dim: int = 16,
                     decode_stub: bool = True) -> DataFrame:
    """Decode + featurize binary payloads via mapInPandas.

    Real deployments swap `_fake_decode` for PIL/torchvision etc.;
    the Spark plumbing (Arrow batches of binary, executor-side loop,
    fixed-dim float output) is identical.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, feats = [], [], []
            for rid, payload in zip(pdf[id_col].tolist(),
                                    pdf[bin_col].tolist()):
                data = bytes(payload) if payload is not None else b""
                ids.append(rid)
                sizes.append(len(data))
                feats.append(_decode(data, dim, decode_stub))
            yield pd.DataFrame({"id": ids, "n_bytes": sizes,
                                "feature": feats})

    return df.select(id_col, bin_col).mapInPandas(fn, schema=FEATURES_SCHEMA)


def _decode(data: bytes, dim: int, stub: bool):
    if not stub:
        raise NotImplementedError(
            "media decode requires PIL/torchaudio/ffmpeg, which this "
            "environment does not provide; run with decode_stub=True")
    # deterministic fake feature: byte-histogram folded into `dim` bins
    bins = [0.0] * dim
    for i, byte in enumerate(data[:4096]):
        bins[byte % dim] += 1.0
    total = sum(bins) or 1.0
    return [float(b / total) for b in bins]
