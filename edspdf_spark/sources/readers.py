"""Sources — the reference's reader connectors re-expressed as Spark
reads (SURVEY.md §2.1).

| reference                       | here                               |
|---------------------------------|------------------------------------|
| readers.parquet (data/parquet.py:24-63) | read_pages_parquet: spark.read.parquet (split planning native) |
| readers.files (data/files.py:33-281)    | read_pdf_files: binaryFile datasource over *.pdf |
| from_iterable (data/base.py:71-137)     | from_iterable: createDataFrame     |
| from_pandas (data/pandas.py:18-91)      | from_pandas: Arrow-accelerated createDataFrame |

All return the canonical pages schema (url, warc_ts, html, text,
lang); converters are plain select/withColumn projections.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from ..schemas import PAGES_SCHEMA

_EPOCH = _dt.datetime(2024, 1, 1)


def read_pages_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Canonical input: a parquet/Iceberg-style pages table. Catalyst
    prunes to (url, html) when only extraction columns are used."""
    return spark.read.parquet(path)


def read_pages_table(spark: SparkSession, ref: str,
                     fmt: str = "auto") -> DataFrame:
    """Format-dispatched read of the pages table — the Iceberg shape
    of the north rule without hard-wiring a path layout.

    `ref` is a filesystem path (parquet) or a catalog table name
    (`db.tbl` / `catalog.db.tbl`). fmt:
      * "auto"    — refs containing a path separator read as parquet
                    directories; bare dotted names resolve through the
                    session catalog (which is exactly how an Iceberg
                    table appears once `spark.sql.catalog.<name>` is
                    configured with org.apache.iceberg.spark
                    .SparkCatalog; the runtime jar is a `--packages`
                    flag on spark-submit, never a code change here),
      * "parquet" / "iceberg" / "table" — explicit.
    Every downstream plan is identical either way: scans stay
    prunable/pushdown-capable DataSourceV2 or parquet relations."""
    if fmt == "auto":
        fmt = "parquet" if ("/" in ref or ref.endswith(".parquet")) \
            else "table"
    if fmt == "parquet":
        return spark.read.parquet(ref)
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(ref)
    if fmt == "table":
        return spark.table(ref)
    raise ValueError(f"unknown table format {fmt!r} "
                     "(expected auto/parquet/iceberg/table)")


def read_pdf_files(spark: SparkSession, path: str,
                   recursive: bool = True,
                   keep_ipynb_checkpoints: bool = False) -> DataFrame:
    """Directory of *.pdf files -> pages rows via the binaryFile source
    (reference FileReader globs *.pdf, data/files.py:60-107; its
    keep_ipynb_checkpoints filter is data/files.py:71-74)."""
    reader = (spark.read.format("binaryFile")
              .option("pathGlobFilter", "*.pdf")
              .option("recursiveFileLookup", str(recursive).lower()))
    df = reader.load(path)
    if not keep_ipynb_checkpoints:
        df = df.where(~F.col("path").contains(".ipynb_checkpoints"))
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def from_iterable(spark: SparkSession,
                  docs: Iterable[Tuple[str, bytes]]) -> DataFrame:
    """(url, pdf_bytes) pairs -> pages rows (reference IterableReader,
    data/base.py:71-137). Driver-side: test/tooling scale only."""
    rows = [(url, _EPOCH, bytes(b), "", None) for url, b in docs]
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """pandas pages DataFrame -> Spark (Arrow-accelerated)."""
    df = spark.createDataFrame(pdf)
    missing = [c for c in ("url", "html") if c not in df.columns]
    if missing:
        raise ValueError(f"pages frame missing columns: {missing}")
    for col, default in (("warc_ts", F.lit(_EPOCH).cast("timestamp")),
                         ("text", F.lit("")),
                         ("lang", F.lit(None).cast("string"))):
        if col not in df.columns:
            df = df.withColumn(col, default)
    return df.select("url", "warc_ts", "html", "text", "lang")
