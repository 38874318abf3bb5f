"""Sinks — the reference's writer connectors as Spark writes
(SURVEY.md §2.2).

| reference                         | here                            |
|-----------------------------------|---------------------------------|
| ParquetWriter (data/parquet.py:69-230) | write_texts_parquet: df.write.parquet, rows-per-file via maxRecordsPerFile (reference num_rows_per_file=8192, parquet.py:85) |
| PandasWriter (data/pandas.py:94-155)   | to_pandas: df.toPandas()        |
| to_iterable (data/base.py:140-180)     | to_iterable: df.toLocalIterator() |
| FileWriter (data/files.py:110-180)     | out of scope (per-doc .pdf dump; foreachPartition if ever needed) |
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame


def write_texts_parquet(texts: DataFrame, path: str,
                        mode: str = "error",
                        rows_per_file: int = 8192,
                        partition_by: Optional[list] = None) -> None:
    """Reference default num_rows_per_file=8192 (data/parquet.py:85);
    its overwrite refusal on non-empty dirs (files.py:141-152) is
    Spark's mode="error" default."""
    w = texts.write.mode(mode).option("maxRecordsPerFile", rows_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def to_pandas(df: DataFrame):
    return df.toPandas()


def to_iterable(df: DataFrame) -> Iterator:
    return df.toLocalIterator()
