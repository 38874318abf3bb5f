"""Sinks — the reference's writer connectors as Spark writes
(SURVEY.md §2.2).

| reference                         | here                            |
|-----------------------------------|---------------------------------|
| ParquetWriter (data/parquet.py:69-230) | write_texts_parquet: df.write.parquet, rows-per-file via maxRecordsPerFile (reference num_rows_per_file=8192, parquet.py:85) |
| PandasWriter (data/pandas.py:94-155)   | to_pandas: df.toPandas()        |
| to_iterable (data/base.py:140-180)     | to_iterable: df.toLocalIterator() |
| FileWriter (data/files.py:110-180)     | write_files: per-doc .pdf + .json dump via foreachPartition, with the reference's overwrite-refusal semantics |
"""

from __future__ import annotations

import json
import os
from collections import Counter
from typing import Iterator, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812


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


def _check_overwrite(path: str, overwrite: bool) -> None:
    """Reference overwrite refusal (data/files.py:141-152): an existing
    directory containing .pdf/.json files refuses the write unless
    overwrite=True, listing the offending suffix counts."""
    if not os.path.isdir(path):
        return
    suffixes = Counter(os.path.splitext(f)[1] for f in os.listdir(path))
    unsafe = {s: v for s, v in suffixes.items() if s in (".pdf", ".json")}
    if unsafe and not overwrite:
        raise FileExistsError(
            f"Directory {path} already exists and appear to contain "
            "annotations:"
            + "".join(f"\n -{s}: {v} files" for s, v in unsafe.items())
            + "\nUse overwrite=True to write files anyway.")


def write_files(docs: DataFrame, path: str, *, overwrite: bool = False,
                filename_col: str = "url", content_col: str = "html",
                meta_cols: Optional[Sequence[str]] = None) -> None:
    """Per-document dump, mirroring the reference FileWriter
    (data/files.py:110-180): `{filename}.pdf` gets the payload bytes,
    `{filename}.json` the remaining record fields.

    The filename is the basename of `filename_col` without its
    extension (the reference round-trips FILENAME the same way,
    files.py:104-106). Executors write through foreachPartition — the
    path must be a filesystem every executor can reach (local mode:
    any local dir; cluster: a shared mount/object store via fuse).
    Annotation-tool round-trips read the dump back with
    readers.read_pdf_files."""
    from pyspark.sql import functions as F  # noqa: N812

    _check_overwrite(path, overwrite)
    os.makedirs(path, exist_ok=True)
    meta = list(meta_cols if meta_cols is not None
                else [c for c in docs.columns
                      if c not in (filename_col, content_col)])
    cols = [filename_col, content_col, *meta]
    rows = docs.select(*cols)

    # distinct urls may share a basename ('a/doc.pdf' vs 'b/doc.pdf');
    # a silent last-writer-wins dump would lose documents, so refuse up
    # front (one cheap distributed agg on the names, never the payload)
    base = F.element_at(F.split(F.col(filename_col), "/"), -1)
    # drop only the LAST extension, exactly like rsplit('.', 1) below
    name = F.regexp_replace(base, r"\.[^.]*$", "")
    clash = (rows.select(name.alias("_name"))
             .groupBy("_name").count().where(F.col("count") > 1)
             .limit(3).collect())
    if clash:
        raise ValueError(
            "write_files filename collisions (distinct rows map to the "
            "same basename): "
            + ", ".join(f"{r['_name']} x{r['count']}" for r in clash))

    def write_partition(it) -> None:
        for row in it:
            name = os.path.basename(str(row[filename_col]))
            name = name.rsplit(".", 1)[0] if "." in name else name
            payload = row[content_col]
            with open(os.path.join(path, f"{name}.pdf"), "wb") as f:
                f.write(bytes(payload) if payload is not None else b"")
            rec = {c: row[c] for c in meta}
            with open(os.path.join(path, f"{name}.json"), "w") as f:
                json.dump(rec, f, default=str)

    rows.foreachPartition(write_partition)


def write_sharded(df: DataFrame, path: str, partition_col: str,
                  rows_per_file: int = 8192,
                  mode: str = "overwrite") -> dict:
    """Partitioned parquet export with a manifest: writes
    `path/<partition_col>=<v>/...` (hive layout — the Iceberg-
    compatible table shape, partition pruning for free on read) with
    the reference's 8192 rows-per-file discipline, then a
    `_manifest.json` recording per-partition row counts and the total
    — the consumption contract a downstream training job checks
    before reading.

    The counts come from one aggregation over the SOURCE (not a
    re-read), so the manifest also certifies the write: a re-read
    count mismatch means a torn export. Returns the manifest dict."""
    import json as _json
    import os as _os

    (df.write.mode(mode)
       .option("maxRecordsPerFile", rows_per_file)
       .partitionBy(partition_col)
       .parquet(path))
    counts = {str(r["k"]): r["n"] for r in
              (df.groupBy(F.col(partition_col).alias("k"))
               .agg(F.count(F.lit(1)).alias("n")).collect())}
    manifest = {"partition_col": partition_col,
                "rows_per_file": rows_per_file,
                "partitions": counts,
                "total_rows": sum(counts.values())}
    with open(_os.path.join(path, "_manifest.json"), "w") as fh:
        _json.dump(manifest, fh, sort_keys=True)
    return manifest


def read_sharded(spark, path: str, expect_manifest: bool = True):
    """Read a write_sharded table, verifying the manifest row count
    when present (raises on a torn export)."""
    import json as _json
    import os as _os

    df = spark.read.parquet(path)
    mpath = _os.path.join(path, "_manifest.json")
    if expect_manifest and _os.path.exists(mpath):
        with open(mpath) as fh:
            manifest = _json.load(fh)
        n = df.count()
        if n != manifest["total_rows"]:
            raise ValueError(
                f"sharded table at {path} has {n} rows but manifest "
                f"records {manifest['total_rows']} — torn export")
    return df
