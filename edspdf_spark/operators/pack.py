"""Sequence packing for LM training data (the concat-and-chunk plan).

Documents are laid end-to-end in id order; corpus token t belongs to
training sequence floor(t / seq_len). The operator emits the packing
PLAN (one row per document: where its tokens land), which is what a
distributed writer needs to materialize fixed-length sequences — the
doc -> sequence-range mapping is the whole algorithm; the byte copy is
a sink concern.

Scale shape (the 100-TB question): the global running offset is a
TWO-PHASE prefix sum —

  1. range-repartition by id + partition-local sort, then ONE tiny
     aggregation (one row per partition) collected to the driver and
     turned into exclusive per-partition offsets (a few KB broadcast
     in the task closure);
  2. a partition-local Arrow cumsum seeded with that offset.

`Window.orderBy(id)` without partitionBy — the naive formulation —
funnels the whole corpus through ONE task; the two-phase form keeps
every stage at full parallelism and the only extra action is the
per-partition subtotal count. RangePartitioner boundaries are sampled,
but the RESULT is boundary-independent: contiguous id ranges in
partition-index order always reconstruct the same global order.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..functions import tokens

PACK_SEQ_LEN = 512


def pack_sequences(df: DataFrame, seq_len: int = PACK_SEQ_LEN,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: Optional[int] = None) -> DataFrame:
    """Packing plan: (id, n_tokens, start_offset, first_seq, last_seq,
    n_seqs) per document, ids globally ordered, whitespace tokens.

    Zero-token documents still get a position (first_seq = last_seq =
    the sequence containing their start offset) so lineage stays
    total. All integer math — exact DuckDB oracle."""
    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    base = df.select(F.col(id_col).alias("id"),
                     F.size(tokens(F.col(text_col))).cast("bigint")
                     .alias("n_tokens"))
    part = (base.repartitionByRange(p, "id")
            .sortWithinPartitions("id")
            .withColumn("_pid", F.spark_partition_id())
            .persist())
    try:
        # one row per partition — the only driver-side collect, O(p)
        subtotals = {r["_pid"]: r["s"] for r in
                     part.groupBy("_pid")
                     .agg(F.sum("n_tokens").alias("s")).collect()}
        offsets = {}
        acc = 0
        for pid in range(p):
            offsets[pid] = acc
            acc += subtotals.get(pid, 0)

        id_type = df.schema[id_col].dataType
        out_schema = StructType([
            StructField("id", id_type),
            StructField("n_tokens", LongType()),
            StructField("start_offset", LongType())])

        def fn(batches):
            running = None
            for batch in batches:
                pids = batch.column("_pid").to_pylist()
                if running is None:
                    running = offsets[pids[0]] if pids else 0
                ns = batch.column("n_tokens").to_pylist()
                starts = []
                for n in ns:
                    starts.append(running)
                    running += n
                yield pa.RecordBatch.from_arrays(
                    [batch.column("id"),
                     batch.column("n_tokens").cast(pa.int64()),
                     pa.array(starts, pa.int64())],
                    names=["id", "n_tokens", "start_offset"])

        planned = part.mapInArrow(fn, schema=out_schema)
        # integer `div` throughout — float division would lose
        # exactness past 2^53 token offsets (a 100-TB corpus is ~10^13
        # tokens, within bigint but not within double precision)
        first = F.expr(f"start_offset div {seq_len}")
        last = F.expr(
            f"(start_offset + (case when n_tokens = 0 then 1 "
            f"else n_tokens end) - 1) div {seq_len}")
        out = planned.select(
            "id", "n_tokens", "start_offset",
            first.alias("first_seq"), last.alias("last_seq"),
            (last - first + 1).alias("n_seqs"))
        # materialize before unpersist: the plan references `part`
        out = out.localCheckpoint(eager=True)
    finally:
        part.unpersist()
    return out


# --- overlapping token-window chunking (retrieval / embedding prep) --------

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def chunk_windows(df: DataFrame, window: int = CHUNK_WINDOW,
                  stride: int = CHUNK_STRIDE, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Overlapping token windows per document — the chunking step in
    front of an embedding model / retrieval index: chunk c covers
    tokens [c*stride, c*stride + window). Windows start while
    start < n_tokens and the LAST chunk is the first one whose end
    reaches the document end (trailing fully-contained starts are
    dropped: n_chunks = 1 + ceil(max(n - window, 0) / stride)), so
    every token is covered exactly without degenerate tail chunks.

    Emits (id, chunk_idx, n_chunks, start, n_tokens, chunk_text).

    Scale shape: pure codegen — split once, posexplode a sequence of
    chunk indices, slice + array_join per chunk. Zero shuffles, zero
    Python; output amplification is the output itself (each token
    appears in ~window/stride chunks). Empty documents emit no rows
    (a chunker's contract is "text in, chunks out").
    """
    if window <= 0 or stride <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    base = df.select(F.col(id_col).alias("id"),
                     tokens(F.col(text_col)).alias("toks"))
    base = base.select("id", "toks",
                       F.size("toks").cast("bigint").alias("n_tokens"))
    # ceil((n - window) / stride) in exact integer math
    n_chunks = F.when(F.col("n_tokens") <= 0, F.lit(0).cast("bigint")) \
        .otherwise(F.expr(f"1L + (greatest(n_tokens - {window}, 0L) "
                          f"+ {stride - 1}) div {stride}"))
    out = (base.select("id", "toks", "n_tokens",
                       n_chunks.alias("n_chunks"))
           .where(F.col("n_chunks") > 0)
           .select("id", "n_tokens", "n_chunks", "toks",
                   F.explode(F.sequence(
                       F.lit(0).cast("bigint"),
                       F.col("n_chunks") - 1)).alias("c")))
    chunk = F.slice(F.col("toks"),
                    (F.col("c") * stride + 1).cast("int"), window)
    return out.select(
        "id", F.col("c").alias("chunk_idx"), "n_chunks",
        (F.col("c") * stride).cast("bigint").alias("start"), "n_tokens",
        F.array_join(chunk, " ").alias("chunk_text"))
