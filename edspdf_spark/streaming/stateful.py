"""Custom stateful streaming operator: first-seen streaming dedup.

The training-data use case: a continuous crawl emits (url, warc_ts,
content) pages; downstream must see each distinct content exactly once
per url-shard even across micro-batches. That needs per-key state
that outlives a batch — `applyInPandasWithState`, the Structured
Streaming primitive for custom state (the reference has no streaming;
SURVEY.md §2.9).

State model: key = dedup key prefix (first hex char of the content
md5 — 16 shards); value = the set of 15-hex-prefix content hashes seen
so far, stored as a state tuple of one string column (joined hashes).
Emits only rows whose content hash was not in state. Optional TTL via
GroupStateTimeout.ProcessingTimeTimeout is deliberately NOT used:
dedup state must never silently expire.

Scale note: per-key state grows with distinct content per shard; at
10^12 rows the production layout is key = md5 prefix of N chars (16^N
shards), giving bounded, hash-balanced state partitions — the shard
count is a parameter here for exactly that reason.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("shard string, url string, content_md5 string, "
              "first_seen boolean")
STATE_SCHEMA = "seen string"


def _dedup_fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    (shard,) = key
    seen = set()
    if state.exists:
        (joined,) = state.get
        if joined:
            seen = set(joined.split(","))
    out = []
    for pdf in pdfs:
        for url, md5 in zip(pdf["url"].tolist(),
                            pdf["content_md5"].tolist()):
            if md5 in seen:
                continue
            seen.add(md5)
            out.append((shard, url, md5, True))
    state.update((",".join(sorted(seen)),))
    yield pd.DataFrame(out, columns=["shard", "url", "content_md5",
                                     "first_seen"])


def keyed_hashes(pages: DataFrame, shard_chars: int = 1) -> DataFrame:
    """(url, html|text, ...) -> (shard, url, content_md5): the dedup
    key derivation shared by batch and streaming forms."""
    # hash the BINARY column directly: casting to string lossily decodes
    # invalid UTF-8 with replacement chars, so two distinct payloads
    # could collide and the first-seen dedup would drop never-seen docs
    content = F.coalesce(F.col("html"), F.lit(b""))
    md5 = F.substring(F.md5(content), 1, 15)
    return pages.select(
        F.substring(md5, 1, shard_chars).alias("shard"),
        "url", md5.alias("content_md5"))


def streaming_first_seen(pages: DataFrame,
                         shard_chars: int = 1) -> DataFrame:
    """Streaming DataFrame -> first-occurrence rows only, exactly once
    per distinct content per shard, across micro-batches."""
    keyed = keyed_hashes(pages, shard_chars)
    return (keyed.groupBy("shard")
            .applyInPandasWithState(
                _dedup_fn, outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_first_seen_stream(spark, input_dir: str, output_dir: str,
                          checkpoint_dir: str, schema,
                          shard_chars: int = 1):
    """File-stream driver: readStream -> stateful dedup -> append
    parquet with exactly-once checkpointing."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    out = streaming_first_seen(src, shard_chars)
    return (out.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
