"""Streaming windowed aggregation with watermark-based late-data
handling.

The reference has no streaming (SURVEY.md §2.9); this is the
engine-side operator a continuous crawl pipeline needs: tumbling-
window counts/sums per event type, tolerating late arrivals up to the
watermark. Batch form = __spark_entry__.q_events_hourly (oracled);
this is the same logical agg under Structured Streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """events(ts TIMESTAMP, event_type STRING, value DOUBLE) ->
    per-(window, event_type) counts and exact milli-sums. Works on
    both batch and streaming DataFrames."""
    # watermarks require TIMESTAMP (not NTZ); normalize either way so
    # batch and streaming forms aggregate identical keys
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (df.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.round(F.col("value") * 1000).cast("bigint"))
                 .alias("sum_value_milli"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "sum_value_milli"))


def stream_event_counts(spark: SparkSession, input_dir: str,
                        output_dir: str, checkpoint_dir: str,
                        schema, window: str = "1 hour",
                        watermark: str = "2 hours",
                        available_now: bool = True) -> StreamingQuery:
    """File-stream version: readStream(parquet) -> watermark ->
    windowed agg -> append parquet (only finalized windows emit)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(src, window=window, watermark=watermark)
    writer = (agg.writeStream.format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
