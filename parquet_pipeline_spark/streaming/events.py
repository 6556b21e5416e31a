"""Streaming operators over the ``events`` table shape.

The batch twin of ``windowed_event_counts`` is the driver query
``q25_events_hourly`` (operators/relational.py) — identical
window/agg semantics, so the streaming path is verified against the
batch result on the same data in tests/test_streaming.py.

Scale notes: watermark + tumbling window is the canonical bounded-
state pattern; state size is O(windows × event_types), not O(rows).
``stream_to_parquet`` is the incremental-append analog of the
reference's chunked CSV ingest, with checkpointing for exactly-once
file-sink semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "json", max_files: int = 10
) -> DataFrame:
    """File-source stream over a directory of event files (new files
    = new micro-batches — the streaming analog of 'append chunks')."""
    reader = (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
    )
    return reader.load(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums with late-data handling.
    Works on both batch and streaming DataFrames (same plan shape as
    q25_events_hourly)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_to_parquet(
    df: DataFrame, dest: str, checkpoint: str, trigger_once: bool = True
):
    """Incremental parquet sink with checkpointing (exactly-once file
    semantics). ``trigger_once`` processes available data then stops —
    the batch-backfill mode; continuous mode just drops the flag."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
