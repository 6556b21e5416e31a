"""Structured Streaming analog for incremental ingestion (SURVEY §7
phase 6 — explicitly beyond the reference, whose closest construct
is chunked CSV→parquet appends,
reference: ingestion_pipeline_langgraph.py:183-209)."""

from parquet_pipeline_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    windowed_event_counts,
    stream_to_parquet,
)
