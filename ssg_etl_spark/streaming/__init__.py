"""Structured Streaming surface (SURVEY §2.10, S10/M13)."""

from ssg_etl_spark.streaming.pipeline import (
    events_file_stream,
    foreach_batch_upsert,
    windowed_event_counts,
)

__all__ = ["events_file_stream", "foreach_batch_upsert", "windowed_event_counts"]
