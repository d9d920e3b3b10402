"""Structured Streaming surface (SURVEY §2.10, S10/M13) + custom stateful
operators (applyInPandasWithState)."""

from ssg_etl_spark.streaming.pipeline import (
    events_file_stream,
    foreach_batch_upsert,
    windowed_event_counts,
)
from ssg_etl_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_native_stream,
    sessionize_stream,
)

__all__ = [
    "events_file_stream",
    "foreach_batch_upsert",
    "windowed_event_counts",
    "sessionize_batch",
    "sessionize_native_stream",
    "sessionize_stream",
]
