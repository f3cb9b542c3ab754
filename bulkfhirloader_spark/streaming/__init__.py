"""Structured Streaming variants of the batch operators."""

from bulkfhirloader_spark.streaming.ingest import stream_bundles, stream_ingest_available_now
from bulkfhirloader_spark.streaming.joins import stream_interval_join
from bulkfhirloader_spark.streaming.stateful import (
    running_user_totals,
    stream_sessionize,
    stream_tumbling_counts,
    streaming_exact_dedup,
)

__all__ = [
    "stream_bundles",
    "stream_ingest_available_now",
    "running_user_totals",
    "stream_interval_join",
    "stream_sessionize",
    "stream_tumbling_counts",
    "streaming_exact_dedup",
]
