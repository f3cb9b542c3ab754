"""Structured Streaming variants of the batch operators."""

from bulkfhirloader_spark.streaming.ingest import stream_bundles, stream_ingest_available_now

__all__ = ["stream_bundles", "stream_ingest_available_now"]
