"""Event-time window operators over the events table.

The reference has no streaming semantics (SURVEY §2.8) — these are the
extension operators a training-data/telemetry pipeline needs.  They are
written against batch DataFrames but use the exact constructs
(F.window / F.session_window) that transfer unchanged to readStream inputs;
bulkfhirloader_spark.streaming wires the same logic behind a file stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bulkfhirloader_spark.functions.scalars import money_cents


def tumbling_counts(
    events: DataFrame, duration: str = "10 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type."""
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money_cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    return (
        events.groupBy(F.window(ts_col, duration, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_stats(
    events: DataFrame, gap: str = "5 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity.  session_window keeps state bounded by the gap — the same
    code runs under Structured Streaming with a watermark."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money_cents(F.col("value"))).alias("value_cents"),
            F.min(ts_col).alias("first_ts"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "value_cents",
        )
    )
