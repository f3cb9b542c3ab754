"""Event-time window operators over the events table.

The reference has no streaming semantics (SURVEY §2.8) — these are the
extension operators a training-data/telemetry pipeline needs.  They are
written against batch DataFrames but use the exact constructs
(F.window / F.session_window) that transfer unchanged to readStream inputs;
bulkfhirloader_spark.streaming wires the same logic behind a file stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def sessionize(
    events: DataFrame,
    gap_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-EVENT session assignment by inactivity gap — the companion to
    ``session_stats``: that one aggregates sessions away, this one keeps
    event granularity and tags each event with its session ordinal (what
    downstream per-session feature extraction joins against).

    Classic lag + running-sum-of-boundaries: an event starts a new session
    when it is more than ``gap_seconds`` after the user's previous event;
    the session ordinal is the running count of boundary flags.  ONE hash
    shuffle keyed by user (both window passes share the same partitioning —
    Catalyst plans a single Exchange), state bounded per user.  Timestamps
    compare as µs epochs: exact integer arithmetic, engine-portable.
    """
    us = F.unix_micros(F.col(ts_col))
    order = [us.asc(), F.col(order_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(us).over(w)
    is_new = (prev.isNull() | ((us - prev) > gap_seconds * 1_000_000)).cast("long")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        F.col(order_col),
        F.col(user_col),
        us.alias("ts_epoch_us"),
        F.sum(is_new).over(running).alias("session_seq"),
    )
