"""Watermarked stream-stream joins — the join surface Structured Streaming
adds beyond batch (the reference has no streaming at all, SURVEY §2.8).

A stream-stream inner join must bound BOTH sides' state or it buffers the
streams forever.  The interval form does it with watermarks plus an
event-time range condition: left rows can stop waiting once the watermark
passes their timestamp; right rows are evicted once the watermark passes
``right_ts + lookback`` (no future left row can reach back that far).
State is therefore O(events inside one lookback window per key), not
O(stream length) — the property that lets an always-on pipeline run this
join indefinitely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "p_ts",
    lookback_seconds: int = 1800,
    watermark_seconds: int | None = None,
) -> DataFrame:
    """Inner stream-stream interval join: each left event pairs with the
    same key's right events in ``[left_ts - lookback, left_ts]`` (e.g.
    every click joined to the purchases it may have driven).

    Column names other than ``on`` must be disjoint between the two inputs
    (rename before calling); ``left_ts`` / ``right_ts`` are the event-time
    columns and get the watermarks.

    Determinism: an inner interval join is a pure SET of pairs — unlike
    ordinal tagging, arrival order cannot change its value, only state
    eviction can (a match lost because one side was evicted early).  On
    in-order replay (time-range-chunked files) no match is ever evicted
    before its partner arrives for ANY watermark delay >= 0, because the
    micro-batch watermark lags one batch: a right row within lookback of a
    next-chunk left row is by construction newer than
    ``watermark - lookback``.  So the output equals the batch inequality
    join exactly, while the watermark still bounds state for the unbounded
    case.
    """
    if watermark_seconds is None:
        watermark_seconds = lookback_seconds
    wl = left.withWatermark(left_ts, f"{watermark_seconds} seconds")
    wr = right.withWatermark(right_ts, f"{watermark_seconds} seconds")
    wr = wr.withColumnRenamed(on, "_r_key")
    cond = (
        (F.col(on) == F.col("_r_key"))
        & (
            F.col(right_ts)
            >= F.col(left_ts) - F.expr(f"INTERVAL {int(lookback_seconds)} SECONDS")
        )
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return wl.join(wr, cond, "inner").drop("_r_key")
