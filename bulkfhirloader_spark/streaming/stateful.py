"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming surface at all (SURVEY §2.8); these are the
engine-extension shapes a continuous ingest would need.  The pattern is the
Spark-sanctioned one for arbitrary per-key state: Arrow-batched pandas
groups with an explicit GroupState, emitted in update mode — the custom
analog of the built-in windowed aggregations in operators.windows.

State is a tuple Row matching ``state_schema``; Spark checkpoints it, so
the operator is exactly-once across restarts.  Per-key state is O(1) here
(two numbers), so the state store stays tiny at any event volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value_cents bigint"
_STATE_SCHEMA = "n bigint, total_cents bigint"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count + running value sum (exact integer
    cents), updated each micro-batch — e.g. live per-user spend counters.

    Works on a STREAMING DataFrame with columns (user_id, value).  Money is
    accumulated in integer cents so state never drifts (float state would
    accumulate rounding across thousands of micro-batches).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((n, total_cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [total_cents],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_tumbling_counts(events: DataFrame, window: str = "10 minutes",
                           watermark: str = "30 minutes") -> DataFrame:
    """Watermarked event-time tumbling aggregation on a STREAMING DataFrame —
    the streaming form of operators.windows.tumbling_counts.  The watermark
    bounds state: windows older than max(event time) - watermark are
    finalized and their state dropped, which is what makes an unbounded
    stream run in bounded memory."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Ingestion-time exact dedup on a STREAMING DataFrame: hash the body,
    keep the first arrival of each hash via Spark's stateful
    dropDuplicates.  The state store holds one 64-char key per distinct
    document — the streaming form of operators.dedup.exact_dedup, and the
    shape an always-on corpus ingester needs (arrivals after the first are
    dropped at ingest instead of by a nightly batch job).

    Emits the distinct content hashes (first-arrival rows are
    order-dependent across micro-batches; the hash SET is deterministic).
    """
    from pyspark.sql import functions as F

    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("content_sha"))
        .dropDuplicates(["content_sha"])
    )


TRANSITIONS_SCHEMA = "prev_type string, next_type string, n bigint"
_TRANSITIONS_STATE = "last_us bigint, last_id bigint, last_type string"


def stream_transitions(events: DataFrame) -> DataFrame:
    """Streaming first-order Markov transition counting — the stateful twin
    of operators.sequences.transition_counts: per user, count consecutive
    (prev_type, next_type) event pairs as they arrive, chaining ACROSS
    micro-batches through a 3-field GroupState holding the user's last seen
    event (ts, id, type).

    Emits per-user per-batch partial counts in update mode; the caller
    sums them (`groupBy(prev, next).sum(n)`) — on in-order replay the total
    equals the batch transition matrix exactly, because the state hands the
    boundary event of batch k to the first pair of batch k+1.  State is
    O(1) per user (two longs + a type string) at any event volume; no
    timeout is needed because the state is a chaining cursor, not a window
    (an idle user costs ~40 bytes, and an eviction would silently DROP the
    cross-batch transition — correctness over memory here, unlike
    sessionization where event-time timeout is provably safe).

    Within a batch, the group's rows are sorted by (ts, event_id) before
    pairing — the same deterministic tiebreak the batch operator and its
    DuckDB oracle use; cross-batch order is the source's contract (the
    registry harness replays time-ordered files).

    Replay-order guard: the contract is per-user in-order delivery across
    micro-batches, but file-source batch boundaries follow mtimes, so a
    replay glitch CAN deliver events at-or-before the stored cursor.
    Blindly chaining them would both emit a wrong boundary pair and REGRESS
    the cursor, corrupting every later batch.  Instead, events <= the
    cursor are excluded from pairing and surfaced as one labeled
    ``('__out_of_order__', '__dropped__', n)`` row — detectable and
    filterable downstream, never silent — and the cursor only ever advances
    (max of stored vs batch tail)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if len(p)]
        if not chunks:  # defensive: NoTimeout means data-only invocations
            yield pd.DataFrame({"prev_type": [], "next_type": [], "n": []})
            return
        batch = pd.concat(chunks, ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = (batch["ts"].astype("int64") // 1_000).to_numpy()
        ids = batch["event_id"].to_numpy()
        types = batch["event_type"].to_numpy()
        n_stale = 0
        if state.exists:
            last_us, last_id, last_type = state.get
            fresh = (ts_us > last_us) | ((ts_us == last_us) & (ids > last_id))
            n_stale = int(len(ts_us) - fresh.sum())
            if n_stale:
                ts_us, ids, types = ts_us[fresh], ids[fresh], types[fresh]
            prev = [last_type] + list(types[:-1]) if len(types) else []
        else:
            prev = [None] + list(types[:-1])
        pairs = pd.DataFrame({"prev_type": prev, "next_type": types})
        pairs = pairs[pairs["prev_type"].notna()]
        counts = (
            pairs.groupby(["prev_type", "next_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        if len(types):  # cursor only ever advances
            state.update((int(ts_us[-1]), int(ids[-1]), str(types[-1])))
        if n_stale:
            counts = pd.concat(
                [counts, pd.DataFrame({"prev_type": ["__out_of_order__"],
                                       "next_type": ["__dropped__"],
                                       "n": [n_stale]})],
                ignore_index=True,
            )
        yield counts

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRANSITIONS_SCHEMA,
        stateStructType=_TRANSITIONS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSIONIZE_SCHEMA = (
    "event_id bigint, user_id bigint, ts_epoch_us bigint, session_start_us bigint"
)
_SESSIONIZE_STATE = "last_us bigint, session_start_us bigint"


def stream_sessionize(events: DataFrame, gap_seconds: int = 3600) -> DataFrame:
    """Streaming gap sessionization — the stateful-streaming twin of
    operators.windows.sessionize: tag every event, as it arrives, with its
    session's START timestamp (a stable session id; an ordinal would not
    survive state expiry).

    State per user is TWO numbers: (last event µs, current session start µs).
    GroupStateTimeout.EventTimeTimeout expires idle users' state once the
    watermark passes last_event + gap.  Dropping state is SEMANTICALLY SAFE
    here, not just an approximation: the watermark delay is set to ``gap``,
    so a timeout at watermark w implies last + gap < w, and any later event
    for that user (necessarily at ts >= w - gap in an in-order stream, since
    older rows are watermark-filtered) is > gap past the last one — it would
    have opened a new session regardless.  So the state store is bounded by
    the ACTIVE user set, and output equals the batch operator exactly on
    per-user-in-order input (e.g. time-range-chunked files).

    Per-batch work is numpy-vectorized over the Arrow group (diff → boundary
    flags → cumsum → per-group first), not a Python per-row loop.
    """
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_us, sess_start = state.get if state.exists else (None, None)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts_epoch_us", "event_id"])
            us = pdf["ts_epoch_us"].to_numpy(dtype="int64")
            is_new = np.empty(len(us), dtype=bool)
            is_new[0] = last_us is None or us[0] - last_us > gap_us
            if len(us) > 1:
                is_new[1:] = (us[1:] - us[:-1]) > gap_us
            grp = np.cumsum(is_new)  # 0 = continuing the carried session
            group_firsts = us[is_new]
            starts = np.where(
                grp == 0,
                sess_start if sess_start is not None else 0,
                group_firsts[np.maximum(grp - 1, 0)],
            )
            last_us = int(us[-1])
            sess_start = int(starts[-1])
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"].to_numpy(dtype="int64"),
                    "user_id": np.full(len(us), key[0], dtype="int64"),
                    "ts_epoch_us": us,
                    "session_start_us": starts.astype("int64"),
                }
            )
        if last_us is not None:
            state.update((last_us, sess_start))
            # ms epoch; > current watermark because last_us is post-watermark
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)

    tagged = events.withWatermark("ts", f"{gap_seconds} seconds").select(
        "event_id",
        "user_id",
        "ts",
        F.unix_micros("ts").alias("ts_epoch_us"),
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSIONIZE_SCHEMA,
        stateStructType=_SESSIONIZE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


ATTRIBUTION_SCHEMA = (
    "conversion_event_id bigint, user_id bigint, conversion_us bigint, "
    "first_touch_event_id bigint, last_touch_event_id bigint"
)
_ATTRIBUTION_STATE = (
    "cursor_us bigint, cursor_id bigint, dropped_us bigint, dropped_id bigint, "
    "touch_us array<bigint>, touch_ids array<bigint>"
)


def stream_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_seconds: int = 3600,
) -> DataFrame:
    """Streaming conversion attribution — the stateful twin of
    operators.sequences.attribute_conversions: every arriving conversion is
    tagged with its user's LAST touch so far (last-touch model) and the
    FIRST touch inside the trailing lookback window (first-touch-in-window
    model), exactly as the batch window frames define them.

    State per user is BOUNDED: the touch (id, µs) pairs inside one lookback
    of the user's cursor — the same bound the interval join holds — plus
    two scalar cursors: the newest touch ever TRIMMED from that window
    (it can still win the unbounded last-touch model for a conversion that
    arrives with no in-window touches) and the (µs, id) high-water mark.
    Trimming is provably lossless for the windowed model: an in-order
    stream's future conversions sit at µs >= cursor, so a touch older than
    cursor − lookback can never re-enter a window.

    Per batch the group is processed with numpy searchsorted over the
    merged touch timeline (no per-row Python loop): last touch = the
    timeline entry just before the conversion (falling back to the trimmed
    scalar), first-in-window = the first entry in [conv − L, conv).  Rows
    at-or-before the high-water cursor (replay glitches) are excluded
    before pairing so they cannot corrupt state — same monotone-cursor
    guard as stream_transitions.  On in-order replay, summing nothing is
    needed: emitted rows equal the batch operator's output row-for-row,
    which is why the registry checks this against the SAME DuckDB oracle."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    lookback_us = int(lookback_seconds) * 1_000_000
    touch_set = set(touch_types)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if len(p)]
        empty = pd.DataFrame(
            {
                "conversion_event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "conversion_us": pd.Series([], dtype="int64"),
                "first_touch_event_id": pd.Series([], dtype="Int64"),
                "last_touch_event_id": pd.Series([], dtype="Int64"),
            }
        )
        if not chunks:
            yield empty
            return
        batch = pd.concat(chunks, ignore_index=True)
        batch = batch.sort_values(["ts_epoch_us", "event_id"], kind="mergesort")
        us = batch["ts_epoch_us"].to_numpy(dtype="int64")
        ids = batch["event_id"].to_numpy(dtype="int64")
        types = batch["event_type"].to_numpy()

        if state.exists:
            cur_us, cur_id, dr_us, dr_id, w_us, w_ids = state.get
            w_us = np.asarray(w_us, dtype="int64")
            w_ids = np.asarray(w_ids, dtype="int64")
            fresh = (us > cur_us) | ((us == cur_us) & (ids > cur_id))
            us, ids, types = us[fresh], ids[fresh], types[fresh]
        else:
            dr_us = dr_id = None
            w_us = np.empty(0, dtype="int64")
            w_ids = np.empty(0, dtype="int64")
        if not len(us):
            yield empty
            return

        is_touch = np.isin(types, list(touch_set))
        all_us = np.concatenate([w_us, us[is_touch]])
        all_ids = np.concatenate([w_ids, ids[is_touch]])

        is_conv = types == conversion_type
        c_us, c_ids = us[is_conv], ids[is_conv]
        last_fallback = np.nan if dr_id is None else float(dr_id)
        if len(all_us):
            hi = np.searchsorted(all_us, c_us, side="left")
            lo = np.searchsorted(all_us, c_us - lookback_us, side="left")
            first_t = np.where(
                lo < hi, all_ids[np.minimum(lo, len(all_ids) - 1)], np.nan
            )
            last_t = np.where(hi > 0, all_ids[np.maximum(hi - 1, 0)], last_fallback)
        else:
            first_t = np.full(len(c_us), np.nan)
            last_t = np.full(len(c_us), last_fallback)

        new_cur_us, new_cur_id = int(us[-1]), int(ids[-1])
        keep = all_us >= new_cur_us - lookback_us
        if (~keep).any():
            di = int((~keep).nonzero()[0][-1])  # newest trimmed touch
            dr_us, dr_id = int(all_us[di]), int(all_ids[di])
        state.update(
            (
                new_cur_us,
                new_cur_id,
                dr_us,
                dr_id,
                [int(x) for x in all_us[keep]],
                [int(x) for x in all_ids[keep]],
            )
        )
        yield pd.DataFrame(
            {
                "conversion_event_id": c_ids,
                "user_id": np.full(len(c_ids), key[0], dtype="int64"),
                "conversion_us": c_us,
                # float carriers for the NaN=null path; ids are exact in
                # float64 far beyond any test corpus, and Int64 round-trips
                # NaN as SQL NULL through Arrow
                "first_touch_event_id": pd.Series(first_t).astype("Int64"),
                "last_touch_event_id": pd.Series(last_t).astype("Int64"),
            }
        )

    ev = events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_epoch_us"),
        "event_type",
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ATTRIBUTION_SCHEMA,
        stateStructType=_ATTRIBUTION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
