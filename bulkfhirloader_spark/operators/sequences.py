"""User-journey / event-sequence analytics.

The reference's event handling stops at per-type routing (main.go:245-324
analog); a production analytics engine over the same event stream also needs
the classic sequence shapes: funnels, retention cohorts, transition matrices,
rolling aggregates, and CDC latest-per-key compaction.  Every operator here
is designed around ONE shuffle-and-sort per user (or zero, for
latest_per_key's map-side argmax):

- All per-user window computations share a single Window spec, so Catalyst
  plans ONE Exchange(hashpartitioning(user)) + ONE sort, with every derived
  column computed in the same Window operator pass.
- A groupBy on the same user key directly after a user-partitioned window
  reuses the partitioning — no second exchange for the per-user collapse.
- Nothing here collects per-user event lists (collect_list on a whale user
  with 10^8 events is an OOM); running conditional mins/lags keep state O(1)
  per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: for each prefix of ``steps``, the number
    of users with events matching that prefix IN ORDER (step k strictly
    after the user's earliest completion of steps 1..k-1).

    Plan shape: chained running conditional minimums over ONE
    user-partitioned, ts-ordered window spec — step k's running completion
    time is a running min of ts over rows of type step[k] falling strictly
    after the step k-1 running completion.  The K Window operators cannot
    fuse into one (each consumes the previous one's output column) but they
    all require the same distribution+ordering, so Catalyst plans exactly
    one Exchange(hashpartitioning(user)) and one Sort for the whole chain
    (plan-asserted in tests/test_sequences.py).  The per-user collapse
    groups on the same key and reuses the partitioning; only the final tiny
    per-step count aggregation moves data again.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = events
    prev_done = None
    done_cols = []
    for i, step in enumerate(steps):
        col = f"_t{i}"
        if prev_done is None:
            cand = F.when(F.col(type_col) == step, F.col(ts_col))
        else:
            cand = F.when(
                (F.col(type_col) == step) & (F.col(ts_col) > F.col(prev_done)),
                F.col(ts_col),
            )
        cur = cur.withColumn(col, F.min(cand).over(w))
        prev_done = col
        done_cols.append(col)
    per_user = cur.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in done_cols]
    )
    counts = per_user.agg(
        *[
            F.sum(F.col(c).isNotNull().cast("long")).alias(f"_n{i}")
            for i, c in enumerate(done_cols)
        ]
    )
    # K rows out: (step_index, step_name, n_users) — small enough to build
    # from one literal explode over the single aggregate row.
    steps_arr = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_index"),
                F.lit(s).alias("step_name"),
                F.col(f"_n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(steps_arr).alias("s")).select("s.*")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604_800,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen period, counted
    per (cohort_period, period_offset) they were active in.

    Periods are integer epoch divisions (default weekly) — engine-agnostic,
    unlike date_trunc('week') whose week-start convention varies.  The
    cohort period comes from an unframed min over the user partition (same
    exchange as any per-user work); the distinct-user count per cell then
    partially aggregates map-side before its own small shuffle.
    """
    period = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(period_seconds * 1_000_000))
    w = Window.partitionBy(user_col)
    with_cohort = events.select(
        F.col(user_col),
        period.cast("long").alias("_period"),
    ).withColumn("_cohort", F.min("_period").over(w))
    return (
        with_cohort.groupBy(
            F.col("_cohort").alias("cohort_period"),
            (F.col("_period") - F.col("_cohort")).alias("period_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    (prev_type, next_type, n) for consecutive events.  One lag over the
    user-partitioned ordered window, then a count on the tiny (type, type)
    key space — partial aggregation collapses it map-side.  Ordering ties
    on ts are broken by ``tiebreak_col`` so results are deterministic (and
    restatable in ANSI SQL)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    return (
        events.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("prev_type"), F.col(type_col).alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def rolling_window_stats(
    events: DataFrame,
    n_preceding: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing-window aggregate (here: last N+1 events' value sum
    and count per user) — the moving-average primitive.  Values are summed
    as exact integer cents inside the frame so the output hashes stably
    across engines; a single frame spec means a single Exchange+Sort."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-n_preceding, Window.currentRow)
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    return events.select(
        F.col(id_col),
        F.col(user_col),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.sum(cents).over(w).alias("window_value_cents"),
        F.count(F.lit(1)).over(w).alias("window_n"),
    )


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """CDC/compaction: keep each key's latest row by ``order_cols``
    (lexicographic).  Implemented as a struct-max argmax — max(struct(order
    ..., payload...)) — NOT a row_number window: the aggregate combines
    map-side (a partial SortAggregate runs below the exchange, so each
    input partition contributes ONE candidate struct per key), and a key
    with 10^9 updates shuffles one row per upstream partition instead of
    sorting 10^9 rows in a single reducer's window.  Same shape as dedup
    survivor selection (dedup.survivors_by_score)."""
    packed = F.struct(
        *[F.col(c) for c in order_cols], *[F.col(c) for c in payload_cols]
    )
    agg = df.groupBy(*key_cols).agg(F.max(packed).alias("_latest"))
    return agg.select(
        *key_cols,
        *[F.col(f"_latest.{c}").alias(c) for c in order_cols],
        *[F.col(f"_latest.{c}").alias(c) for c in payload_cols],
    )


def resample_forward_fill(
    events: DataFrame,
    step_seconds: int = 86_400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Regularize an irregular event stream onto a fixed grid with
    forward fill: one row per (user, step) from the user's first to last
    active step, carrying the last-observed value through gaps — the
    resample-and-ffill primitive behind dashboards and feature snapshots.

    Shape: per-bucket collapse first (struct-max argmax keeps the LAST
    event's value per (user, step) — map-side combining, same as
    latest_per_key), then the per-user [min_step, max_step] span from one
    more aggregate on the already-tiny bucket rows, an F.sequence explode
    to mint the grid (fan-out = span/step, a caller-controlled constant,
    NOT corpus-sized), a left join of buckets onto the grid, and a
    last(ignorenulls) forward fill.  The grid join and the fill window
    both key on user, so AQE/partitioning reuse keeps it at two user-keyed
    exchanges over BUCKET-level (not event-level) row counts.

    Value is carried as integer cents; steps as integer epoch divisions —
    both hash-stable across engines.
    """
    step_us = step_seconds * 1_000_000
    cents = F.round(F.col(value_col) * 100).cast("long")
    ev = events.select(
        F.col(user_col),
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(step_us)).alias("_step"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(id_col).alias("_id"),
        cents.alias("_cents"),
    )
    # last observation per bucket: argmax by (ts, id) — map-side combining
    buckets = ev.groupBy(user_col, "_step").agg(
        F.max(F.struct("_us", "_id", "_cents")).alias("_last")
    ).select(user_col, "_step", F.col("_last._cents").alias("_cents"))
    span = buckets.groupBy(user_col).agg(
        F.min("_step").alias("_lo"), F.max("_step").alias("_hi")
    )
    grid = span.select(
        F.col(user_col),
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_step"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("_step")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(buckets, [user_col, "_step"], "left")
        .select(
            F.col(user_col),
            F.col("_step").alias("step"),
            F.last("_cents", ignorenulls=True).over(w).alias("value_cents_ffill"),
            F.col("_cents").isNotNull().alias("observed"),
        )
    )


def attribute_conversions(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_seconds: int = 3600,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Marketing-style conversion attribution: for every conversion event,
    the LAST touch strictly before it (last-touch model, any age) and the
    FIRST touch inside the trailing ``lookback_seconds`` window ending just
    before it (first-touch-in-window model).  Either is NULL when no
    qualifying touch exists — an unattributed (organic) conversion, kept.

    Scale shape: touches and conversions stay ONE stream — no self-join.
    Both models are window functions over the SAME per-user
    orderBy(unix_micros) sort (one Exchange + one Sort total, the
    sequences-module invariant): last-touch is last(ignorenulls) over a
    rows frame ending at -1, first-touch is first(ignorenulls) over a
    range frame [-lookback_us, -1] — the range frame is why the order key
    must be the integer micros, not the timestamp.  Per-user fanout bounds
    every task; there is no corpus-sized state.

    Tie semantics: events sharing one (user, microsecond) tick are ordered
    arbitrarily within the frame — callers on real data with coarse clocks
    should pre-disambiguate (the testdata generator emits unique micros per
    user, asserted in tests)."""
    touch_id = F.when(F.col(type_col).isin(*touch_types), F.col(id_col))
    ev = events.select(
        F.col(id_col), F.col(user_col), F.col(type_col), F.col(ts_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        touch_id.alias("_touch_id"),
    )
    w = Window.partitionBy(user_col).orderBy("_us")
    lookback_us = int(lookback_seconds) * 1_000_000
    last_touch = F.last("_touch_id", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    first_touch = F.first("_touch_id", ignorenulls=True).over(
        w.rangeBetween(-lookback_us, -1)
    )
    return (
        ev.withColumn("last_touch_event_id", last_touch)
        .withColumn("first_touch_event_id", first_touch)
        .filter(F.col(type_col) == conversion_type)
        .select(
            F.col(id_col).alias("conversion_event_id"),
            user_col,
            F.col("_us").alias("conversion_us"),
            "first_touch_event_id",
            "last_touch_event_id",
        )
    )


def daily_value_anomalies(
    events: DataFrame,
    z_threshold: float = 3.0,
    min_group: int = 30,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Statistical anomaly detection over event values: flag events whose
    value sits more than ``z_threshold`` standard deviations from their
    (event_type, day) group mean — the metrics-monitoring pass that
    surfaces bad deploys, bot floods, and unit-change bugs in an event
    pipeline.

    Determinism contract: values are converted to exact integer micros
    FIRST, group sums run as DECIMAL(38,0) (exact at any corpus size — a
    double sum's partial-sum order is irreproducible, a long sum of
    squared micros overflows), and mean/variance/z are then derived in a
    PINNED double expression order from those exact sums, so the flagged
    set is bit-identical cross-engine.  The day key is integer epoch-day
    arithmetic (the engine-wide timezone rule).  Degenerate groups
    (n < min_group, or zero variance) flag nothing: z is NULL through the
    nullif guard, never an ANSI divide-by-zero.

    Scale shape: one (type, day)-keyed aggregate — tiny key space, partial
    agg collapses each partition — broadcast back onto the stream; the
    flag is then a map-side filter.  Nothing corpus-sized shuffles."""
    u = F.round(F.col(value_col) * 1_000_000).cast("long")
    day = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)).cast("int")
    base = events.select(
        F.col(id_col),
        F.col(type_col),
        day.alias("epoch_day"),
        u.alias("value_micros"),
    )
    stats = base.groupBy(type_col, "epoch_day").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value_micros").cast("decimal(38,0)")).alias("_s"),
        F.sum(
            (F.col("value_micros").cast("decimal(38,0)")
             * F.col("value_micros").cast("decimal(38,0)"))
        ).alias("_s2"),
    )
    n_d = F.col("_n").cast("double")
    s_d = F.col("_s").cast("double")
    s2_d = F.col("_s2").cast("double")
    mean = s_d / n_d
    var = (s2_d - (s_d * s_d) / n_d) / n_d
    std = F.sqrt(var)
    joined = base.join(F.broadcast(stats), [type_col, "epoch_day"])
    z = (F.col("value_micros").cast("double") - mean) / F.nullif(std, F.lit(0.0))
    return (
        joined.select(
            F.col(id_col),
            F.col(type_col),
            "epoch_day",
            "value_micros",
            F.when(F.col("_n") >= min_group, F.round(z, 6)).alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) > z_threshold)
    )


def running_value_anomalies(
    events: DataFrame,
    z_threshold: float = 3.0,
    min_prior: int = 30,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """ONLINE anomaly detection: each event is scored against the running
    mean/std of all PRIOR events of its type — the exact semantics an
    always-on monitor evaluates at arrival time, where daily_value_anomalies
    is the retrospective batch sweep (a spike inflates its own group's
    variance there; here it cannot, because scoring state is strictly
    causal).

    Same determinism contract as the daily variant: integer-micros values,
    exact DECIMAL(38,0) running sums over the prior-rows frame (frame SUM
    of decimals is order-independent because decimal addition is exact),
    pinned double derivation, NULL z below ``min_prior`` or at zero
    variance.

    Scale shape: one Exchange+Sort per event type (the sequences-module
    invariant — all three frame aggregates share it); state per row is
    three running sums, never a collected array."""
    u = F.round(F.col(value_col) * 1_000_000).cast("long")
    base = events.select(
        F.col(id_col),
        F.col(type_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        u.alias("value_micros"),
    )
    w = (
        Window.partitionBy(type_col)
        .orderBy("_us", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dec = F.col("value_micros").cast("decimal(38,0)")
    prior_n = F.count(F.lit(1)).over(w)
    prior_s = F.sum(dec).over(w)
    prior_s2 = F.sum(dec * dec).over(w)
    n_d = prior_n.cast("double")
    s_d = prior_s.cast("double")
    s2_d = prior_s2.cast("double")
    mean = s_d / n_d
    std = F.sqrt((s2_d - (s_d * s_d) / n_d) / n_d)
    z = (F.col("value_micros").cast("double") - mean) / F.nullif(std, F.lit(0.0))
    return (
        base.select(
            F.col(id_col),
            F.col(type_col),
            F.col("_us").alias("ts_epoch_us"),
            "value_micros",
            F.when(prior_n >= min_prior, F.round(z, 6)).alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) > z_threshold)
    )


def common_paths(
    events: DataFrame,
    depth: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k most common ``depth``-step event-type paths across users — the
    journey-mining view behind "what do users actually do" dashboards and
    funnel discovery (transition_counts is the depth-2 special case as a
    full matrix; this ranks longer concrete sequences).

    One per-user Exchange+Sort serves all ``depth-1`` leads (the module
    invariant); each event emits at most one path (the one it starts), so
    the path stream is corpus-sized, not corpus × depth; the count
    aggregate's key space is bounded by |types|^depth and collapses
    map-side.  Top-k is TakeOrdered with a path-string tiebreak."""
    if depth < 2:
        raise ValueError("depth must be >= 2")
    w = Window.partitionBy(user_col).orderBy(
        F.unix_micros(F.col(ts_col)), F.col(id_col)
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, depth)
    ]
    path = F.concat_ws(" > ", *steps)
    complete = steps[-1].isNotNull()
    return (
        events.select(F.when(complete, path).alias("path"))
        .filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.col("path").asc())
        .limit(k)
    )
