"""Semantics + plan-shape tests for operators.sequences (user-journey
analytics): funnel, retention cohorts, transitions, rolling windows, and
latest-per-key compaction.  Registry oracle rows cover the hash-exact
comparison against DuckDB; these tests pin the semantics on hand-built
fixtures (where expected values are human-checkable) and the plan
properties that matter at scale (one Exchange for the whole funnel,
map-side-combinable argmax for latest_per_key)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from bulkfhirloader_spark.operators import sequences


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture()
def tiny_events(spark):
    rows = [
        # user 1: full ordered funnel signup(1) -> click(3) -> purchase(5)
        (1, _ts(1), 1, "signup", 10.0),
        (2, _ts(3), 1, "click", 20.0),
        (3, _ts(5), 1, "purchase", 30.0),
        # user 2: purchase BEFORE click -> only reaches step 1
        (4, _ts(1), 2, "signup", 5.0),
        (5, _ts(2), 2, "purchase", 5.0),
        (6, _ts(4), 2, "click", 5.0),
        # user 3: never signs up -> reaches no step
        (7, _ts(1), 3, "click", 1.0),
        (8, _ts(2), 3, "purchase", 1.0),
        # user 4: signup and click at the SAME timestamp -> strict
        # ordering means the tied click does not count, the later one does
        (9, _ts(1), 4, "signup", 2.0),
        (10, _ts(1), 4, "click", 2.0),
        (11, _ts(2), 4, "click", 2.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_funnel_ordered_semantics(tiny_events):
    out = {
        r.step_name: r.n_users
        for r in sequences.funnel_counts(
            tiny_events, ["signup", "click", "purchase"]
        ).collect()
    }
    # signup: users 1,2,4.  click-after-signup: 1 (m3), 2 (m4), 4 (m2 —
    # the m1 click ties the signup and strict > excludes it, the m2 click
    # counts).  purchase-after-click: only user 1 (user 2's purchase
    # precedes their click; user 4 never purchases).
    assert out == {"signup": 3, "click": 3, "purchase": 1}


def test_funnel_single_exchange_for_all_steps(spark, tiny_events):
    """The K chained running-min Window operators (each step depends on the
    previous one's output, so they cannot fuse into one Window) must still
    share a single Exchange(hashpartitioning(user_id)) + single Sort; the
    per-user collapse reuses the partitioning, and the only other exchange
    is the tiny SinglePartition one into the final count agg."""
    plan = (
        sequences.funnel_counts(tiny_events, ["signup", "click", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning") == 1, plan
    assert plan.count("Sort [") == 1, plan
    assert plan.count("Exchange") == 2, plan  # user hash + SinglePartition


def test_retention_cohorts_offsets(spark):
    week = 604_800
    base = dt.datetime(2024, 1, 4)  # inside epoch-week W
    rows = [
        (1, base, 1, "view", 0.0),
        (2, base + dt.timedelta(seconds=week), 1, "view", 0.0),   # W+1
        (3, base + dt.timedelta(seconds=3 * week), 1, "view", 0.0),  # W+3
        (4, base + dt.timedelta(seconds=week), 2, "view", 0.0),   # cohort W+1
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = sequences.retention_cohorts(ev)
    got = {(r.cohort_period, r.period_offset): r.n_users for r in out.collect()}
    cohorts = {c for c, _ in got}
    assert len(cohorts) == 2
    w = min(cohorts)
    assert got[(w, 0)] == 1 and got[(w, 1)] == 1 and got[(w, 3)] == 1
    assert got[(w + 1, 0)] == 1
    assert (w, 2) not in got


def test_transition_counts(tiny_events):
    out = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in sequences.transition_counts(tiny_events).collect()
    }
    # user1: s->c, c->p; user2: s->p, p->c; user3: c->p;
    # user4 (tie broken by event_id): s->c, c->c
    assert out[("signup", "click")] == 2
    assert out[("click", "purchase")] == 2
    assert out[("signup", "purchase")] == 1
    assert out[("purchase", "click")] == 1
    assert out[("click", "click")] == 1
    assert sum(out.values()) == 7


def test_rolling_window_stats(tiny_events):
    out = {
        r.event_id: (r.window_value_cents, r.window_n)
        for r in sequences.rolling_window_stats(tiny_events, n_preceding=2).collect()
    }
    # user 1 values 10, 20, 30 -> cents 1000, 3000, 6000 over trailing 3
    assert out[1] == (1000, 1)
    assert out[2] == (3000, 2)
    assert out[3] == (6000, 3)
    # user 3: 1.0 then 1.0
    assert out[8] == (200, 2)


def test_latest_per_key_argmax_and_plan(spark, tiny_events):
    ev = tiny_events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    out = sequences.latest_per_key(
        ev, ["user_id"], ["ts_us", "event_id"], ["event_type"]
    )
    got = {r.user_id: (r.event_id, r.event_type) for r in out.collect()}
    assert got[1] == (3, "purchase")
    assert got[2] == (6, "click")
    assert got[4] == (11, "click")  # ts tie at m1 irrelevant; m2 click wins
    plan = out._jdf.queryExecution().executedPlan().toString()
    # struct-max aggregates map-side (partial_max below the Exchange, so
    # one candidate row per key per partition crosses the wire) and never
    # plans a Window — the row_number formulation would
    assert "Window" not in plan, plan
    assert "partial_max" in plan, plan
    assert plan.index("partial_max") > plan.index("Exchange"), (
        "partial_max must appear below (after, in toString order) the "
        "Exchange — i.e. evaluated before it\n" + plan
    )


def test_resample_forward_fill_gaps(spark):
    import datetime as dt

    rows = [
        # user 1: days 0 and 3 observed -> days 1, 2 filled with day 0's value
        (1, dt.datetime(2024, 1, 1, 5), 1, "view", 1.50),
        (2, dt.datetime(2024, 1, 1, 9), 1, "view", 2.00),  # later same day wins
        (3, dt.datetime(2024, 1, 4, 1), 1, "view", 9.00),
        # user 2: single day
        (4, dt.datetime(2024, 1, 2, 0), 2, "view", 4.25),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = sequences.resample_forward_fill(ev, step_seconds=86_400)
    got = {
        (r.user_id, r.step): (r.value_cents_ffill, r.observed)
        for r in out.collect()
    }
    base = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000) // 86_400_000_000
    assert got[(1, base)] == (200, True)       # last same-day event wins
    assert got[(1, base + 1)] == (200, False)  # gap filled
    assert got[(1, base + 2)] == (200, False)
    assert got[(1, base + 3)] == (900, True)
    assert got[(2, base + 1)] == (425, True)
    assert len(got) == 5


def test_attribution_models_and_single_sort(spark):
    import datetime as dt

    from bulkfhirloader_spark.operators.sequences import attribute_conversions

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    events = spark.createDataFrame(
        [
            # user 1: click(-5000s), view(-2000s), purchase(0): last=view,
            # first-in-1h-window=view (click is outside the 3600s lookback)
            (1, s(-5000), 1, "click", 0.0),
            (2, s(-2000), 1, "view", 0.0),
            (3, s(0), 1, "purchase", 9.9),
            # user 1 second purchase at +100s: last=view(id 2); window now
            # also contains only id 2 (purchases are not touches)
            (4, s(100), 1, "purchase", 1.0),
            # user 2: organic purchase — both models NULL
            (5, s(0), 2, "purchase", 5.0),
            # user 3: touch AFTER the conversion attributes nothing
            (6, s(10), 3, "click", 0.0),
            (7, s(0), 3, "purchase", 2.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r["conversion_event_id"]: r for r in attribute_conversions(events).collect()}
    assert out[3]["last_touch_event_id"] == 2
    assert out[3]["first_touch_event_id"] == 2
    assert out[4]["last_touch_event_id"] == 2
    assert out[4]["first_touch_event_id"] == 2
    assert out[5]["last_touch_event_id"] is None
    assert out[5]["first_touch_event_id"] is None
    assert out[7]["last_touch_event_id"] is None
    # both window models share ONE Exchange + ONE Sort (the module invariant)
    plan = attribute_conversions(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") <= 2, plan  # one sort op (string appears once per line)


def test_attribution_testdata_micros_are_unique_per_user(spark):
    """The arbitrary-tie caveat in attribute_conversions is vacuous on the
    shipped testdata: (user, microsecond) is unique.  If a regeneration
    breaks this, the attribution oracle could hash-flip — fail here
    instead."""
    from bulkfhirloader_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    dup = (
        ev.groupBy("user_id", F.unix_micros("ts"))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_daily_anomalies_flags_planted_spike(spark):
    import datetime as dt

    from bulkfhirloader_spark.operators.sequences import daily_value_anomalies

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "view", 10.0 + (i % 5) * 0.1)
        for i in range(40)
    ]
    rows.append((99, t0 + dt.timedelta(minutes=50), 1, "view", 500.0))  # spike
    # a tiny group (n < min_group) with a wild value must flag NOTHING
    rows.append((100, t0, 1, "purchase", 9999.0))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = daily_value_anomalies(events, z_threshold=3.0, min_group=30).collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["z_score"] > 3.0


def test_running_anomalies_are_strictly_causal(spark):
    """The spike must be flagged against PRIOR stats only — and must not
    poison the scoring of later normal events (contrast the daily batch
    sweep, where a spike inflates its own group's variance)."""
    import datetime as dt

    from bulkfhirloader_spark.operators.sequences import running_value_anomalies

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "view", 10.0 + (i % 5) * 0.1)
        for i in range(40)
    ]
    rows.append((99, t0 + dt.timedelta(minutes=50), 1, "view", 500.0))
    rows += [
        (200 + i, t0 + dt.timedelta(minutes=60 + i), 1, "view", 10.0 + (i % 5) * 0.1)
        for i in range(10)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = running_value_anomalies(events, z_threshold=3.0, min_prior=30).collect()
    assert [r["event_id"] for r in out] == [99]


def test_common_paths_single_sort_and_counts(spark):
    import datetime as dt

    from bulkfhirloader_spark.operators.sequences import common_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(3):  # 3 users repeat view>click>purchase then view>view>view
        for seq in (["view", "click", "purchase"], ["view", "view", "view"]):
            for s in seq:
                rows.append((eid, t0 + dt.timedelta(minutes=eid), u, s, 0.0))
                eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r["path"]: r["n_paths"] for r in common_paths(events, depth=3, k=10).collect()}
    assert got["view > click > purchase"] == 3
    assert got["view > view > view"] == 3
    # paths spanning the two planted sequences also count (windows slide)
    assert got["click > purchase > view"] == 3
    plan = common_paths(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan  # user hash + the tiny path count
