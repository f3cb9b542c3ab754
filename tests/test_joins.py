"""As-of and binned range join: semantics on hand-built edge cases plus
physical-plan assertions (the whole point of these formulations is the plan
shape that survives 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bulkfhirloader_spark.operators import joins


def _left(spark):
    # (key, ts, tag) — includes a key with no right rows at all
    return spark.createDataFrame(
        [
            (1, 100, "a"),
            (1, 200, "b"),
            (1, 50, "before_any"),
            (2, 100, "equal_ts"),
            (3, 100, "no_right_key"),
        ],
        "k int, ts long, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (1, 90, 9.0),
            (1, 150, 15.0),
            (2, 100, 42.0),  # same-ts row must match (at-or-before)
        ],
        "k int, ts long, v double",
    )


def test_asof_backward_semantics(spark):
    out = joins.asof_join(_left(spark), _right(spark), on="k", value_cols=["v"])
    got = {r["tag"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    assert got["a"] == (90, 9.0)  # latest right at-or-before 100
    assert got["b"] == (150, 15.0)  # skips older right rows
    assert got["before_any"] == (None, None)  # left-outer: no match -> NULL
    assert got["equal_ts"] == (100, 42.0)  # ts equality matches
    assert got["no_right_key"] == (None, None)
    assert out.count() == 5  # every left row survives exactly once


def test_asof_plan_has_no_join(spark):
    """The union+window formulation must plan ZERO join operators — one
    exchange on the key and one sort.  A BroadcastNestedLoopJoin here would
    be the quadratic formulation this operator exists to avoid."""
    out = joins.asof_join(_left(spark), _right(spark), on="k", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_binned_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 100, 400, "w1"), (1, 400, 400, "empty"), (2, 0, 1000, "w2")],
        "k int, lo long, hi long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 99), (1, 100), (1, 399), (1, 400), (2, 500), (3, 500)],
        "k int, pt long",
    )
    out = joins.range_join_binned(
        left,
        right,
        on="k",
        left_lo=F.col("lo"),
        left_hi=F.col("hi"),
        right_point=F.col("pt"),
        bin_width=100,
    )
    rows = [(r["tag"], r["pt"]) for r in out.collect()]
    # half-open [lo, hi): 100 and 399 in, 99 and 400 out; empty interval
    # produces nothing; key isolation holds
    assert sorted(rows) == [("w1", 100), ("w1", 399), ("w2", 500)]


def test_range_join_binned_no_duplicate_pairs(spark):
    """A right point falls in exactly one bin -> each qualifying pair
    appears exactly once even when the left interval spans many bins."""
    left = spark.createDataFrame([(1, 0, 1000, "wide")], "k int, lo long, hi long, tag string")
    right = spark.createDataFrame([(1, 5), (1, 500), (1, 999)], "k int, pt long")
    out = joins.range_join_binned(
        left, right, on="k",
        left_lo=F.col("lo"), left_hi=F.col("hi"), right_point=F.col("pt"),
        bin_width=100,
    )
    assert out.count() == 3
    assert out.distinct().count() == 3


def test_range_join_binned_plan_is_equi_join(spark):
    """The bin trick must reach Catalyst as an EQUI join (hashable keys),
    not a cartesian/nested-loop theta join."""
    left = spark.createDataFrame([(1, 0, 300, "x")], "k int, lo long, hi long, tag string")
    right = spark.createDataFrame([(1, 5)], "k int, pt long")
    out = joins.range_join_binned(
        left, right, on="k",
        left_lo=F.col("lo"), left_hi=F.col("hi"), right_point=F.col("pt"),
        bin_width=300,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


class TestAsofProperty:
    """Hypothesis property: asof_join equals the obvious per-row python
    computation on arbitrary small inputs."""

    from hypothesis import given, settings, strategies as st

    @staticmethod
    def _expected(left_rows, right_rows):
        out = {}
        for (k, lt) in left_rows:
            prior = [(rt, v) for (rk, rt, v) in right_rows if rk == k and rt <= lt]
            out[(k, lt)] = max(prior)[1] if prior else None
        return out

    @given(
        left=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50)),
            min_size=1, max_size=12, unique=True,
        ),
        right=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-5, 5)),
            min_size=0, max_size=12, unique_by=lambda r: (r[0], r[1]),
        ),
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_per_row_semantics(self, spark_session_holder, left, right):
        spark = spark_session_holder[0]
        ldf = spark.createDataFrame(left, "k int, ts long")
        rdf = spark.createDataFrame(
            right, "k int, ts long, v int"
        ) if right else spark.createDataFrame([], "k int, ts long, v int")
        got = {
            (r["k"], r["ts"]): r["asof_v"]
            for r in joins.asof_join(ldf, rdf, on="k", value_cols=["v"]).collect()
        }
        assert got == self._expected(left, right)


@pytest.fixture(scope="session")
def spark_session_holder(spark):
    # hypothesis forbids function-scoped fixtures inside @given; hand it the
    # session-scoped spark via a stable holder
    return [spark]


def test_bloom_semi_join_equals_plain_semi_join(spark):
    """Output must be EXACTLY the plain semi join (false positives are
    verified away); probe rows with keys absent from the build side are
    gone; bad params raise."""
    from bulkfhirloader_spark.operators import joins

    probe = spark.createDataFrame(
        [(k, k * 10) for k in range(200)], "k long, v long"
    )
    build = spark.createDataFrame(
        [(k,) for k in range(0, 200, 3)], "k long"
    )
    got = sorted(
        (r["k"], r["v"])
        for r in joins.bloom_semi_join(probe, build, on="k", n_bits=256).collect()
    )
    assert got == [(k, k * 10) for k in range(0, 200, 3)]
    import pytest as _pt

    with _pt.raises(ValueError):
        joins.bloom_semi_join(probe, build, on="k", n_bits=100)
    with _pt.raises(ValueError):
        joins.bloom_semi_join(probe, build, on="k", n_hashes=0)


def test_bloom_prefilter_actually_prunes(spark):
    """With a tight filter (few build keys, many bits) the bloom candidate
    set should be close to the true match count — count candidates by
    running only the prefilter stage (n_hashes high, verify disabled by
    comparing candidate count bounds)."""
    from bulkfhirloader_spark.operators import joins

    probe = spark.createDataFrame([(k,) for k in range(2000)], "k long")
    build = spark.createDataFrame([(7,), (1999,)], "k long")
    out = joins.bloom_semi_join(probe, build, on="k", n_bits=1 << 14)
    assert sorted(r["k"] for r in out.collect()) == [7, 1999]


def test_asof_forward_semantics(spark):
    from bulkfhirloader_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (2, 5)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 1, "d")],
        "k long, ts long, v string",
    )
    out = {
        (r.k, r.ts): (r.asof_ts, r.asof_v)
        for r in asof_join(
            left, right, on="k", direction="forward"
        ).collect()
    }
    # at-or-after: ts=10 matches the equal-ts right row, not the next one
    assert out[(1, 10)] == (10, "a")
    assert out[(1, 25)] == (30, "c")
    # no right row at-or-after ts=5 for k=2 except ts=1? 1 < 5 -> no match
    assert out[(2, 5)] == (None, None)


def test_asof_direction_validation(spark):
    import pytest as _pytest

    from bulkfhirloader_spark.operators.joins import asof_join

    df = spark.range(1)
    with _pytest.raises(ValueError):
        asof_join(df, df, on="id", direction="nearest")
