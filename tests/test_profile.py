"""profile.profile_table: per-column null/cardinality stats in one pass."""

import pytest

from bulkfhirloader_spark.operators import profile


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.5), (3, None, 1.5), (4, "b", None)],
        "id long, s string, v double",
    )
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in profile.profile_table(df).collect()
    }
    assert got == {
        "id": (4, 0, 4),
        "s": (4, 1, 2),
        "v": (4, 2, 1),
    }
    with pytest.raises(ValueError):
        profile.profile_table(df, cols=[])


def test_profile_approx_single_pass_no_expand(spark):
    """exact=False must swap count_distinct for HLL++ and drop the Expand
    operator from the plan (one pass, no n_cols row multiplication)."""
    df = spark.createDataFrame([(i, str(i % 7)) for i in range(100)], "id long, s string")
    approx = profile.profile_table(df, exact=False)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    got = {r["column"]: r for r in approx.collect()}
    # HLL++ at rsd=0.05 is exact at these tiny cardinalities
    assert got["s"]["n_distinct"] == 7
    assert got["id"]["n_rows"] == 100


def test_clip_outliers_bounds_and_flags(spark):
    """1..100 at [p10,p90]: DuckDB/Spark linear interpolation gives
    lo=10.9, hi=90.1; values outside clamp with flags; invalid band
    raises."""
    df = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
    got = {
        r["v"]: r
        for r in profile.clip_outliers(df, "v", 0.10, 0.90).collect()
    }
    r5, r50, r95 = got[5], got[50], got[95]
    assert abs(r50["lower_bound"] - 10.9) < 1e-9
    assert abs(r50["upper_bound"] - 90.1) < 1e-9
    assert r5["clipped"] == r5["lower_bound"] and r5["was_low"] and not r5["was_high"]
    assert r95["clipped"] == r95["upper_bound"] and r95["was_high"]
    assert r50["clipped"] == 50.0 and not r50["was_low"] and not r50["was_high"]
    with pytest.raises(ValueError):
        profile.clip_outliers(df, "v", 0.9, 0.1)


def test_histogram_constant_column_single_bin(spark):
    from bulkfhirloader_spark.operators.profile import histogram_equi_width

    df = spark.createDataFrame([(7.0,)] * 5, "x double")
    out = histogram_equi_width(df, "x", n_bins=4).collect()
    assert [(r.bin_idx, r.n) for r in out] == [(0, 5)]


def test_histogram_counts_and_edges(spark):
    from bulkfhirloader_spark.operators.profile import histogram_equi_width

    # 0..10 over 5 bins of width 2; the top edge (10.0) folds into bin 4
    df = spark.createDataFrame([(float(i),) for i in range(11)], "x double")
    got = {r.bin_idx: r.n for r in histogram_equi_width(df, "x", n_bins=5).collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 2, 4: 3}


def test_count_min_overestimates_and_bounds_state(spark):
    from bulkfhirloader_spark.operators.profile import count_min_heavy_hitters

    df = spark.createDataFrame(
        [(f"u{i % 7}",) for i in range(700)] + [("rare",)], "v string"
    )
    out = {r["value"]: r["est_count"]
           for r in count_min_heavy_hitters(df, "v", width=64, depth=4,
                                            min_estimate=1).collect()}
    # CMS never underestimates: each u* appears exactly 100 times
    for i in range(7):
        assert out[f"u{i}"] >= 100
    assert out["rare"] >= 1
    # threshold filters
    heavy = count_min_heavy_hitters(df, "v", width=64, depth=4, min_estimate=50)
    vals = {r["value"] for r in heavy.collect()}
    assert "rare" not in vals and vals >= {f"u{i}" for i in range(7)}


def test_misra_gries_candidates_superset_and_bounded(spark):
    """MG guarantee: every value with global count > N/(m+1) survives the
    per-partition pass, at O(m) state — the bounded candidate tier for the
    count-min probe.  Heavy values u0..u6 (100 each of 1000 rows) must all
    appear with m=16 regardless of partition layout; output is bounded by
    m x partitions."""
    from bulkfhirloader_spark.operators.profile import (
        count_min_heavy_hitters,
        misra_gries_candidates,
    )

    rows = [(f"u{i % 7}",) for i in range(700)] + [(f"tail{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, "v string").repartition(8)
    m = 16
    cands = misra_gries_candidates(df, "v", m=m)
    got = {r["value"] for r in cands.collect()}
    assert got >= {f"u{i}" for i in range(7)}  # superset of true heavy hitters
    assert len(got) <= m * 8  # bounded by m x partitions

    # bounded probe mode: estimates for the heavy values match the
    # exhaustive default path exactly (same sketch table, same hashes)
    full = {
        r["value"]: r["est_count"]
        for r in count_min_heavy_hitters(
            df, "v", width=64, depth=4, min_estimate=50
        ).collect()
    }
    probed = {
        r["value"]: r["est_count"]
        for r in count_min_heavy_hitters(
            df, "v", width=64, depth=4, min_estimate=50, candidates=cands
        ).collect()
    }
    # every true heavy hitter clears the bar in BOTH modes with the exact
    # same estimate (same sketch table, same hashes)
    for i in range(7):
        assert probed[f"u{i}"] == full[f"u{i}"]


def test_count_min_drops_unparseable_candidates(spark):
    """A candidate string that cannot cast to the profiled column's type
    must be DROPPED, not estimated: its cast-null would hash as the bare
    'i/seed' bucket and alias onto the column's genuine NULL rows,
    reporting the NULL count as the bogus candidate's estimate (r7
    advisor).  A genuinely-NULL candidate still probes the NULL bucket."""
    from bulkfhirloader_spark.operators.profile import count_min_heavy_hitters

    df = spark.createDataFrame(
        [(7,)] * 50 + [(None,)] * 30 + [(9,)] * 5, "v int"
    )
    cands = spark.createDataFrame(
        [("7",), ("not-a-number",), (None,)], "value string"
    )
    out = {
        r["value"]: r["est_count"]
        for r in count_min_heavy_hitters(
            df, "v", width=64, depth=4, min_estimate=1, candidates=cands
        ).collect()
    }
    assert out[7] >= 50
    # unparseable candidate gone entirely; NULL candidate probes NULLs
    assert set(out) == {7, None}
    assert out[None] >= 30
