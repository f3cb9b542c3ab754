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
