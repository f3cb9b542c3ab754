"""SURVEY §4.3 gotcha matrix for the three stats pipelines (db.go:79-358).

The rawstat fixture (conftest.py) plants every edge row; expectations are
hand-computed to match the reference's semantics.
"""

from __future__ import annotations

from bulkfhirloader_spark.operators import stats


def _by_key(rows, *keys):
    return {tuple(r[k] for k in keys): r for r in rows}


def test_population_facts_gotchas(rawstat):
    rows = stats.population_facts(rawstat).collect()
    by = _by_key(rows, "cs_fips")

    # deceased p3 excluded: Acton pop = p1,p2,p5,p6,p7 = 5
    acton = by[("00100",)]
    assert acton["pop"] == 5
    # male: p1, p7 (p5 'other' and p6 NULL count in neither flag)
    assert acton["pop_male"] == 2
    assert acton["pop_female"] == 1

    # unknown city row survives under empty-string FIPS (§4.3 #4)
    atlantis = by[("",)]
    assert atlantis["pop"] == 1 and atlantis["pop_female"] == 1

    # agerange hard-coded 1 (§4.3 #1)
    assert {r["age_id"] for r in rows} == {1}


def test_disease_facts_gotchas(rawstat):
    rows = stats.disease_facts(rawstat).collect()
    by = _by_key(rows, "cs_fips", "disease_id")

    # -999 (null disease) and 0 (untracked) never appear (§4.3 #5)
    assert all(r["disease_id"] > 0 for r in rows)

    # disease 5: alive p1, p2, p5, p7 (p3 deceased) -> pop 4, male p1+p7
    d5 = by[("00100", 5)]
    assert d5["pop"] == 4 and d5["pop_male"] == 2 and d5["pop_female"] == 1
    # disease 6 only p2
    d6 = by[("00100", 6)]
    assert d6["pop"] == 1 and d6["pop_female"] == 1
    # unknown-city patient's disease 7 kept under '' fips
    assert by[("", 7)]["pop"] == 1


def test_condition_facts_gotchas(rawstat):
    rows = stats.condition_facts(rawstat).collect()
    assert all(r["condition_id"] > 0 for r in rows)
    by = _by_key(rows, "cs_fips", "condition_id")
    # condition 11: p1, p2, p5, p7 alive -> 4
    assert by[("00100", 11)]["pop"] == 4
    # condition 12 only p2; 13 only p4 (unknown city)
    assert by[("00100", 12)]["pop"] == 1
    assert by[("", 13)]["pop"] == 1


def test_population_facts_binned(rawstat):
    rows = stats.population_facts_binned(rawstat).collect()
    # p2 age 61 -> bin 6; p4 age 20 -> bin 2
    by = _by_key(rows, "cs_fips", "age_id")
    assert by[("00100", 6)]["pop"] == 1
    assert by[("", 2)]["pop"] == 1


def test_salted_join_equals_plain_join(spark):
    """Every matching pair must meet exactly once (left salt is a single
    value; right exists under all salts), including duplicate keys on both
    sides; left-outer keeps unmatched left rows; right/outer is refused."""
    import pytest as _pytest

    from bulkfhirloader_spark.operators import skew

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "zz")], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(1, "X"), (1, "Y"), (2, "Z")], "k long, rv string"
    )
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in skew.salted_join(left, right, on="k", num_salts=8).collect()
    )
    want = sorted(
        (r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect()
    )
    assert got == want

    got_left = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in skew.salted_join(left, right, on="k", num_salts=8, how="left").collect()
    )
    want_left = sorted(
        (r["k"], r["lv"], r["rv"]) for r in left.join(right, "k", "left").collect()
    )
    assert got_left == want_left

    with _pytest.raises(ValueError):
        skew.salted_join(left, right, on="k", how="right")
