"""F1–F10 scalar-function edge cases (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bulkfhirloader_spark.functions import scalars as S


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_f1_strip_suffix(spark):
    df = spark.createDataFrame(
        [("Acton Town",), ("Boston",), (" Town",), ("Townsend",)], ["cs_name"]
    )
    got = [
        r["v"]
        for r in df.select(
            S.strip_suffix_case(F.col("cs_name"), " Town").alias("v")
        ).collect()
    ]
    assert got == ["Acton", "Boston", "", "Townsend"]


def test_f2_null_default(spark):
    df = spark.createDataFrame([(None,), (7,)], "disease_id int")
    got = [
        r["v"]
        for r in df.select(
            S.null_default(F.col("disease_id"), S.NULL_DISEASE_ID).alias("v")
        ).collect()
    ]
    assert got == [-999, 7]


def test_f3_age_birthday_boundary(spark):
    df = spark.createDataFrame(
        [("1990-06-15",), ("1990-06-16",), ("1990-06-14",), ("2000-02-29",)],
        ["bd"],
    )
    as_of = F.lit("2020-06-15").cast("date")
    got = [
        r["v"]
        for r in df.select(
            S.age_years(F.to_date("bd"), as_of).alias("v")
        ).collect()
    ]
    # birthday today => full year counts; tomorrow => not yet
    assert got == [30, 29, 30, 20]


def test_f3_age_exhaustive_edge_grid(spark):
    """age_years vs an independently re-derived forward loop of the
    reference's semantics (bundle.go:54-60: completed years = how many
    whole years fit between birth and as-of, with Feb-29 anniversaries
    normalizing forward to Mar-1 in non-leap years, Go AddDate-style) —
    over every tricky (birth, as_of) combination in one Spark job."""
    import datetime as dt
    import itertools

    def completed_years(b: dt.date, a: dt.date) -> int:
        n = 0
        while True:
            y = b.year + n + 1
            try:
                anniversary = b.replace(year=y)
            except ValueError:  # Feb 29 in a non-leap year -> Mar 1
                anniversary = dt.date(y, 3, 1)
            if anniversary > a:
                return n
            n += 1

    births = [
        dt.date(2000, 2, 29), dt.date(1999, 2, 28), dt.date(1999, 3, 1),
        dt.date(1996, 12, 31), dt.date(1997, 1, 1), dt.date(1998, 6, 15),
        dt.date(2000, 1, 31), dt.date(2001, 4, 30),
    ]
    as_ofs = [
        dt.date(2003, 2, 28), dt.date(2003, 3, 1), dt.date(2004, 2, 28),
        dt.date(2004, 2, 29), dt.date(2004, 3, 1), dt.date(2020, 1, 1),
        dt.date(2020, 12, 31), dt.date(2001, 6, 15), dt.date(2001, 6, 14),
        dt.date(2001, 6, 16),
    ]
    pairs = [(b, a) for b, a in itertools.product(births, as_ofs) if a >= b]
    df = spark.createDataFrame(pairs, "birth date, as_of date")
    got = {
        (r["birth"], r["as_of"]): r["age"]
        for r in df.select(
            "birth", "as_of",
            S.age_years(F.col("birth"), F.col("as_of")).alias("age"),
        ).collect()
    }
    mismatches = {
        (b, a): (got[(b, a)], completed_years(b, a))
        for b, a in pairs
        if got[(b, a)] != completed_years(b, a)
    }
    assert not mismatches, mismatches


def test_f4_deceased_tristate(spark):
    df = spark.createDataFrame(
        [
            (None, None),        # absent both -> alive
            (None, False),       # explicit false -> alive
            (None, True),        # boolean true -> deceased
            ("2019-01-01", None) # datetime only -> deceased (bundle.go:91)
        ],
        "dt string, db boolean",
    )
    got = [
        r["v"]
        for r in df.select(
            S.is_deceased(F.to_timestamp("dt"), F.col("db")).alias("v")
        ).collect()
    ]
    assert got == [False, False, True, True]


def test_p1_alive_filter(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", False), ("c", True)], "id string, db boolean"
    )
    got = sorted(
        r["id"] for r in df.filter(S.alive_filter(F.col("db"))).collect()
    )
    assert got == ["a", "b"]


def test_f5_gender_flag_nonbinary(spark):
    df = spark.createDataFrame(
        [("male",), ("female",), ("other",), (None,)], ["g"]
    )
    got = [
        (r["m"], r["f"])
        for r in df.select(
            S.gender_flag(F.col("g"), "male").alias("m"),
            S.gender_flag(F.col("g"), "female").alias("f"),
        ).collect()
    ]
    assert got == [(1, 0), (0, 1), (0, 0), (0, 0)]


def test_f6_first_element_empty_and_null(spark):
    df = spark.createDataFrame(
        [(["Acton", "Boston"],), ([],), (None,)], "cities array<string>"
    )
    got = [r["v"] for r in df.select(S.first_element(F.col("cities")).alias("v")).collect()]
    assert got == ["Acton", None, None]


def test_f7_collection_names(spark):
    cases = {
        "Patient": "patients",
        "Condition": "conditions",
        "Observation": "observations",
        "DiagnosticReport": "diagnosticreports",
        "MedicationRequest": "medicationrequests",
        "AllergyIntolerance": "allergyintolerances",
        "Encounter": "encounters",
    }
    df = spark.createDataFrame([(k,) for k in cases], ["t"])
    got = {
        r["t"]: r["v"]
        for r in df.select("t", S.collection_name(F.col("t")).alias("v")).collect()
    }
    assert got == cases


def test_f8_deterministic_id(spark):
    v1 = _one(spark, S.deterministic_id(F.lit("b1"), F.lit("urn:uuid:x")))
    v2 = _one(spark, S.deterministic_id(F.lit("b1"), F.lit("urn:uuid:x")))
    v3 = _one(spark, S.deterministic_id(F.lit("b2"), F.lit("urn:uuid:x")))
    assert v1 == v2 and v1 != v3 and len(v1) == 64


def test_f9_f10_reference_roundtrip(spark):
    assert _one(spark, S.strip_cid_prefix(F.lit("cid:abc"))) == "abc"
    assert _one(spark, S.strip_cid_prefix(F.lit("Patient/abc"))) == "Patient/abc"
    assert _one(spark, S.make_reference(F.lit("Patient"), F.lit("42"))) == "Patient/42"


def test_money_cents_exact(spark):
    df = spark.createDataFrame([(19.99,), (0.01,), (123456.78,)], ["p"])
    got = [r["v"] for r in df.select(S.money_cents(F.col("p")).alias("v")).collect()]
    assert got == [1999, 1, 12345678]
