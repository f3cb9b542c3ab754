"""The reference's three statistics pipelines (db.go:79-358), re-expressed
as DataFrame programs over a rawstat-schema DataFrame.

Each MQL stage maps 1:1 onto a Catalyst logical operator:
$match → Filter, $unwind → Generate(explode), $project → Project,
$group/$sum → Aggregate — so Catalyst gets full freedom to push filters
below the explode and prune columns into the scan.

Correctness gotchas preserved deliberately (SURVEY §4.3):
- alive = deceasedboolean missing-or-false (db.go:93-98) → NULL-coalescing.
- agerange is the hard-coded constant 1 from bundle.go:90; group keys use it
  verbatim.  ``population_facts_binned`` is the clearly-named "obviously
  intended" variant with real age buckets.
- unwind of uniquediseases/uniqueconditions then `> 0` filter drops
  untracked (0) and null-disease (−999) ids (db.go:192, db.go:287).
- a patient is counted once per distinct disease/condition because the
  unwound arrays are already distinct sets (bundle.go:24-51; doc comments
  db.go:169-170).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bulkfhirloader_spark.functions.scalars import alive_filter, gender_flag


def _alive(rawstat: DataFrame) -> DataFrame:
    return rawstat.filter(alive_filter(F.col("deceasedboolean")))


def _flags(df: DataFrame) -> DataFrame:
    return df.withColumn("male", gender_flag(F.col("gender"), "male")).withColumn(
        "female", gender_flag(F.col("gender"), "female")
    )


def population_facts(rawstat: DataFrame) -> DataFrame:
    """db.go:79-167: $match alive → $project flags → $group (cs_fips, agerange)."""
    return (
        _flags(_alive(rawstat))
        .select(
            F.col("location.subcountyid_fips").alias("cs_fips"),
            F.col("agerange").alias("age_id"),
            "male",
            "female",
        )
        .groupBy("cs_fips", "age_id")
        .agg(
            F.count(F.lit(1)).alias("pop"),
            F.sum("male").cast("long").alias("pop_male"),
            F.sum("female").cast("long").alias("pop_female"),
        )
    )


def disease_facts(rawstat: DataFrame) -> DataFrame:
    """db.go:171-262: $match alive → $unwind uniquediseases → $match > 0 →
    $project flags → $group (cs_fips, disease_id, agerange)."""
    return (
        _flags(_alive(rawstat))
        .select(
            F.col("location.subcountyid_fips").alias("cs_fips"),
            F.explode("uniquediseases").alias("disease_id"),
            F.col("agerange").alias("age_id"),
            "male",
            "female",
        )
        .filter(F.col("disease_id") > 0)
        .groupBy("cs_fips", "disease_id", "age_id")
        .agg(
            F.count(F.lit(1)).alias("pop"),
            F.sum("male").cast("long").alias("pop_male"),
            F.sum("female").cast("long").alias("pop_female"),
        )
    )


def condition_facts(rawstat: DataFrame) -> DataFrame:
    """db.go:266-358: same shape keyed on uniqueconditions."""
    return (
        _flags(_alive(rawstat))
        .select(
            F.col("location.subcountyid_fips").alias("cs_fips"),
            F.explode("uniqueconditions").alias("condition_id"),
            F.col("agerange").alias("age_id"),
            "male",
            "female",
        )
        .filter(F.col("condition_id") > 0)
        .groupBy("cs_fips", "condition_id", "age_id")
        .agg(
            F.count(F.lit(1)).alias("pop"),
            F.sum("male").cast("long").alias("pop_male"),
            F.sum("female").cast("long").alias("pop_female"),
        )
    )


def population_facts_binned(rawstat: DataFrame, bin_years: int = 10) -> DataFrame:
    """The obviously-intended variant of population_facts: age_id from real
    age deciles instead of the reference's hard-coded 1 (bundle.go:89-90
    computes Age then ignores it)."""
    return (
        _flags(_alive(rawstat))
        .select(
            F.col("location.subcountyid_fips").alias("cs_fips"),
            (F.floor(F.col("age") / bin_years)).cast("int").alias("age_id"),
            "male",
            "female",
        )
        .groupBy("cs_fips", "age_id")
        .agg(
            F.count(F.lit(1)).alias("pop"),
            F.sum("male").cast("long").alias("pop_male"),
            F.sum("female").cast("long").alias("pop_female"),
        )
    )
