"""Scalar column functions — the reference's §2.7 inventory (F1–F10).

Every helper compiles to built-in Catalyst expressions (no Python UDFs), so
the hot path stays inside whole-stage codegen at any scale.  Reference
citations point into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel for "tracked condition with no disease mapping"
# (coalesce(disease_id, -999), main.go:174).
NULL_DISEASE_ID = -999


def strip_suffix_case(col: Column, suffix: str) -> Column:
    """F1 — the dim loader's CASE: strip a literal suffix if present
    (main.go:140-142 strips ' Town' from cs_name)."""
    n = len(suffix)
    return F.when(
        F.right(col, F.lit(n)) == suffix,
        F.substring(col, 1, F.length(col) - n),
    ).otherwise(col)


def null_default(col: Column, default) -> Column:
    """F2 — coalesce(x, default) (main.go:174)."""
    return F.coalesce(col, F.lit(default))


def age_years(birthdate: Column, as_of: Column) -> Column:
    """F3 — completed years of age at ``as_of``: year difference minus one
    if the birthday hasn't occurred yet.  The explicit month/day comparison
    matches the reference's strict whole-year-subtraction loop
    (bundle.go:54-60) on leap-day and exact-anniversary edges where
    months_between's engine-specific rules differ (Feb-29 birth at a Feb-28
    as-of is 0 completed years here and in the reference, 1 under
    months_between/12).  This one implementation is shared by ingest and
    the oracle-checked registry F3 so the two can never diverge.

    ``as_of`` must be a pinned literal date in tests so results are
    deterministic (never current_date in the oracle-checked paths).
    """
    before_birthday = (
        F.month(as_of) * 100 + F.dayofmonth(as_of)
        < F.month(birthdate) * 100 + F.dayofmonth(birthdate)
    )
    return (
        F.year(as_of) - F.year(birthdate) - F.when(before_birthday, 1).otherwise(0)
    ).cast("int")


def is_deceased(deceased_datetime: Column, deceased_boolean: Column) -> Column:
    """F4 — deceased tri-state → bool (bundle.go:91):
    DeceasedDateTime set OR DeceasedBoolean true; Mongo-absent ⇒ NULL ⇒ false.
    """
    return deceased_datetime.isNotNull() | F.coalesce(
        deceased_boolean, F.lit(False)
    )


def alive_filter(deceased_boolean: Column) -> Column:
    """P1 — the $match shared by all three stats pipelines (db.go:93-98):
    keep rows where deceasedboolean is missing OR false."""
    return ~F.coalesce(deceased_boolean, F.lit(False))


def gender_flag(gender: Column, value: str) -> Column:
    """F5 — $cond 0/1 flag (db.go:105-114).  Genders other than
    male/female contribute to pop but to neither flag (SURVEY §4.3 #7)."""
    return F.when(gender == value, F.lit(1)).otherwise(F.lit(0))


def first_element(col: Column) -> Column:
    """F6 — first-element-only access (Address[0], Coding[0];
    bundle.go:92, bundle.go:102).  try_element_at returns NULL for
    empty/NULL arrays — plain element_at THROWS on empty arrays under
    Spark 4's default ANSI mode, which would let one address-less patient
    kill a full ingest.

    DELIBERATE DEVIATION from the reference: bundle.go:92 indexes
    p.Address[0] unguarded, so a Patient with an empty (non-nil) address
    array PANICS the whole loader there; here it degrades to NULL city/zip
    -> ''-FIPS location, i.e. the same bucket as an unknown city (SURVEY
    §4.3 #4).  A NULL address array is nil-guarded in Go too, so only the
    empty-array case differs."""
    return F.try_element_at(col, F.lit(1))


# F7 — resource type → Mongo collection name (bundle.go:80).  The expected
# outputs are the 10 collections in db.go:12-24; irregular plurals handled
# explicitly, everything else lowercase + "s".
_IRREGULAR_PLURALS = {
    "DiagnosticReport": "diagnosticreports",
    "MedicationRequest": "medicationrequests",
    "AllergyIntolerance": "allergyintolerances",
}


def collection_name(resource_type: Column) -> Column:
    expr = None
    for singular, plural in _IRREGULAR_PLURALS.items():
        clause = F.when(resource_type == singular, F.lit(plural))
        expr = clause if expr is None else expr.when(
            resource_type == singular, F.lit(plural)
        )
    return expr.otherwise(F.concat(F.lower(resource_type), F.lit("s")))


def deterministic_id(*parts: Column) -> Column:
    """F8 — server-side ID minting.  The reference uses random BSON ObjectIds
    (main.go:266); we use a deterministic content hash of
    (bundle_id, fullUrl, ...) so reference rewriting (J3) needs no shared
    state and test output is stable.  F.uuid() is available for prod parity.
    """
    return F.sha2(F.concat_ws("|", *parts), 256)


def strip_cid_prefix(ref: Column) -> Column:
    """F9 — legacy 'cid:' prefix strip (bundle.go:138-139)."""
    return F.regexp_replace(ref, "^cid:", "")


def make_reference(resource_type: Column, new_id: Column) -> Column:
    """F10 — reference string construction: Type + '/' + id (main.go:268)."""
    return F.concat_ws("/", resource_type, new_id)


def money_cents(col: Column) -> Column:
    """Exact integer-cents representation of a 2-decimal double.  Sums of
    cents are associative (exact int64 arithmetic), so aggregates are
    bit-identical across engines and partition orders — unlike double sums.
    """
    return F.round(col * 100).cast("long")
