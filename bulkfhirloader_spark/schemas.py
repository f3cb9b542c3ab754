"""Explicit schemas.

The reference never infers schema at runtime: resource shapes come from
compiled Go structs (main.go:18 imports intervention-engine/fhir/models),
the per-patient summary from bulkloader/models.go:5-46, and the fact tables
from the Postgres DDL.  We mirror that stance — every reader in this engine
declares a StructType instead of relying on JSON/parquet inference, which
also keeps scans prunable and plans stable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# FHIR bundle subset (only the fields the reference touches: bundle.go:84-108)
# ---------------------------------------------------------------------------

# A Reference field as rewritten by the reference's fixReferences
# (bundle.go:173-221): a "Type/id" string.
REFERENCE_TYPE = T.StructType([T.StructField("reference", T.StringType())])

CODING_TYPE = T.StructType(
    [
        T.StructField("system", T.StringType()),
        T.StructField("code", T.StringType()),
        T.StructField("display", T.StringType()),
    ]
)

# One bundle entry's resource, as a superset struct.  FHIR resources are
# heterogeneous; the reference type-switches on the reflected Go type
# (bundle.go:79-108).  Spark-side we keep one wide nullable struct with the
# union of the fields we need — absent fields are NULL, matching Mongo's
# missing-field semantics via coalesce (SURVEY §4.3 #2).
RESOURCE_TYPE = T.StructType(
    [
        T.StructField("resourceType", T.StringType()),
        T.StructField("id", T.StringType()),
        # Patient fields (bundle.go:84-97)
        T.StructField("gender", T.StringType()),
        T.StructField("birthDate", T.StringType()),
        T.StructField("deceasedBoolean", T.BooleanType()),
        T.StructField("deceasedDateTime", T.StringType()),
        T.StructField(
            "address",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("city", T.StringType()),
                        T.StructField("state", T.StringType()),
                        T.StructField("postalCode", T.StringType()),
                    ]
                )
            ),
        ),
        # Condition fields (bundle.go:99-108)
        T.StructField(
            "code",
            T.StructType([T.StructField("coding", T.ArrayType(CODING_TYPE))]),
        ),
        # Reference-typed fields the rewrite pass (J3) must touch.  The
        # reference finds these via recursive reflection over scalars AND
        # slices (bundle.go:192-221 recurses reflect.Slice); our rewrite
        # DERIVES its path list from this schema (ingest.pipeline's
        # REFERENCE_PATHS / REFERENCE_ARRAY_PATHS), so adding a
        # Reference-typed field here — scalar or array — is the whole
        # change: the rewrite picks it up automatically.
        T.StructField("subject", REFERENCE_TYPE),
        T.StructField("patient", REFERENCE_TYPE),
        T.StructField("encounter", REFERENCE_TYPE),
        T.StructField("context", REFERENCE_TYPE),
        # array-of-Reference (real FHIR shape: Observation.performer et al)
        T.StructField("performer", T.ArrayType(REFERENCE_TYPE)),
        T.StructField("serviceProvider", REFERENCE_TYPE),
        T.StructField("organization", REFERENCE_TYPE),
        T.StructField("medicationReference", REFERENCE_TYPE),
    ]
)

BUNDLE_ENTRY_TYPE = T.StructType(
    [
        T.StructField("fullUrl", T.StringType()),
        T.StructField("resource", RESOURCE_TYPE),
    ]
)

# models.Bundle (main.go:254-261): we only need entry[]; resourceType/type
# kept for sanity filters.
BUNDLE_SCHEMA = T.StructType(
    [
        T.StructField("resourceType", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("entry", T.ArrayType(BUNDLE_ENTRY_TYPE)),
    ]
)

# PERMISSIVE-mode variant: a malformed bundle file parses to one row with
# the raw text captured here instead of failing the job or vanishing.  The
# reference DROPS the json.Unmarshal error entirely (main.go:255: return
# value ignored), so a corrupt file silently becomes an empty bundle with
# no trace; at 100 TB the operator needs the bad-file list (which files,
# what bytes) to re-fetch them — that's the quarantine output.
CORRUPT_RECORD_COL = "_corrupt_record"
BUNDLE_SCHEMA_PERMISSIVE = BUNDLE_SCHEMA.add(
    T.StructField(CORRUPT_RECORD_COL, T.StringType())
)

# ---------------------------------------------------------------------------
# Dimension tables (main.go:137-202)
# ---------------------------------------------------------------------------

COUSUB_DIM_SCHEMA = T.StructType(
    [
        T.StructField("cs_name", T.StringType(), False),
        T.StructField("ct_fips", T.StringType()),
        T.StructField("cs_fips", T.StringType()),
    ]
)

CONDITION_DIM_SCHEMA = T.StructType(
    [
        T.StructField("condition_id", T.IntegerType(), False),
        T.StructField("disease_id", T.IntegerType()),  # nullable → coalesce(-999)
        T.StructField("condition_name", T.StringType()),
        T.StructField("code_system", T.StringType()),
        T.StructField("code", T.StringType()),
    ]
)

DISEASE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("disease_id", T.IntegerType(), False),
        T.StructField("disease_name", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# rawstat — per-patient summary (models.go:5-15)
# ---------------------------------------------------------------------------

LOCATION_TYPE = T.StructType(
    [
        T.StructField("countyid_fips", T.StringType()),
        T.StructField("subcountyid_fips", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("zipcode", T.StringType()),
    ]
)

CONDITION_CODE_TYPE = T.StructType(
    [
        T.StructField("system", T.StringType()),
        T.StructField("code", T.StringType()),
        T.StructField("conditionid", T.IntegerType()),
        T.StructField("diseaseid", T.IntegerType()),
    ]
)

RAWSTAT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("agerange", T.IntegerType()),
        T.StructField("age", T.IntegerType()),
        T.StructField("deceasedboolean", T.BooleanType()),  # NULL ⇔ Mongo-absent
        T.StructField("location", LOCATION_TYPE),
        T.StructField("conditions", T.ArrayType(CONDITION_CODE_TYPE)),
        T.StructField("uniqueconditions", T.ArrayType(T.IntegerType())),
        T.StructField("uniquediseases", T.ArrayType(T.IntegerType())),
    ]
)

# ---------------------------------------------------------------------------
# Fact tables (COPY column lists: db.go:139, db.go:235, db.go:330)
# ---------------------------------------------------------------------------

POP_FACTS_SCHEMA = T.StructType(
    [
        T.StructField("cs_fips", T.StringType()),
        T.StructField("age_id", T.IntegerType()),
        T.StructField("pop", T.LongType()),
        T.StructField("pop_male", T.LongType()),
        T.StructField("pop_female", T.LongType()),
    ]
)

DISEASE_FACTS_SCHEMA = T.StructType(
    [
        T.StructField("cs_fips", T.StringType()),
        T.StructField("disease_id", T.IntegerType()),
        T.StructField("age_id", T.IntegerType()),
        T.StructField("pop", T.LongType()),
        T.StructField("pop_male", T.LongType()),
        T.StructField("pop_female", T.LongType()),
    ]
)

CONDITION_FACTS_SCHEMA = T.StructType(
    [
        T.StructField("cs_fips", T.StringType()),
        T.StructField("condition_id", T.IntegerType()),
        T.StructField("age_id", T.IntegerType()),
        T.StructField("pop", T.LongType()),
        T.StructField("pop_male", T.LongType()),
        T.StructField("pop_female", T.LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §1)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
