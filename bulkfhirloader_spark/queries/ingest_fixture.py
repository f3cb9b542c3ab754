"""Driver-checked ingest fixture: the reference's whole "left half"
(main.go:241-278, bundle.go:66-125) exercised end-to-end under the oracle
harness, not just pytest.

``ensure_fixture(spark)`` writes a small corpus of FHIR-shaped bundle files
(FIXTURES.md §2 — every SURVEY §4.3 gotcha is present) plus the two
dimension tables to a process-lifetime temp directory, runs the full batch
pipeline (S1/S2 scan+parse -> F8 ids -> J3 rewrite -> K1/K2 writes -> J1/J2/
J4/A4/F3/F4/F6 rawstat derivation) ONCE, and returns the output dir.  The
registry queries over it are hash-compared against DuckDB oracles that
restate the same semantics independently:

- the rawstat golden restates F8 (sha256 of 'bundle_id|fullUrl') and every
  derivation rule as literal VALUES;
- the three fact queries restate the reference's MQL pipelines
  (db.go:79-358) as SQL over that VALUES relation — so the aggregation
  logic is genuinely re-derived, not copied from the Spark output.

Fixture inventory (as_of pinned to 2020-01-01):
  b1: male patient in 'Acton' ('Acton Town' dim row -> F1 strip), four
      conditions — tracked (101/11), null-disease twice (102/-999, A4 dedup),
      untracked (0/0) — with subject references to the patient (J3), one
      dangling reference left verbatim, and c1 carrying an ARRAY of
      performer references (one intra-bundle -> rewritten, one external ->
      verbatim; the slice-recursion case of bundle.go:192-221, r12).
  b2: female patient, deceasedBoolean=true  -> excluded from all facts.
  b3: male patient, deceasedDateTime only   -> deceased via F4 tri-state.
  b4: NO patient -> rawstat row with empty id (gotcha #6), conditions kept;
      agerange/age stay the Go int zero values 0/0 (bundle.go:90 only runs
      in the Patient branch; models.go:9-10 have no omitempty).
  b5: 'other'-gender patient in unknown city -> '' FIPS (gotcha #4), counts
      in pop only (gotcha #7).
  b6: TWO patients -> the last in entry order wins (bundle.go:84-97).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bulkfhirloader_spark.ingest.pipeline import run_pipeline

SNOMED = "http://snomed.info/sct"


def _patient(full_url, gender, birth, city, zipc="01720",
             deceased_bool=None, deceased_dt=None):
    r = {
        "resourceType": "Patient",
        "id": "orig",
        "gender": gender,
        "birthDate": birth,
        "address": [{"city": city, "state": "MA", "postalCode": zipc}],
    }
    if deceased_bool is not None:
        r["deceasedBoolean"] = deceased_bool
    if deceased_dt is not None:
        r["deceasedDateTime"] = deceased_dt
    return {"fullUrl": full_url, "resource": r}


def _condition(full_url, code, subject=None, performer=None):
    r = {
        "resourceType": "Condition",
        "code": {"coding": [{"system": SNOMED, "code": code, "display": code}]},
    }
    if subject:
        r["subject"] = {"reference": subject}
    if performer:
        # array-of-Reference path (r12): the reference's reflection walk
        # rewrites references inside slices too (bundle.go:192-221
        # recurses reflect.Slice) — this exercises the schema-derived
        # REFERENCE_ARRAY_PATHS rewrite end-to-end
        r["performer"] = [{"reference": ref} for ref in performer]
    return {"fullUrl": full_url, "resource": r}


def _bundles() -> dict[str, dict]:
    return {
        "b1": {
            "resourceType": "Bundle", "type": "transaction",
            "entry": [
                _patient("urn:uuid:pat1", "male", "1980-06-01", "Acton"),
                _condition(
                    "urn:uuid:c1",
                    "44054006",
                    subject="urn:uuid:pat1",
                    # intra-bundle array refs: first element rewrites (pat1
                    # is in this bundle), second dangles and stays verbatim
                    performer=["urn:uuid:pat1", "urn:uuid:ext-practitioner"],
                ),
                _condition("urn:uuid:c2", "38341003", subject="urn:uuid:pat1"),
                _condition("urn:uuid:c3", "38341003", subject="urn:uuid:pat1"),
                _condition("urn:uuid:c4", "99999999", subject="urn:uuid:dangling"),
            ],
        },
        "b2": {
            "resourceType": "Bundle", "type": "transaction",
            "entry": [
                _patient("urn:uuid:pat2", "female", "1950-01-15", "Acton",
                         deceased_bool=True),
                _condition("urn:uuid:c5", "44054006", subject="urn:uuid:pat2"),
            ],
        },
        "b3": {
            "resourceType": "Bundle", "type": "transaction",
            "entry": [
                _patient("urn:uuid:pat3", "male", "1940-03-03", "Acton",
                         deceased_dt="2015-07-01T00:00:00Z"),
            ],
        },
        "b4": {
            "resourceType": "Bundle", "type": "transaction",
            "entry": [_condition("urn:uuid:c6", "44054006")],
        },
        "b5": {
            "resourceType": "Bundle", "type": "transaction",
            "entry": [
                _patient("urn:uuid:pat5", "other", "2001-12-31", "Atlantis",
                         zipc=""),
            ],
        },
        "b6": {
            "resourceType": "Bundle", "type": "transaction",
            "entry": [
                _patient("urn:uuid:first", "male", "1980-06-01", "Acton"),
                _patient("urn:uuid:last", "female", "1990-02-02", "Boston",
                         zipc="02108"),
            ],
        },
    }


_OUT_DIR: str | None = None


def ensure_fixture(spark: SparkSession) -> str:
    """Write the fixture corpus and run the batch pipeline once per process;
    return the pipeline output directory (contains resources/ + rawstat/)."""
    global _OUT_DIR
    if _OUT_DIR is not None and os.path.isdir(os.path.join(_OUT_DIR, "rawstat")):
        return _OUT_DIR
    root = tempfile.mkdtemp(prefix="bfls_ingest_fix_")
    bdir = os.path.join(root, "bundles")
    os.makedirs(bdir)
    for name, b in _bundles().items():
        with open(os.path.join(bdir, f"{name}.json"), "w") as f:
            json.dump(b, f)
    # P4: a non-.json file the suffix filter must skip (main.go:219)
    with open(os.path.join(bdir, "README.txt"), "w") as f:
        f.write("not a bundle")

    cousub = spark.createDataFrame(
        [("Acton Town", "017", "00100"), ("Boston", "025", "07000")],
        "cs_name string, ct_fips string, cs_fips string",
    )
    conddim = spark.createDataFrame(
        [
            (101, 11, "Diabetes", SNOMED, "44054006"),
            (102, None, "Hypertension", SNOMED, "38341003"),
        ],
        "condition_id int, disease_id int, condition_name string, "
        "code_system string, code string",
    )
    cousub_path = os.path.join(root, "dims", "cousub")
    conddim_path = os.path.join(root, "dims", "conddim")
    cousub.write.parquet(cousub_path)
    conddim.write.parquet(conddim_path)

    out_dir = os.path.join(root, "out")
    run_pipeline(
        spark, bdir, cousub_path, conddim_path, out_dir,
        as_of=F.lit("2020-01-01").cast("date"),
    )
    _OUT_DIR = out_dir
    return out_dir


_STREAM_OUT: str | None = None


def ensure_stream_fixture(spark: SparkSession) -> str:
    """Drain the SAME fixture corpus through the Structured Streaming ingest
    (availableNow trigger + checkpoint) once per process; returns its output
    dir.  Lets the driver hard-check that the streaming path produces
    exactly the batch K1 result."""
    global _STREAM_OUT
    if _STREAM_OUT is not None and os.path.isdir(os.path.join(_STREAM_OUT, "resources")):
        return _STREAM_OUT
    from bulkfhirloader_spark.streaming import stream_ingest_available_now

    root = os.path.dirname(ensure_fixture(spark))
    sout = os.path.join(root, "stream_out")
    stream_ingest_available_now(spark, os.path.join(root, "bundles"), sout)
    _STREAM_OUT = sout
    return sout


def fixture_rawstat(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(os.path.join(ensure_fixture(spark), "rawstat"))


def fixture_resources(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(os.path.join(ensure_fixture(spark), "resources"))


def flatten_rawstat(rawstat: DataFrame) -> DataFrame:
    """Hashable flat projection of RAWSTAT_SCHEMA: structs to scalar columns,
    arrays serialized to delimiter-joined strings (the driver canonicalizer
    hashes pandas frames and Python lists are unhashable)."""
    cond_csv = F.array_join(
        F.transform(
            "conditions",
            lambda c: F.concat_ws(
                ":",
                c["code"],
                c["conditionid"].cast("string"),
                c["diseaseid"].cast("string"),
            ),
        ),
        ";",
    )
    int_csv = lambda col: F.array_join(  # noqa: E731
        F.transform(col, lambda x: x.cast("string")), ","
    )
    return rawstat.select(
        "bundle_id",
        "id",
        "gender",
        "agerange",
        "age",
        "deceasedboolean",
        F.col("location.countyid_fips").alias("ct_fips"),
        F.col("location.subcountyid_fips").alias("cs_fips"),
        F.col("location.city").alias("city"),
        F.col("location.zipcode").alias("zipcode"),
        cond_csv.alias("conditions_csv"),
        int_csv("uniqueconditions").alias("uniqueconditions_csv"),
        int_csv("uniquediseases").alias("uniquediseases_csv"),
    )


# The rawstat relation restated as literal VALUES for the DuckDB oracles.
# Every cell is re-derived from the reference's rules by hand — ids via
# DuckDB's own sha256 over 'bundle_id|fullUrl' (F8), ages by the F3
# completed-years rule at 2020-01-01, FIPS via the dim rows, unique sets by
# A4 dedup+sort — so the oracle is an independent restatement, not a dump.
RAWSTAT_VALUES_SQL = """
rawstat(bundle_id, id, gender, agerange, age, deceasedboolean, ct_fips,
        cs_fips, city, zipcode, conditions_csv, uniqueconditions_csv,
        uniquediseases_csv) AS (
  VALUES
  ('b1', sha256('b1|urn:uuid:pat1'), 'male',   1, 39, false, '017', '00100',
   'Acton', '01720',
   '44054006:101:11;38341003:102:-999;38341003:102:-999;99999999:0:0',
   '0,101,102', '-999,0,11'),
  ('b2', sha256('b2|urn:uuid:pat2'), 'female', 1, 69, true,  '017', '00100',
   'Acton', '01720', '44054006:101:11', '101', '11'),
  ('b3', sha256('b3|urn:uuid:pat3'), 'male',   1, 79, true,  '017', '00100',
   'Acton', '01720', '', '', ''),
  ('b4', '', NULL, 0, 0, NULL, '', '', '', '',
   '44054006:101:11', '101', '11'),
  ('b5', sha256('b5|urn:uuid:pat5'), 'other',  1, 18, false, '', '',
   'Atlantis', '', '', '', ''),
  ('b6', sha256('b6|urn:uuid:last'), 'female', 1, 29, false, '025', '07000',
   'Boston', '02108', '', '', '')
)
"""
