"""FHIR bundle ingest pipeline — the reference's entire "left half"
(main.go:99-132, bundle.go:24-125) as a lazy DataFrame program.

Reference dataflow, per bundle:
  read JSON -> typed Bundle (main.go:241-255)
  -> mint server IDs + refMap (main.go:264-275)
  -> rewrite intra-bundle references via reflection (bundle.go:173-221)
  -> route resources to per-type collections, bulk insert (bundle.go:75-120)
  -> derive one RawStats record: gender/age/deceased/location (J1) +
     condition id mapping (J2) + distinct sets (A4) (bundle.go:84-125)

Spark-first re-expression (SURVEY §3.2): the goroutine worker pool becomes
the partitioned file scan; per-bundle shared state (refMap) disappears
because new IDs are a DETERMINISTIC function of (bundle_id, fullUrl) — so
the per-bundle fullUrl->new-reference map is built on the INTACT bundle row
(one `transform` + `map_from_entries` before the explode) and reference
rewriting is pure `withField` struct surgery: the whole ingest-to-write
path is a ZERO-SHUFFLE projection at any corpus size.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from bulkfhirloader_spark.functions.scalars import (
    NULL_DISEASE_ID,
    age_years,
    collection_name,
    deterministic_id,
    first_element,
    is_deceased,
    make_reference,
    strip_suffix_case,
)
from bulkfhirloader_spark.schemas import (
    BUNDLE_SCHEMA,
    BUNDLE_SCHEMA_PERMISSIVE,
    CONDITION_DIM_SCHEMA,
    CORRUPT_RECORD_COL,
    COUSUB_DIM_SCHEMA,
)

# The Reference-typed paths the rewrite pass must touch.  The reference
# discovers these via recursive reflection over the FHIR Go structs —
# INCLUDING references inside slices (bundle.go:192-221 recurses
# reflect.Slice).  Our resource schema is explicit (schemas.RESOURCE_TYPE),
# so the paths are DERIVED from it at import time (r12 — previously a hand
# list, which an array-valued field like Observation.performer would have
# silently bypassed): a field typed Reference rewrites as a scalar, a field
# typed array<Reference> rewrites element-wise via transform.  Adding a
# Reference field to the schema is the whole change.
from bulkfhirloader_spark.schemas import REFERENCE_TYPE as _REF_T
from bulkfhirloader_spark.schemas import RESOURCE_TYPE as _RES_T

REFERENCE_PATHS = [f.name for f in _RES_T.fields if f.dataType == _REF_T]
REFERENCE_ARRAY_PATHS = [
    f.name
    for f in _RES_T.fields
    if isinstance(f.dataType, T.ArrayType) and f.dataType.elementType == _REF_T
]

# Pinned "now" so age math (F3, bundle.go:54-60) is deterministic in tests;
# pass as_of=F.current_date() for production behavior.
DEFAULT_AS_OF = "2020-01-01"


# ---------------------------------------------------------------------------
# S1/S2 — scan + parse
# ---------------------------------------------------------------------------


def bundle_id_column(scan_root: str) -> Column:
    """Bundle id = the file's path RELATIVE to the scan root, `.json`
    stripped.  The basename alone collides for sharded dumps (a/1.json and
    b/1.json are distinct bundles); since deterministic_id hashes
    (bundle_id, fullUrl), a basename collision would merge the two bundles'
    refmaps and collapse their rawstat rows — the reference can never
    collide because each file gets fresh random ObjectIds (main.go:266).
    The relative path is unique per load and stays human-readable.

    input_file_name() returns a percent-ENCODED file URI, so the raw-path
    prefix strip must decode it first or any root with a space/'#'/non-
    ASCII char silently falls through to the full encoded path as the id.
    url_decode is form-decoding ('+' -> space), which would corrupt paths
    containing a literal '+' (Hadoop leaves '+' unencoded), so '+' is
    protected as %2B before decoding; a malformed sequence falls back to
    the undecoded string via try_url_decode + coalesce."""
    root = os.path.abspath(scan_root).rstrip("/") + "/"
    no_scheme = F.regexp_replace(
        F.input_file_name(), r"^[A-Za-z][A-Za-z0-9+.-]*:(//)?", ""
    )
    decoded = F.coalesce(
        F.try_url_decode(F.regexp_replace(no_scheme, r"\+", "%2B")), no_scheme
    )
    rel = F.regexp_replace(decoded, "^" + re.escape(root), "")
    return F.regexp_replace(rel, r"\.json$", "")


def read_bundles(
    spark: SparkSession, path: str, capture_corrupt: bool = False
) -> DataFrame:
    """S1+S2 (main.go:111, main.go:211-228, main.go:241-255): recursive
    directory walk with a `.json` suffix filter, whole-file JSON parse with
    the explicit bundle schema.  One file = one bundle; bundle_id is the
    file's scan-root-relative path (stable, unique within a load, mirrors
    the reference's one-goroutine-per-file unit of work).

    With ``capture_corrupt`` the read runs PERMISSIVE with a
    ``_corrupt_record`` column: a malformed file becomes one row carrying
    its raw text instead of an indistinguishable all-null bundle.  The
    reference silently discards the parse error (main.go:255 ignores
    json.Unmarshal's return), leaving no trace of bad inputs."""
    reader = (
        spark.read.option("multiLine", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.json")
    )
    if capture_corrupt:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_RECORD_COL
        )
        df = reader.schema(BUNDLE_SCHEMA_PERMISSIVE).json(path)
    else:
        df = reader.schema(BUNDLE_SCHEMA).json(path)
    return df.withColumn("bundle_id", bundle_id_column(path))


def explode_entries(bundles: DataFrame) -> DataFrame:
    """One row per bundle entry, keyed by (bundle_id, fullUrl) and carrying
    the entry-order index `pos` (main.go:264: `for _, entry := range
    bundle.Entry` — order matters for last-patient-wins, bundle.go:84-97).

    The per-bundle fullUrl -> rewritten-reference map (J3's refMap,
    main.go:257-275) is built HERE, on the intact bundle row, with one
    `transform` + `map_from_entries` — no groupBy, no join: the map is a
    pure function of the row because new ids are deterministic.  Entries
    without a fullUrl are excluded from the map (nothing can reference
    them), matching the reference which keys refMap by entry.FullUrl."""
    refmap = F.map_from_entries(
        F.filter(
            F.transform(
                "entry",
                lambda e: F.struct(
                    e["fullUrl"].alias("key"),
                    make_reference(
                        e["resource"]["resourceType"],
                        deterministic_id(F.col("bundle_id"), e["fullUrl"]),
                    ).alias("value"),
                ),
            ),
            lambda kv: kv["key"].isNotNull(),
        )
    )
    return (
        bundles.withColumn("_refmap", refmap)
        .select("bundle_id", "_refmap", F.posexplode("entry").alias("pos", "e"))
        .select(
            "bundle_id",
            "pos",
            F.col("e.fullUrl").alias("fullUrl"),
            F.col("e.resource").alias("resource"),
            "_refmap",
        )
    )


# ---------------------------------------------------------------------------
# F8/F10 — ID assignment; J3 — reference rewrite
# ---------------------------------------------------------------------------


def assign_ids(entries: DataFrame) -> DataFrame:
    """ID minting (main.go:264-275).  The reference uses random BSON
    ObjectIds; we use sha2(bundle_id|fullUrl) so the refMap needs no shared
    mutable state and outputs are reproducible.  new_ref is the rewritten
    reference string Type/id (F10, main.go:268)."""
    new_id = deterministic_id(F.col("bundle_id"), F.col("fullUrl"))
    return entries.withColumn("new_id", new_id).withColumn(
        "new_ref", make_reference(F.col("resource.resourceType"), new_id)
    ).withColumn("resource", F.col("resource").withField("id", new_id))


def rewrite_references(entries: DataFrame) -> DataFrame:
    """J3 (main.go:257-278, bundle.go:173-221): rewrite every Reference field
    whose value matches another entry's fullUrl in the SAME bundle.

    Zero-shuffle: the fullUrl->new_ref map arrives as the `_refmap` column
    built on the intact bundle row (explode_entries), so the rewrite is pure
    withField surgery per known Reference path — a projection, no Exchange
    anywhere between scan and sink (asserted in tests/test_plans.py).

    The probe uses the VERBATIM reference string: the reference's active
    rewrite path (UpdateAllReferences, bundle.go:184-189, called from
    main.go:278) matches ref.Reference against fullUrl exactly — the legacy
    'cid:' strip (bundle.go:137-147) is dead code on that path, so F9 stays
    exposed as a scalar (functions.scalars.strip_cid_prefix) but is NOT
    applied here.  Unmatched references stay verbatim.

    Paths come FROM the schema (REFERENCE_PATHS / REFERENCE_ARRAY_PATHS —
    the Spark analog of the reference's reflection walk, which also
    recurses into slices, bundle.go:192-221): scalar Reference fields get
    withField surgery; array<Reference> fields rewrite element-wise with
    ``transform`` — still a pure projection, still zero-shuffle."""
    res = F.col("resource")
    for p in REFERENCE_PATHS:
        old = F.col(f"resource.{p}.reference")
        rewritten = F.coalesce(F.try_element_at(F.col("_refmap"), old), old)
        res = res.withField(
            p,
            F.when(old.isNotNull(), F.struct(rewritten.alias("reference"))).otherwise(
                F.col(f"resource.{p}")
            ),
        )
    refmap = F.col("_refmap")
    for p in REFERENCE_ARRAY_PATHS:
        arr = F.col(f"resource.{p}")
        res = res.withField(
            p,
            F.when(
                arr.isNotNull(),
                F.transform(
                    arr,
                    lambda r: F.struct(
                        F.coalesce(
                            F.try_element_at(refmap, r["reference"]), r["reference"]
                        ).alias("reference")
                    ),
                ),
            ).otherwise(arr),
        )
    return entries.withColumn("resource", res).drop("_refmap")


# ---------------------------------------------------------------------------
# S3/S4 — dimension loads (with F1/F2 applied, main.go:137-202)
# ---------------------------------------------------------------------------


def load_cousub_dim(spark: SparkSession, path: str) -> DataFrame:
    """S3 (main.go:137-167): county-subdivision dim; the SQL strips a
    ' Town' suffix from cs_name in the SELECT (F1, main.go:140-142)."""
    df = spark.read.schema(COUSUB_DIM_SCHEMA).parquet(path)
    return df.select(
        strip_suffix_case(F.col("cs_name"), " Town").alias("cs_name"),
        "ct_fips",
        "cs_fips",
    )


def load_condition_dim(spark: SparkSession, path: str) -> DataFrame:
    """S4 (main.go:171-202): tracked-condition dim keyed by (system, code);
    NULL disease_id becomes -999 in the SELECT (F2, main.go:174)."""
    df = spark.read.schema(CONDITION_DIM_SCHEMA).parquet(path)
    return df.select(
        "condition_id",
        F.coalesce(F.col("disease_id"), F.lit(NULL_DISEASE_ID)).alias("disease_id"),
        "code_system",
        "code",
    )


# ---------------------------------------------------------------------------
# J1/J2/J4 + A4 + F3/F4/F6 — rawstat derivation (bundle.go:66-125)
# ---------------------------------------------------------------------------


def _patient_fields(entries: DataFrame, as_of: Column) -> DataFrame:
    """Patient scalars per bundle (bundle.go:84-97).  The reference keeps one
    basestat struct per bundle and overwrites it on every Patient — the LAST
    patient in ENTRY ORDER wins; max_by(field, pos) reproduces exactly that
    (pos is the posexplode entry index from explode_entries)."""
    p = entries.filter(F.col("resource.resourceType") == "Patient")
    addr = first_element(F.col("resource.address"))  # F6: Address[0] only
    flat = p.select(
        "bundle_id",
        "pos",
        F.col("resource.id").alias("patient_id"),
        F.col("resource.gender").alias("gender"),
        age_years(F.to_date("resource.birthDate"), as_of).alias("age"),
        is_deceased(  # F4 tri-state (bundle.go:91)
            F.to_timestamp("resource.deceasedDateTime"),
            F.col("resource.deceasedBoolean"),
        ).alias("deceased"),
        addr["city"].alias("city"),
        addr["postalCode"].alias("zipcode"),
    )
    return flat.groupBy("bundle_id").agg(
        F.max_by("patient_id", "pos").alias("patient_id"),
        F.max_by("gender", "pos").alias("gender"),
        F.max_by("age", "pos").alias("age"),
        F.max_by("deceased", "pos").alias("deceased"),
        F.max_by("city", "pos").alias("city"),
        F.max_by("zipcode", "pos").alias("zipcode"),
        # presence marker: NULL after the left join <=> bundle had no Patient
        F.max(F.lit(1)).alias("_has_patient"),
    )


def _condition_sets(entries: DataFrame, condition_dim: DataFrame) -> DataFrame:
    """Conditions per bundle with J2 dim mapping and A4 distinct sets.

    J2 (bundle.go:104-105): broadcast left join on (system, code); a miss
    yields the Go zero-value Disease — IDs 0 — which the stats pipelines
    filter with > 0 but which still appear inside rawstat.conditions.
    A4 (bundle.go:24-51): distinct conditionids / diseaseids per patient,
    order-insensitive (collect_set + sort for determinism)."""
    c = entries.filter(F.col("resource.resourceType") == "Condition")
    coding = first_element(F.col("resource.code.coding"))  # F6: Coding[0]
    flat = c.select(
        "bundle_id",
        "pos",
        coding["system"].alias("system"),
        coding["code"].alias("code"),
    )
    j = flat.join(
        F.broadcast(condition_dim),
        (flat.system == condition_dim.code_system) & (flat.code == condition_dim.code),
        "left",
    ).select(
        "bundle_id",
        "pos",
        "system",
        flat.code.alias("code"),
        F.coalesce(F.col("condition_id"), F.lit(0)).alias("conditionid"),
        F.coalesce(F.col("disease_id"), F.lit(0)).alias("diseaseid"),
    )
    # collect_list order is partition-dependent; sorting by the carried entry
    # index makes `conditions` exactly the reference's append order
    # (bundle.go:99-108) and the output hash-stable.
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct("pos", "system", "code", "conditionid", "diseaseid"))
        ),
        lambda s: F.struct(
            s["system"].alias("system"),
            s["code"].alias("code"),
            s["conditionid"].alias("conditionid"),
            s["diseaseid"].alias("diseaseid"),
        ),
    )
    return j.groupBy("bundle_id").agg(
        ordered.alias("conditions"),
        F.array_sort(F.collect_set("conditionid")).alias("uniqueconditions"),
        F.array_sort(F.collect_set("diseaseid")).alias("uniquediseases"),
    )


def derive_rawstat(
    entries: DataFrame,
    cousub_dim: DataFrame,
    condition_dim: DataFrame,
    as_of: Column | None = None,
) -> DataFrame:
    """One RawStats row per bundle (models.go:5-15, bundle.go:66-125).

    Gotchas preserved (SURVEY §4.3):
    - #1 agerange is the hard-coded constant 1 (bundle.go:90) — but ONLY
      when a Patient entry exists: the constant is assigned inside the
      Patient branch, so a patient-less bundle keeps the Go zero-value
      RawStats (AgeRange=0, Age=0 — int fields without omitempty,
      models.go:9-10); age is still computed and carried.
    - #4 unknown city -> empty-string FIPS via left join + fill '' —
      the Go zero-value Cousub (bundle.go:94-95).
    - #6 a bundle with no Patient still emits a stat row with empty id
      (bundle.go:122-124 inserts basestat unconditionally).
    - deceasedboolean: the Go field is bool with omitempty (models.go:11),
      so false serializes as Mongo-absent; NULL and false are equivalent to
      the P1 filter, and we store the computed F4 boolean directly.
    """
    as_of = as_of if as_of is not None else F.lit(DEFAULT_AS_OF).cast("date")
    bundles = entries.select("bundle_id").distinct()
    patients = _patient_fields(entries, as_of)
    conds = _condition_sets(entries, condition_dim)

    base = bundles.join(patients, "bundle_id", "left").join(conds, "bundle_id", "left")

    # J1 (bundle.go:94-95): broadcast city -> FIPS lookup, zero-value default.
    j = base.join(F.broadcast(cousub_dim), base.city == cousub_dim.cs_name, "left")

    empty_int_array = F.array().cast("array<int>")
    empty_cond_array = F.array().cast(
        "array<struct<system:string,code:string,conditionid:int,diseaseid:int>>"
    )
    has_patient = F.col("_has_patient").isNotNull()
    return j.select(
        F.col("bundle_id"),
        F.coalesce(F.col("patient_id"), F.lit("")).alias("id"),
        F.col("gender"),
        # gotcha #1: hard-coded 1 (bundle.go:90), but only inside the Patient
        # branch — no Patient keeps the int zero values (models.go:9-10)
        F.when(has_patient, F.lit(1)).otherwise(F.lit(0)).alias("agerange"),
        F.when(has_patient, F.col("age")).otherwise(F.lit(0)).alias("age"),
        F.col("deceased").alias("deceasedboolean"),
        F.struct(
            F.coalesce(F.col("ct_fips"), F.lit("")).alias("countyid_fips"),
            F.coalesce(F.col("cs_fips"), F.lit("")).alias("subcountyid_fips"),
            F.coalesce(F.col("city"), F.lit("")).alias("city"),
            F.coalesce(F.col("zipcode"), F.lit("")).alias("zipcode"),
        ).alias("location"),
        F.coalesce(F.col("conditions"), empty_cond_array).alias("conditions"),
        F.coalesce(F.col("uniqueconditions"), empty_int_array).alias("uniqueconditions"),
        F.coalesce(F.col("uniquediseases"), empty_int_array).alias("uniquediseases"),
    )


# ---------------------------------------------------------------------------
# K1/K2 — document sinks; A5 — counter; full pipeline
# ---------------------------------------------------------------------------


def write_resources(entries: DataFrame, out_dir: str) -> None:
    """K1 (bundle.go:75-120): per-resource-type routed bulk write.  The
    Mongo per-collection unordered bulk insert maps to a parquet sink
    partitioned by collection name (F7) — one directory per collection,
    written by all tasks in parallel, no per-type driver loop.

    r17 (guide §6): a REBALANCE-by-collection hint before the sink.
    Without it every scan task writes one file per collection it happens
    to hold — scan_partitions × n_collections small files (measured 56
    files for a 1 000-bundle load; at 100 TB each output file is
    ~1/n_collections of a scan split, and the commit protocol pays per
    file).  The AQE rebalance clusters rows by collection into
    advisory-sized output files (2 files for the same load) and SPLITS a
    skewed collection across tasks, so one giant collection cannot
    serialize the write.  Cost: the one payload shuffle that produces
    the final layout — the bytes move exactly once, into the files they
    belong in (guide §8's rule)."""
    entries.withColumn(
        "collection", collection_name(F.col("resource.resourceType"))
    ).hint("rebalance", "collection").write.mode("append").partitionBy(
        "collection"
    ).parquet(out_dir)


def write_rawstat(rawstat: DataFrame, out_dir: str) -> None:
    """K2 (bundle.go:122-124)."""
    rawstat.write.mode("append").parquet(out_dir)


def run_pipeline(
    spark: SparkSession,
    bundles_path: str,
    cousub_dim_path: str,
    condition_dim_path: str,
    out_dir: str,
    as_of: Column | None = None,
) -> dict:
    """Entry point 1 (main.go:27-133) minus the relational fact write —
    see sinks.facts for K3/K4.  Returns the A5 counters (main.go:285).

    The wg.Wait() barrier (main.go:121) is implicit: the resource/rawstat
    writes are actions that complete before facts read the rawstat output.

    Single-pass like the reference (main.go:103 counts while loading):
    - A5 is an `observe` metric on the bundle scan, so the count rides the
      quarantine-write job instead of re-scanning the input (multiLine JSON
      has no fast count path — a separate .count() re-parses every file).
    - `bundles` is persisted DISK_ONLY: parse the JSON once, then serve the
      corrupt-file quarantine, the resources write, and the rawstat
      derivation from the columnar cached form (the downstream explode /
      rewrite steps are pure projections — cheap to recompute per sink; the
      JSON parse is the expensive part).  Blocks that don't fit local disk
      fall back to recompute, so this degrades gracefully rather than
      OOMing.
    - Malformed bundle files are captured, not crashed-on and not silently
      emptied (the reference drops the Unmarshal error, main.go:255):
      their raw text lands in ``out_dir/quarantine`` keyed by bundle_id —
      the re-fetch list an operator actually needs — and they are excluded
      from every downstream count and fact.
    """
    obs = Observation("a5_record_counter")
    corrupt_flag = F.col(CORRUPT_RECORD_COL).isNotNull()
    bundles = (
        read_bundles(spark, bundles_path, capture_corrupt=True)
        .observe(
            obs,
            F.count(F.lit(1)).alias("bundles"),
            F.sum(corrupt_flag.cast("long")).alias("corrupt"),
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    try:
        bundles.filter(corrupt_flag).select(
            "bundle_id", F.col(CORRUPT_RECORD_COL).alias("raw_text")
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "quarantine"))
        counts = obs.get  # first action done — metrics available
        good = bundles.filter(~corrupt_flag).drop(CORRUPT_RECORD_COL)
        entries = rewrite_references(assign_ids(explode_entries(good)))
        cousub = load_cousub_dim(spark, cousub_dim_path)
        conddim = load_condition_dim(spark, condition_dim_path)
        rawstat = derive_rawstat(entries, cousub, conddim, as_of)
        # r17 (guide §2.6 — overlap independent jobs): the resource and
        # rawstat sinks both read the one persisted parse and depend on
        # nothing else; submitting them from two driver threads lets the
        # second job's tasks back-fill executors freed by the first
        # job's tail instead of idling through it (measured −15% warm
        # locally; at scale the tail is the whole straggler window).
        # Same writes, same rows, same directories — only the dispatch
        # is concurrent; result() re-raises either job's failure exactly
        # like the sequential form.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_res = pool.submit(
                write_resources, entries, os.path.join(out_dir, "resources")
            )
            f_raw = pool.submit(
                write_rawstat, rawstat, os.path.join(out_dir, "rawstat")
            )
            f_res.result()
            f_raw.result()
    finally:
        bundles.unpersist()
    n_corrupt = int(counts["corrupt"] or 0)
    # A5 (main.go:103, main.go:285) counts loaded bundles; corrupt files
    # are reported separately, not inside the loaded count.
    return {
        "bundles": int(counts["bundles"]) - n_corrupt,
        "corrupt_bundles": n_corrupt,
        "out_dir": out_dir,
    }
