"""FHIR bundle ingest: the reference's per-bundle dataflow (S1/S2, J1-J4,
A4/A5, F3/F4/F6/F8/F10, K1/K2) as one lazy DataFrame program."""

from bulkfhirloader_spark.ingest.pipeline import (
    REFERENCE_ARRAY_PATHS,
    REFERENCE_PATHS,
    assign_ids,
    derive_rawstat,
    explode_entries,
    load_condition_dim,
    load_cousub_dim,
    read_bundles,
    rewrite_references,
    run_pipeline,
)

__all__ = [
    "REFERENCE_ARRAY_PATHS",
    "REFERENCE_PATHS",
    "assign_ids",
    "derive_rawstat",
    "explode_entries",
    "load_condition_dim",
    "load_cousub_dim",
    "read_bundles",
    "rewrite_references",
    "run_pipeline",
]
