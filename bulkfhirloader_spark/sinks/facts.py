"""Fact-table sinks — K3/K4/K5 (db.go:43-75, db.go:134-166).

The reference always TRUNCATEs the three Postgres fact tables before
loading (main.go:72-73, db.go:45-58) and streams grouped rows in via the
COPY protocol inside one transaction (db.go:134-166).  Spark-native parity:

- test/local: ``mode("overwrite")`` parquet — same replace-not-append
  semantics as truncate-then-COPY.
- production: ``write.jdbc`` with ``truncate=true`` + ``overwrite`` — Spark
  issues TRUNCATE (preserving the schema/DDL) then batch-inserts; batchsize
  plays the role of COPY's buffered flush (db.go:153-158).  The full JDBC
  path (create, truncate-rerun, read-back) is exercised end-to-end against
  Spark's embedded Derby in tests/test_ingest.py; only the Postgres dialect
  itself is untested here.

K5 (-reset, main.go:76-78, db.go:63-75) drops the document collections; the
parquet analog removes the output directories.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_facts(facts: DataFrame, path: str) -> None:
    """K3+K4 test-mode: truncate-before-load == overwrite (db.go:43-59:
    the truncate always runs, so reruns replace rather than append)."""
    facts.write.mode("overwrite").parquet(path)


def jdbc_write_options(
    url: str,
    table: str,
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """The exact option set the K3 JDBC writer uses — exposed as a pure
    function so the plumbing is testable without a database in the sandbox
    (option-name typos silently no-op in Spark's JDBC source otherwise)."""
    opts = {
        "url": url,
        "dbtable": table,
        # K4: TRUNCATE (preserving DDL) instead of DROP+CREATE on overwrite,
        # exactly as db.go:45-58
        "truncate": "true",
        # COPY's buffered flush analog (db.go:153-158)
        "batchsize": str(batchsize),
    }
    opts.update(properties or {})
    return opts


def write_facts_jdbc(
    facts: DataFrame,
    url: str,
    table: str,
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """K3+K4 production shape (db.go:134-166 COPY parity): one TRUNCATE,
    then batched inserts.  ``truncate=true`` keeps the DDL (indexes, grants)
    exactly as the reference's TRUNCATE does, instead of DROP+CREATE."""
    (
        facts.write.format("jdbc")
        .options(**jdbc_write_options(url, table, batchsize, properties))
        .mode("overwrite")
        .save()
    )


def drop_collections(out_dir: str, collections: list[str] | None = None) -> None:
    """K5 (-reset; main.go:76-78, db.go:63-75): drop per-type document
    stores.  Parquet analog: remove the partition directories."""
    if collections is None:
        shutil.rmtree(out_dir, ignore_errors=True)
        return
    for c in collections:
        shutil.rmtree(f"{out_dir}/collection={c}", ignore_errors=True)


def mongo_write_options(
    uri: str,
    database: str,
    collection: str,
    ordered: bool = False,
    max_batch_size: int = 512,
) -> dict[str, str]:
    """The option set for the K1/K2 production document sink via the public
    MongoDB Spark Connector (format ``"mongodb"``, connector >= 10.x) —
    exposed as a pure function, same pattern as ``jdbc_write_options``, so
    the plumbing is testable without a Mongo endpoint (no Mongo exists in
    this sandbox; see SCALE.md).  Option keys follow the connector's
    published write-configuration names.

    ``ordered=False`` reproduces the reference's UNORDERED bulk insert
    (bundle.go:111-120: mongo.Collection.InsertMany with
    SetOrdered(false)); ``maxBatchSize`` is its batch-flush analog.
    """
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "ordered": "true" if ordered else "false",
        "maxBatchSize": str(max_batch_size),
    }


def write_resources_mongo(
    entries: DataFrame,
    uri: str,
    database: str,
    collection_col: str = "collection",
    format: str = "mongodb",  # noqa: A002 - Spark's own parameter name
) -> None:
    """K1 production shape: per-collection routed write through the Mongo
    Spark Connector.  The connector writes ONE collection per save, so the
    routing that parquet gets from ``partitionBy(collection)`` becomes one
    ``format("mongodb")`` save per distinct collection name — the distinct
    list is tiny (one row per FHIR resource type, F7), so the driver loop
    is over ~dozens of names, never rows.

    No live Mongo exists in the sandbox (SCALE.md), so end-to-end the path
    is exercised through ``format="filedocstore"`` — the
    sinks.docstore_stub Python Data Source, which consumes the IDENTICAL
    option surface (a misspelled option fails the save there instead of
    silently no-opping) and persists per-collection JSONL with a manifest
    of the options each executor received (tests/test_ingest.py).  The
    format name is the only production difference.
    """
    names = [r[0] for r in entries.select(collection_col).distinct().collect()]
    for name in names:
        (
            entries.where(F.col(collection_col) == name)
            .drop(collection_col)
            .write.format(format)
            .options(**mongo_write_options(uri, database, name))
            .mode("append")
            .save()
        )
