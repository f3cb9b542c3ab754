"""bulkfhirloader_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``synthetichealth/bulkfhirloader``.

The reference (read-only at /root/reference) is a Go ETL program that loads
FHIR bundles into MongoDB and aggregates per-patient summary stats into
Postgres fact tables (reference: main.go, bulkloader/bundle.go,
bulkloader/db.go).  This package re-expresses every operator in that program
— and a set of large-scale training-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal columns, event-time windows) —
as idiomatic Spark DataFrame / Spark SQL programs designed for a
1000-executor cluster, while remaining testable on local[N].

Layout:
    session.py       SparkSession builder (AQE, UTC, tuned shuffle partitions)
    schemas.py       explicit StructTypes: FHIR bundle subset, rawstat, dims, facts
    sources/         readers: testdata parquet tables, FHIR bundle JSON dirs, dims
    ingest/          bundle ingest dataflow (explode → id assign → ref rewrite →
                     per-type write → rawstat derivation)
    operators/       stats pipelines + extension operators
    functions/       scalar column helpers (reference §2.7 F1–F10)
    sinks/           fact-table sinks (truncate-before-load, JDBC/parquet)
    streaming/       Structured Streaming ingest variant (availableNow)
    queries/         the oracle-checked query registry driving __spark_entry__.py

Plan-shape assertions (broadcast joins, pushdown, pruning, no Python UDFs
on hot paths) live in tests/test_plans.py.
"""

__version__ = "0.1.0"
