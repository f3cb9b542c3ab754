"""Corpus interchange sources: JSON-Lines, the de-facto wire format for LLM
training corpora (one document object per line — what crawls, filtered
dumps, and most dataset releases actually ship as).

Scale notes, because the format choice IS the scale decision here:
- JSONL is LINE-splittable: a single 1 TB uncompressed/zstd file still
  fans out across tasks on newline boundaries, so read parallelism does
  not depend on the shard layout.  multiLine JSON (one document per file,
  the bundle-ingest shape) is one-task-per-file by construction.
- gzip is NOT splittable — a .jsonl.gz shard is one task no matter its
  size.  Write many modest shards (or zstd) if gzip is required; the
  writer below defaults to uncompressed and takes a codec explicitly so
  the choice is visible at the call site.
- The schema is explicit, never inferred: schema inference reads the data
  twice and silently widens types on dirty corpora.
- PERMISSIVE + `_corrupt_record` (same pattern as the bundle ingest): one
  mangled line quarantines one row, it does not kill the job or silently
  vanish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bulkfhirloader_spark.schemas import CORRUPT_RECORD_COL

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    capture_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL document corpus with an explicit schema.

    With ``capture_corrupt``, malformed lines surface as rows whose
    ``_corrupt_record`` column holds the raw line (filter on it to split
    good/quarantine); without it they become all-null rows.
    """
    reader = spark.read.option("multiLine", "false").option(
        "recursiveFileLookup", "true"
    )
    if capture_corrupt:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_RECORD_COL
        )
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_RECORD_COL, T.StringType())]
        )
    return reader.schema(schema).json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    num_shards: int | None = None,
    compression: str | None = None,
    mode: str = "error",
) -> None:
    """Write a corpus as JSONL shards.

    ``num_shards`` repartitions to a target shard count (round-robin — use
    when the upstream partitioning is skewed or too fine); None keeps the
    existing partitioning, zero shuffle.  ``compression`` None/'none'
    writes splittable plain text; pass 'gzip' only with many shards (each
    .gz is a single read task) — 'zstd' stays splittable via larger
    frames and is the right default for cold storage.
    """
    if num_shards is not None:
        df = df.repartition(num_shards)
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    capture_corrupt: bool = False,
    header: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """Read a CSV document corpus with an explicit schema — the interchange
    format of tabular metadata drops (and, regrettably, of some text
    corpora).  Same contract as ``read_jsonl``: explicit schema (no
    double-read inference), PERMISSIVE corrupt-row capture on request.

    Scale note: the default read is newline-SPLITTABLE, which silently
    mangles quoted text containing embedded newlines (the row splits
    mid-record).  Corpora whose text can hold newlines must pass
    ``multiline=True`` — correct, but each file becomes ONE read task, so
    shard accordingly (or prefer JSONL, which escapes newlines in-band
    and stays splittable; that trade-off is why JSONL won this format
    war).  Quoting/escaping is Spark-default RFC-ish ('"' quote).
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("recursiveFileLookup", "true")
        .option("multiLine", "true" if multiline else "false")
    )
    if capture_corrupt:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_RECORD_COL
        )
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_RECORD_COL, T.StringType())]
        )
    return reader.schema(schema).csv(path)


def write_csv(
    df: DataFrame,
    path: str,
    num_shards: int | None = None,
    compression: str | None = None,
    mode: str = "error",
    header: bool = True,
) -> None:
    """Write a corpus as CSV shards (same sharding/codec contract as
    ``write_jsonl``)."""
    if num_shards is not None:
        df = df.repartition(num_shards)
    writer = df.write.mode(mode).option("header", str(header).lower())
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.csv(path)


def write_orc(
    df: DataFrame,
    path: str,
    num_shards: int | None = None,
    mode: str = "error",
) -> None:
    """Write a corpus as ORC — the columnar alternative when the downstream
    stack is Hive/Trino-first.  Columnar + striped: predicate pushdown and
    column pruning work exactly as with parquet; always splittable."""
    if num_shards is not None:
        df = df.repartition(num_shards)
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC corpus (schema from file metadata — ORC is self-
    describing, unlike CSV/JSONL where inference would double-read)."""
    return spark.read.option("recursiveFileLookup", "true").orc(path)
