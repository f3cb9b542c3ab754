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


def read_evolved_parquet(
    spark: SparkSession,
    path: str,
    expected_schema=None,
) -> DataFrame:
    """Read an append-only parquet store whose schema EVOLVED across
    writes (later batches added columns): ``mergeSchema`` unions the file
    footers' schemas at planning time, and rows from pre-evolution files
    surface the new columns as NULL — the standard additive-evolution
    contract.

    Why a wrapper instead of a bare read: (a) Spark's default
    (``spark.sql.parquet.mergeSchema=false``) silently picks ONE footer's
    schema — which one depends on file listing order, so an evolved store
    read without this flag returns a run-dependent column set; (b) at
    100 TB footer-merging is a per-file planning cost, so the global conf
    stays off and the flag is applied per-read here, only where evolution
    is expected; (c) ``expected_schema`` (optional) pins the POST-evolution
    contract — extra unknown columns raise instead of flowing silently
    downstream (rename/type changes are NOT additive evolution and must be
    handled by rewrite, not by this reader).
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if expected_schema is not None:
        expected = {(f.name, f.dataType.simpleString()) for f in expected_schema}
        got = {(f.name, f.dataType.simpleString()) for f in df.schema}
        unknown = got - expected
        if unknown:
            raise ValueError(
                f"evolved store at {path} contains columns outside the "
                f"expected contract: {sorted(unknown)} — additive evolution "
                "only; rename/retype requires a rewrite"
            )
        present = {f.name for f in df.schema}
        df = df.select(*[f.name for f in expected_schema if f.name in present])
    return df
