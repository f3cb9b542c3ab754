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
