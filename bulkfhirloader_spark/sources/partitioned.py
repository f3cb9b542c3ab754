"""Hive-style date-partitioned event store: the layout that turns "scan
100 TB" into "scan one day".

`partitionBy("event_date")` writes one directory per day; a reader whose
filter pins the partition column never opens the other directories —
partition PRUNING happens in the driver against directory names, before
any file I/O, visible in the plan as ``PartitionFilters``.  This is the
single biggest scan-reduction lever for append-only event data at 100 TB
(reference analog: none — bulkfhirloader re-reads its whole input every
run, main.go:103).

Two hazards the API here makes explicit:
- PARTITION COUNT: one directory per distinct value.  Dates are safe
  (365/year); never partition by a high-cardinality key (user_id =
  millions of dirs = listing death).  ``repartition(partition_col)``
  before the write yields ONE file per partition instead of
  tasks×partitions small files.
- The partition column must be DERIVED AND STABLE (date(ts)), never a
  free-form string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "error",
) -> None:
    """Write events partitioned by derived ``event_date``.

    The pre-write ``repartition(event_date)`` makes each day ONE output
    file (plus makes the write's shuffle carry day-clustered rows) — the
    small-file antidote; drop it only if upstream is already
    day-clustered.
    """
    with_day = events.withColumn("event_date", F.to_date(F.col(ts_col)))
    with_day.repartition(F.col("event_date")).write.mode(mode).partitionBy(
        "event_date"
    ).parquet(path)


def read_events_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Read exactly one day from a partitioned event store.  The equality
    filter on the partition column prunes at PLANNING time — the scan's
    ``PartitionFilters`` carries it and untouched days are never listed
    into tasks (plan-asserted in tests)."""
    return spark.read.parquet(path).where(F.col("event_date") == F.lit(day))


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    partition_col: str = "event_date",
) -> DataFrame:
    """Small-file compaction plan for a partitioned store: return the store
    re-bucketed so each partition writes ``ceil(rows / target)`` files of
    ~equal size, ready for an overwrite of the compacted copy.

    A streaming ingester writing every few minutes leaves thousands of tiny
    files per day; at 100 TB the file-listing and per-file open costs come
    to dominate the scan.  Compaction = read + repartition + rewrite.  The
    per-partition file count must be DATA-DERIVED: a global
    ``repartition(N)`` either under-splits hot days or shatters cold ones.
    Here each row gets a uniform file slot within its partition —
    ``repartitionByRange`` on (partition, slot) then clusters rows so every
    output file holds one slot of one day, without collecting per-day
    counts to the driver.

    Row->slot assignment is a per-partition uniform hash over the
    partition's own slot count (count via an unframed window over the
    partition), so hot days split and cold days stay whole with no
    driver-side per-day loop.  The range shuffle's task count comes from a
    metadata-only ``count()`` (parquet row counts live in footers — no data
    scan), sized so one task ~= one target file.
    """
    from math import ceil

    from pyspark.sql import Window

    df = spark.read.parquet(path)
    total = df.count()  # footer metadata only
    num_tasks = max(1, ceil(total / target_rows_per_file))
    n_rows = F.count(F.lit(1)).over(Window.partitionBy(partition_col))
    n_slots = F.greatest(
        F.ceil(n_rows / F.lit(float(target_rows_per_file))), F.lit(1).cast("long")
    )
    slot = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), n_slots)
    return (
        df.withColumn("_slot", slot)
        .repartitionByRange(num_tasks, F.col(partition_col), F.col("_slot"))
        .drop("_slot")
    )


def compact_store(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
    partition_col: str = "event_date",
) -> None:
    """Materialize the compaction: write the re-bucketed store to
    ``out_path`` with the same Hive layout.  Kept separate from the plan
    builder so tests can assert on the plan/distribution without a write,
    and so callers control the swap (write-new, validate, atomically
    rename) instead of overwriting in place."""
    compact_partitions(
        spark, path, target_rows_per_file, partition_col
    ).write.partitionBy(partition_col).parquet(out_path)
