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
