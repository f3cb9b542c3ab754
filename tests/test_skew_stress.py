"""Planted-skew stress: measurements, not design reasoning (VERDICT r5 #6).

A synthetic corpus with one 90%-mass key is pushed through the skew tools
and the per-TASK row distribution of the actual executed plan is measured
via spark_partition_id().  The unsalted baseline must exhibit the
straggler (one task holding ~the hot key's whole mass); the salted path
must stay within a small constant of perfectly balanced.  AQE and
auto-broadcast are disabled inside these tests so the measurement sees the
raw exchange, not an adaptive rescue.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from bulkfhirloader_spark.operators.skew import salted_count_distinct, salted_join

N_ROWS = 1_000_000
HOT_FRAC = 0.9


@contextlib.contextmanager
def _raw_exchanges(spark):
    """Pin confs so the measured distribution is the static plan's."""
    saved = {}
    overrides = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    for k, v in overrides.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed(spark):
    """~90% of rows on key 'hot', the rest uniform over ~10k cold keys."""
    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 10 < int(HOT_FRAC * 10), F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 10007).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )


def _task_balance(df):
    """(max, mean) rows per output task of the df's executed plan."""
    counts = [
        r["n"]
        for r in df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    return max(counts), sum(counts) / len(counts)


def test_salted_join_bounds_hot_key_task_rows(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", 0) for i in range(10007)], "k string, flag int"
    )
    with _raw_exchanges(spark):
        mx, mean = _task_balance(left.join(right, "k"))
        assert mx / mean > 3.0, (
            f"unsalted baseline should straggle (max {mx} / mean {mean:.0f}) — "
            "if this fails the planted skew no longer stresses anything"
        )
        mx_s, mean_s = _task_balance(salted_join(left, right, "k", num_salts=128))
        assert mx_s / mean_s <= 1.7, (  # 128 hot-key combos over 8 tasks
            f"salted join task imbalance {mx_s}/{mean_s:.0f} exceeds bound"
        )
        # same answer as the plain join
        n_plain = left.join(right, "k").count()
        n_salted = salted_join(left, right, "k", num_salts=128).count()
        assert n_plain == n_salted == N_ROWS


def test_salted_count_distinct_stage1_is_balanced(spark):
    df = _skewed(spark)
    with _raw_exchanges(spark):
        # the skew-prone stage is the per-key distinct reduction; measure its
        # exchange directly via the stage-1 grouping the operator uses
        salt = F.pmod(F.xxhash64("v"), F.lit(64)).alias("_salt")
        stage1 = df.groupBy("k", salt).agg(F.count_distinct("v").alias("d"))
        mx, mean = _task_balance(stage1)
        # (key, salt) groups: hot key spreads over 64 buckets across 8 tasks
        assert mx / mean <= 2.0, f"salted stage-1 imbalance {mx}/{mean:.0f}"
        got = {
            r["k"]: r["n_distinct"]
            for r in salted_count_distinct(df, ["k"], "v").collect()
            if r["k"] == "hot"
        }
        assert got["hot"] == int(N_ROWS * HOT_FRAC)  # exact, not approximate


def test_compact_partitions_splits_hot_day(spark, tmp_path):
    """A store where one day holds 90% of rows: compaction must spread the
    hot day over many tasks (≈ rows/target), never one."""
    from bulkfhirloader_spark.sources.partitioned import compact_partitions

    n = 200_000
    target = 10_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(19723)).otherwise(
            (F.lit(19724) + F.col("id") % 20).cast("int")
        ).alias("event_day"),
        F.col("id").alias("v"),
    )
    path = str(tmp_path / "store")
    df.write.partitionBy("event_day").parquet(path)
    with _raw_exchanges(spark):
        plan = compact_partitions(
            spark, path, target_rows_per_file=target, partition_col="event_day"
        )
        mx, mean = _task_balance(plan)
    # hot day = 180k rows / 10k target = 18 slots; repartitionByRange keys on
    # (day, slot) so no task holds more than ~one slot of one day
    assert mx <= 2.5 * target, f"hot-day task holds {mx} rows (target {target})"
    assert plan.count() == n
