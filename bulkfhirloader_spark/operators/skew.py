"""Skew-safe aggregation patterns.

Plain ``count_distinct`` per key shuffles every (key, value) pair to the
key's single reducer: one hot key (an event_type with billions of distinct
users) becomes a straggler partition that dominates the stage.  Salting
splits each key into sub-buckets KEYED BY THE VALUE HASH, so every distinct
value lands in exactly one bucket — the per-bucket distinct counts are
disjoint and their sum is EXACT, not approximate.  Both stages then shuffle
uniformly-sized groups regardless of key skew.

(Skewed JOINS are handled separately by AQE's skew-join splitting, enabled
in session.get_spark; this module covers the aggregation side AQE doesn't
rebalance.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    num_salts: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct-count per key via value-hash salting.

    Stage 1 groups by (key, xxhash64(value) % num_salts) with a per-bucket
    count_distinct — at most ~|distinct values| / num_salts values per
    group, uniformly.  Stage 2 sums the disjoint bucket counts per key.
    """
    salt = F.pmod(F.xxhash64(value_col), F.lit(num_salts)).alias("_salt")
    stage1 = df.groupBy(*key_cols, salt).agg(
        F.count_distinct(value_col).alias("_bucket_distinct")
    )
    return stage1.groupBy(*key_cols).agg(
        F.sum("_bucket_distinct").cast("long").alias(out_col)
    )
