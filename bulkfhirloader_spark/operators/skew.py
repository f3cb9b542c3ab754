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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join by explicit key salting: the left (large, skewed)
    side gets a random-uniform salt derived from ITS OWN ROW (hash of all
    columns — deterministic, no rand()), the right side is replicated once
    per salt value, and the join runs on (key, salt).  A hot key's rows now
    spread over ``num_salts`` reducers instead of one straggler partition.

    This is the manual form of what AQE's skew-join splitting does
    adaptively (enabled in session.get_spark); it exists for the cases AQE
    can't rebalance — a skewed BROADCAST-ineligible right side, pre-AQE
    engines, or when the salt must align with a downstream partitioning.
    Cost model: right side shuffle bytes ×num_salts (keep num_salts modest,
    16-64), left side unchanged.  Join semantics are exactly the plain
    join's for inner/left joins: each left row carries one salt, each right
    row exists under every salt, so every matching pair meets exactly once.

    ``on`` must be a single column name present in both inputs; ``how`` is
    restricted to inner/left (right/outer would need the right side's
    unmatched rows deduped across their num_salts copies).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    all_left_cols = [F.col(c) for c in left.columns]
    salted_left = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*all_left_cols), F.lit(num_salts)).cast("int"),
    )
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = salted_left.join(replicated_right, on=[on, "_salt"], how=how)
    return out.drop("_salt")
