"""Temporal join operators the reference lacks entirely (SURVEY §2.4 notes
every reference join is a broadcast equi lookup): as-of join and interval
range join, both expressed in the shapes that survive 100 TB.

Scale design:
- ``asof_join`` is the union + ordered-window formulation: tag both inputs,
  union them, and carry the latest right-side values forward with
  ``last(..., ignorenulls=True)`` over a per-key ordered window.  ONE
  shuffle (hash by key) + ONE sort — no range-fanout join, no per-row probe
  explosion, no skew beyond per-key row counts.  The naive alternative
  (theta join on ``l.ts >= r.ts`` + argmax) plans as a
  BroadcastNestedLoopJoin and dies quadratically.
- ``range_join_binned`` is the bucketed interval join: each left interval
  explodes to the fixed-width bins it overlaps, the right side lands in
  exactly one bin, and the join becomes an EQUI join on (key, bin) that
  Catalyst executes as a shuffled hash / sort-merge join, followed by the
  exact range filter.  Fan-out is bounded by interval_width / bin_width
  (callers pick bin_width ≈ typical interval), never by corpus size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with
    the greatest ``right_ts`` <= ``left_ts`` within the same key group
    (at-or-before semantics — a right row at exactly ``left_ts`` matches).

    Returns all left columns plus, per value column ``v``, ``asof_v``, and
    ``asof_ts`` (the matched right timestamp) — all NULL when no right row
    precedes the left row (left-outer semantics).

    The right side must be unique per (key, right_ts); pre-aggregate
    otherwise (ties at the same timestamp would be order-dependent).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    right_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"asof_{c}") for c in value_cols],
    )
    left_tagged = left.withColumn("_asof_ts", F.col(left_ts)).withColumn(
        "_is_right", F.lit(0)
    )
    unioned = left_tagged.unionByName(right_tagged, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at an equal timestamp so a same-ts
    # right row is visible to the left row (>= semantics).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_asof_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(
            F.when(F.col("_is_right") == 1, F.col("_asof_ts")), ignorenulls=True
        ).over(w).alias("_matched_ts"),
        *[
            F.last(F.col(f"asof_{c}"), ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
    )
    return (
        carried.filter(F.col("_is_right") == 0)
        .select(
            *left.columns,
            F.col("_matched_ts").alias("asof_ts"),
            *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in value_cols],
        )
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_lo: Column,
    left_hi: Column,
    right_point: Column,
    bin_width: int,
) -> DataFrame:
    """Interval join: pairs every left row with the right rows of the same
    key whose ``right_point`` lies in [left_lo, left_hi) — half-open, in
    the same (numeric) units, typically epoch seconds.

    Each right row falls in exactly one bin, so no pair duplicates and no
    post-join distinct.  Returns all left columns + all right columns
    (right columns that collide with a left name are suffixed ``_r``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lw = F.lit(bin_width).cast("long")

    lo = left_lo.cast("long")
    hi = left_hi.cast("long")
    # empty/inverted intervals produce no pairs; dropping them up front also
    # keeps F.sequence from generating a DESCENDING bin range (its behavior
    # when start > stop)
    l_binned = left.filter(hi > lo).select(
        "*",
        lo.alias("_lo"),
        hi.alias("_hi"),
        F.explode(
            F.sequence(F.floor(lo / lw), F.floor((hi - 1) / lw))
        ).alias("_bin"),
    )
    rp = right_point.cast("long")
    rename = {
        c: f"{c}_r" if c in left.columns and c not in keys else c
        for c in right.columns
    }
    r_binned = right.select(
        *[F.col(c).alias(rename[c]) for c in right.columns],
        rp.alias("_pt"),
        F.floor(rp / lw).alias("_bin"),
    )
    joined = l_binned.join(r_binned, keys + ["_bin"]).filter(
        (F.col("_pt") >= F.col("_lo")) & (F.col("_pt") < F.col("_hi"))
    )
    out_cols = [c for c in left.columns] + [
        rename[c] for c in right.columns if c not in keys
    ]
    return joined.select(*out_cols)
