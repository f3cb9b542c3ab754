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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the nearest right row within
    the same key group — ``direction="backward"`` (default) takes the
    greatest ``right_ts`` <= ``left_ts`` (at-or-before; a right row at
    exactly ``left_ts`` matches), ``direction="forward"`` the smallest
    ``right_ts`` >= ``left_ts`` (at-or-after — "next scheduled event"
    lookups).  Both directions are the SAME single-Exchange single-Sort
    union+window plan; forward just reverses the within-key sort.

    Returns all left columns plus, per value column ``v``, ``asof_v``, and
    ``asof_ts`` (the matched right timestamp) — all NULL when no right row
    precedes (resp. follows) the left row (left-outer semantics).

    The right side must be unique per (key, right_ts); pre-aggregate
    otherwise (ties at the same timestamp would be order-dependent).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
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
    # right row is visible to the left row (inclusive-equality semantics in
    # both directions).  Backward scans time ascending carrying the latest
    # right row forward; forward scans time DESCENDING carrying the
    # earliest following right row backward.
    ts_order = (
        F.col("_asof_ts").asc() if direction == "backward" else F.col("_asof_ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_is_right").desc())
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


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    build_on: str | None = None,
    n_bits: int = 1 << 20,
    n_hashes: int = 7,
    seed: int = 99,
) -> DataFrame:
    """Semi join with an explicit Bloom-filter runtime prefilter: build a
    bloom over the build side's keys, drop probe rows that cannot match
    MAP-SIDE (before any shuffle of the probe), then exact-verify the
    survivors with a real semi join.  Output is EXACTLY the plain semi
    join — the bloom's false-positive rate only inflates the intermediate,
    never the answer — so the operator is oracle-checkable.

    This is Spark's InjectRuntimeFilter / DPP pattern made explicit and
    tunable: at 100 TB the win is that the probe's shuffle (or its scan,
    once pushed to a bloom-supporting source) carries ~fpp + selectivity of
    the data instead of all of it, while the bloom itself is ``n_bits/8``
    bytes — far smaller than broadcasting the exact key set when the build
    side has hundreds of millions of keys (Spark's own
    ``might_contain``/``bloom_filter_agg`` are not SQL-registered in 4.1,
    so the filter is built from first principles and stays plan-auditable).

    Mechanics, all pure Catalyst expressions under ANSI mode:
    - positions via double hashing ``(h1 + i*h2) mod m`` with both hashes
      pre-reduced mod m so no product can overflow int64;
    - build: explode k positions per key -> (word, bit) -> ``bit_or`` of
      bit masks per 64-bit word (tiny: <= m/64 rows) -> ONE row holding a
      DENSE ``array<long>`` of all m/64 words (missing words zero-filled),
      broadcast;
    - probe: k ``element_at`` lookups + bit tests per row — a zero-shuffle
      projection (the single-row attach is a broadcast nested loop over
      one row, the same shape as the centroid-classify literal attach).

    The dense array is load-bearing for probe cost: Spark's MapType is
    backed by ArrayBasedMapData, whose ``element_at`` is a LINEAR scan of
    the entries — k lookups x m/64 entries per probe row turned the filter
    into O(rows * k * m/64) comparisons (measured 2.3 s of a 3.3 s total at
    sf0.1); array ``element_at`` is O(1) ordinal access (measured ~6x
    faster end-to-end).  Memory cost of density is m/8 bytes — identical
    to any real bloom bitmap — vs the sparse map's win only when the
    filter is nearly empty.
    """
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError("n_bits must be a positive multiple of 64")
    if not (1 <= n_hashes <= 16):
        raise ValueError("n_hashes must be in [1, 16]")
    m = F.lit(n_bits).cast("long")

    def positions(key: Column) -> list[Column]:
        h1 = F.pmod(F.xxhash64(key), m)
        h2 = F.pmod(F.xxhash64(key, F.lit(seed)), m).bitwiseOR(F.lit(1).cast("long"))
        return [F.pmod(h1 + F.lit(i).cast("long") * h2, m) for i in range(n_hashes)]

    keys = build.select(F.col(build_on or on).alias("_k")).dropDuplicates(["_k"])
    # The bloom is built from the RAW key column, not the deduplicated
    # `keys`: bit_or is idempotent, so duplicate keys set the same bits and
    # the filter is bit-identical either way — but routing the build
    # through dropDuplicates first paid a full Exchange + two
    # HashAggregates over every build key just to feed an aggregation that
    # absorbs duplicates for free (guide §2.4: a distinct on data the
    # consumer doesn't need deduplicated).  The explode emits n_hashes
    # rows per RAW key, but the per-word bit_or partially aggregates
    # map-side, so the one shuffle that remains carries at most
    # n_bits/64 rows per task regardless of build-side size or
    # duplication.  `keys` stays deduplicated for the exact-verify semi
    # join below, where its hash partitioning is reused by the join at
    # scale.
    pos = build.select(
        F.explode(F.array(*positions(F.col(build_on or on)))).alias("_p")
    )
    # F.shiftleft only takes a literal shift amount — use the SQL form,
    # which accepts column operands
    words = pos.groupBy(F.floor(F.col("_p") / 64).alias("_w")).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(_p % 64 as int))")).alias("_bits")
    )
    n_words = n_bits // 64
    # densify: one map lookup per word ONCE here (m/64 total) instead of a
    # linear map scan per probe-row lookup — see docstring
    bloom_row = words.agg(
        F.map_from_entries(F.collect_list(F.struct("_w", "_bits"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda w: F.coalesce(F.element_at("_m", w), F.lit(0).cast("long")),
        ).alias("_bf")
    )

    # One projection + one filter instead of 2×n_hashes chained
    # withColumns: each withColumn re-resolves the growing plan on the
    # driver (measured 0.6-2.8 s of per-call build time at n_hashes=7),
    # while the executed plan is identical — Catalyst collapsed the
    # projection chain into this same single Filter either way.  The two
    # shared hashes are materialized once (_h1/_h2); each bit test
    # derives its position inline with exact long arithmetic (`div`/`%`
    # on non-negative longs ≡ the old floor/cast).
    with_pos = (
        probe.crossJoin(F.broadcast(bloom_row))
        .withColumn("_h1", F.pmod(F.xxhash64(F.col(on)), m))
        .withColumn(
            "_h2",
            F.pmod(F.xxhash64(F.col(on), F.lit(seed)), m)
            .bitwiseOR(F.lit(1).cast("long")),
        )
    )
    tests = [
        f"(shiftright(element_at(_bf, cast(pmod(_h1 + {i}L * _h2, {n_bits}L) "
        f"div 64L as int) + 1), cast(pmod(_h1 + {i}L * _h2, {n_bits}L) % 64L "
        f"as int)) & 1L) = 1L"
        for i in range(n_hashes)
    ]
    candidates = with_pos.where(F.expr(" AND ".join(tests))).drop(
        "_bf", "_h1", "_h2"
    )
    # exact verify: NOT broadcast-hinted — the premise is a build side too
    # big to broadcast whole; the shuffle carries only bloom survivors
    # (AQE still auto-broadcasts when the build side turns out small).
    return candidates.join(
        keys.withColumnRenamed("_k", on), on=on, how="left_semi"
    )
