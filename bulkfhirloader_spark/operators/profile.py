"""Table profiling: per-column completeness and cardinality in one pass.

The data-quality step that runs BEFORE a corpus is trusted: null rates
flag broken extraction, cardinality flags key collisions and degenerate
columns.  The reference has no profiling at all (its loader trusts every
bundle field); at 100 TB you cannot eyeball a sample — the profile must be
a single scan.

Scale shape: ONE aggregate over the table produces every column's stats
simultaneously (Spark plans multi-distinct aggregates via Expand — one
pass over the data, one row out), then the single result row is unpivoted
driver-free with ``posexplode``.  The exact-distinct form carries an
Expand factor of n_cols over the scan; the ``exact=False`` form swaps
``count_distinct`` for ``approx_count_distinct`` (HLL++, one pass, no
Expand) — the right default at 100 TB where cardinalities are for triage,
not accounting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact: bool = True,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column: ``column``, ``n_rows``, ``n_nulls``,
    ``n_distinct`` (nulls excluded from the distinct count, SQL semantics).

    ``exact=True`` uses ``count_distinct`` — oracle-checkable, Expand-cost
    n_cols; ``exact=False`` uses HLL++ ``approx_count_distinct`` at
    ``approx_rsd`` — single-pass, the 100 TB default.
    """
    if cols is None:
        cols = df.columns
    if not cols:
        raise ValueError("no columns to profile")
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c), rsd=approx_rsd))
    )
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(distinct(c).alias(f"_nd_{c}"))
    one = df.agg(*aggs)
    stats = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                (F.col("_n_rows") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return one.select(
        F.col("_n_rows").alias("n_rows"), F.explode(stats).alias("_s")
    ).select(
        F.col("_s.column").alias("column"),
        "n_rows",
        F.col("_s.n_nulls").alias("n_nulls"),
        F.col("_s.n_distinct").alias("n_distinct"),
    )


def clip_outliers(
    df: DataFrame,
    value_col: str,
    lower_pct: float = 0.01,
    upper_pct: float = 0.99,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Winsorize a numeric column: clamp values outside the exact
    [lower_pct, upper_pct] percentile band — the outlier treatment applied
    to document lengths / quality scores before they feed selection
    policies (a handful of 2 GB pathological documents otherwise dominate
    any mean-based threshold).

    Scale shape: the two thresholds come from ONE ``percentile`` aggregate
    (Spark's exact implementation — a single reduce, no sort of the full
    column) producing a SINGLE row that broadcasts under a cross join; the
    clamp itself is a zero-shuffle projection.  Exact percentiles keep the
    operator oracle-checkable (DuckDB ``quantile_cont`` interpolates with
    the same linear rule); swap in ``approx_percentile`` at 100 TB if the
    ±rsd wobble is acceptable — the plan shape is identical.
    """
    if not (0.0 <= lower_pct < upper_pct <= 1.0):
        raise ValueError("need 0 <= lower_pct < upper_pct <= 1")
    v = F.col(value_col)
    bounds = df.agg(
        F.percentile(v, F.lit(lower_pct)).alias("_lo"),
        F.percentile(v, F.lit(upper_pct)).alias("_hi"),
    )
    out_cols = [*id_cols, value_col] if id_cols else df.columns
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(
            *out_cols,
            F.col("_lo").alias("lower_bound"),
            F.col("_hi").alias("upper_bound"),
            F.greatest(F.least(v.cast("double"), F.col("_hi")), F.col("_lo")).alias(
                "clipped"
            ),
            (v.cast("double") < F.col("_lo")).alias("was_low"),
            (v.cast("double") > F.col("_hi")).alias("was_high"),
        )
    )


def histogram_equi_width(
    df: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """Equi-width histogram: ONE aggregate pass for (min, max), the 1-row
    bounds broadcast into a zero-shuffle bin projection, then a count on
    n_bins keys (partial aggregation collapses it map-side).  The corpus
    never shuffles — the same two-pass shape as clip_outliers.

    The bin rule — ``least(floor((x - lo) / width), n_bins - 1)`` with
    ``width = (hi - lo) / n_bins`` — is plain double arithmetic in a fixed
    order, so DuckDB restates it bit-identically (its width_bucket doesn't
    exist and Spark's width_bucket differs at the hi edge anyway; the
    explicit formula keeps both engines on one definition: the top edge
    folds into the last bin).

    Spark's own histogram_numeric is NOT used: its bins are
    centroid-based (Ben-Haim/Tom-Tov streaming histogram), approximate and
    merge-order-dependent — fine for plotting, not reproducible.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    c = F.col(col).cast("double")
    bounds = df.agg(
        F.min(c).alias("_lo"), F.max(c).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    # constant column => zero width => (x-lo)/width is 0/0 = NaN (doubles
    # don't throw under ANSI); fold the degenerate case into bin 0
    bin_idx = F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("long")).otherwise(
        F.least(F.floor((c - F.col("_lo")) / width), F.lit(n_bins - 1).cast("long"))
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(bin_idx.alias("bin_idx"))
        .groupBy("bin_idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def top_values(
    df: DataFrame,
    cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """Per-column exact heavy hitters: the ``k`` most frequent values of
    each profiled column with their counts — the profiling companion to
    ``profile_table`` (cardinality says HOW MANY distinct values; this
    says WHICH values dominate — skewed keys, default-value pollution,
    degenerate categoricals).

    Shape: one ``posexplode`` unpivot (col_name, value-as-string) over the
    selected columns → a single (col_name, value) count — ONE exchange
    whose key space is the union of the columns' value sets — → per-column
    top-k via a partitioned window over the (tiny) count table.  Values
    are stringified for the unpivot (profiling semantics, like every
    profiler's output grid); NULLs are reported as the literal
    '<null>' so a null-heavy column's pollution is visible rather than
    dropped by the groupBy.

    Determinism: ties break by value string ascending, so the row set is
    reproducible and ORACLE-RESTATABLE (plain row_number in SQL).

    Scale: the count aggregate collapses map-side; the window runs over
    ~n_cols × cardinality rows, not corpus rows.  For a column whose
    cardinality approaches corpus size (ids), the count table is big but
    uniform — and profiling ids for heavy hitters is exactly when you DO
    want that full count (a hot id is the finding).
    """
    from pyspark.sql import Window

    pairs = F.posexplode(
        F.array(*[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols])
    ).alias("col_idx", "value")
    names = F.array(*[F.lit(c) for c in cols])
    unpivoted = df.select(pairs).select(
        F.element_at(names, F.col("col_idx") + 1).alias("col_name"), "value"
    )
    counts = unpivoted.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("col_name").orderBy(F.col("n").desc(), F.col("value").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("col_name", "value", "n", F.col("rank").cast("int").alias("rank"))
    )


def group_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Exact per-group percentiles of a numeric column — the distribution
    profile stratified by a dimension (per-source doc length, per-type
    event value): one row per group with one column per requested
    percentile (``p50``, ``p90``, ...).

    Shape: ONE ``groupBy(group).agg(percentile(value, array(...)))`` —
    Spark's exact percentile is a sort-based aggregate that collapses
    map-side into per-group sketless exact buffers; the exchange carries
    one buffer per group per input partition.  Exact percentiles buffer a
    group's values, so at 100 TB this is for grouping dimensions whose
    groups fit an executor (sources, languages, event types — the
    profiling case); corpus-scale windows belong to approx_percentile
    (certified by ext_approx_percentile_check's tolerance pattern).

    Linear interpolation matches DuckDB ``quantile_cont`` (the
    ext_winsorize_doclen precedent), so results are oracle-restatable.
    """
    pcts = F.expr(
        f"percentile({value_col}, array({', '.join(str(float(p)) for p in percentiles)}))"
    )
    out_cols = [
        F.round(F.element_at(F.col("_pcts"), i + 1), 6).alias(
            f"p{int(round(p * 100)):02d}"
        )
        for i, p in enumerate(percentiles)
    ]
    return (
        df.groupBy(*group_cols)
        .agg(pcts.alias("_pcts"), F.count(F.lit(1)).alias("n_rows"))
        .select(*group_cols, "n_rows", *out_cols)
    )


def misra_gries_candidates(df: DataFrame, col: str, m: int = 64) -> DataFrame:
    """Bounded heavy-hitter CANDIDATE generation: per-partition Misra-Gries
    with m counters, emitting <= m values per partition — O(m) executor
    state and O(m × partitions) rows through the one exchange, regardless
    of the column's cardinality.  This is the piece that makes one-shot
    sketch queries cheaper than the exact profiler at high cardinality
    (see count_min_heavy_hitters: its default candidate pass is
    O(distinct), same cost class as exact top_values).

    Guarantee (order-independent, classic MG): within a partition holding
    N_p rows, every value with local count > N_p/(m+1) survives; by
    pigeonhole, any value with GLOBAL count > N_total/(m+1) exceeds that
    bound in at least one partition — so the union across partitions is a
    SUPERSET of the true heavy hitters at that frequency, never a miss
    (false positives are filtered by the sketch probe or an exact
    recount).  The survivor set depends on the physical partitioning, so
    this feeds pipelines that re-verify — it does not sit on a
    cross-engine hash path (the registry oracle keeps the deterministic
    exhaustive pass; pytest asserts the superset property instead).

    NULLs are excluded from candidacy (a pandas str-cast would otherwise
    smuggle the literal 'None' into the value space and break the
    superset claim for a null-dominated column); profile null mass with
    the exact null-count stats instead.

    Arrow batches via mapInPandas — a sanctioned vectorized boundary, not
    row-at-a-time Python; the MG dict is maintained across the partition's
    batch iterator (update step factored into _mg_update, property-tested
    driver-side without a Spark session)."""
    import pandas as pd

    spark_schema = "value string"

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            counters = _mg_update(counters, pdf.iloc[:, 0].dropna().astype(str), m)
        yield pd.DataFrame({"value": list(counters.keys())})

    return (
        df.select(F.col(col).cast("string"))
        .where(F.col(col).isNotNull())
        .mapInPandas(mg, schema=spark_schema)
        .distinct()
    )


def _mg_update(counters: dict, values, m: int) -> dict:
    """One Misra-Gries pass over ``values`` into ``counters`` (capacity m).

    Invariants (the property tests pin these):
    - len(counters) <= m always;
    - for every value v, true_count(v) - D <= counter(v) <= true_count(v)
      where D = number of decrement steps <= N/(m+1) — hence every value
      with true count > N/(m+1) is PRESENT in the final dict, in any
      arrival order."""
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < m:
            counters[v] = 1
        else:
            # decrement-all step: drop zeros (dict comp keeps O(m))
            counters = {k: c - 1 for k, c in counters.items() if c > 1}
    return counters


def _cms_bucket_exprs(value_col, seed: str, depth: int, width: int) -> list:
    """The count-min bucket recipe, shared verbatim by the sketch-table
    build and the candidate probe (one definition so the hashing can never
    drift between the two, and so the DuckDB oracle restatement has a
    single source of truth): row i's bucket is
    int(md5(i '/' seed '/' str(value))[:13 hex]) % width."""
    return [
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "/", F.lit(str(i)), F.lit(seed), value_col.cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % width
        for i in range(depth)
    ]


def count_min_heavy_hitters(
    df: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
    min_estimate: int = 10,
    seed: str = "cms0",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Count-min-sketch heavy hitters: estimate per-value frequencies from a
    depth×width counter table and report values whose estimate clears
    ``min_estimate`` — the sketch-tier companion to the exact top_values
    profiler.  The sketch TABLE is a fixed depth×width array at any
    cardinality — the structure you keep incrementally per partition/day
    at 100 TB and merge by cell-wise addition.

    HONEST COST NOTE (r6 verdict): with ``candidates=None`` the candidate
    enumeration is a groupBy over every distinct value — O(distinct), the
    same cost class as the exact profiler, so the ONE-SHOT query cost does
    not beat exact counting.  The default exists because it is
    deterministic and exactly restatable in the DuckDB oracle (the hash
    gate checks the sketch's exact arithmetic).  The operator's production
    win is (a) the reusable/incremental fixed-size table, and (b) the
    bounded probe: pass ``candidates`` (one ``value`` column — e.g. from
    :func:`misra_gries_candidates`, O(m)-state per partition, or
    yesterday's heavy-hitter set) and the query never enumerates the
    distinct values: buckets are a pure projection of the candidate rows
    and the estimate join touches depth broadcast rows per candidate.

    Estimates are the classic min over rows of the hashed-bucket counts:
    always >= the true count, overestimating only via bucket collisions.
    Hashes are md5-derived (row i bucket = int(md5(i/seed/value)[:13]) %
    width) so the WHOLE sketch is deterministically restatable in the
    DuckDB oracle.

    Scale shape: the counter table is built with ONE aggregation whose key
    space is capped at depth×width (partial agg collapses each partition
    to <= that many rows before the exchange); the estimate join touches
    depth rows per candidate against the BROADCAST-sized table."""
    buckets = _cms_bucket_exprs(F.col(col), seed, depth, width)
    hashed = df.select(
        F.col(col).alias("value"),
        *[b.alias(f"_b{i}") for i, b in enumerate(buckets)],
    )
    table = (
        hashed.select(
            F.posexplode(F.array(*[F.col(f"_b{i}") for i in range(depth)])).alias(
                "row_idx", "bucket"
            )
        )
        .groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if candidates is not None:
        # value is cast BACK to the profiled column's type so both modes
        # return an identical schema (MG candidates arrive as strings);
        # buckets are hashed from the same string form either way.
        # UNPARSEABLE candidates — non-null inputs whose try_cast comes
        # back NULL — are DROPPED, not estimated: under ANSI (Spark 4's
        # default) a plain cast would THROW on them mid-job, and under
        # non-ANSI the cast-null would hash as the bare 'i/seed' bucket
        # and alias onto the column's genuine NULL rows, silently
        # reporting the NULL count as the bogus candidate's estimate (r7
        # advisor).  A candidate that is itself NULL stays: it
        # legitimately probes the NULL bucket.
        cand_buckets = _cms_bucket_exprs(F.col("value"), seed, depth, width)
        cands = (
            candidates.select(
                F.col("value").alias("_raw"),
                F.col("value").try_cast(df.schema[col].dataType).alias("value"),
            )
            .filter(F.col("value").isNotNull() | F.col("_raw").isNull())
            .select("value")
            .distinct()
            .select(
                "value", *[b.alias(f"_b{i}") for i, b in enumerate(cand_buckets)]
            )
        )
    else:
        cands = hashed.groupBy("value", *[f"_b{i}" for i in range(depth)]).agg(
            F.count(F.lit(1)).alias("true_n")  # for collision-rate tests; tiny here
        )
    est = cands
    for i in range(depth):
        ti = table.filter(F.col("row_idx") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("n").alias(f"_n{i}")
        )
        est = est.join(F.broadcast(ti), f"_b{i}")
    estimate = F.least(*[F.col(f"_n{i}") for i in range(depth)])
    return (
        est.select("value", estimate.alias("est_count"))
        .filter(F.col("est_count") >= min_estimate)
    )
