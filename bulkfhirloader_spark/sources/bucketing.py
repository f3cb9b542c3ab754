"""Bucketed-table support: co-located, shuffle-free joins at scale.

The reference's only join strategy is a replicated hash map (broadcast);
that works because its dims are tiny.  At 100 TB the big fact-fact joins
(orders ⋈ lineitem shapes) shuffle BOTH sides on every query unless the
tables are written bucketed on the join key: with matching bucket counts
Spark plans a sort-merge join with NO Exchange on either side, and with
``sortBy`` the per-bucket files are pre-sorted so the Sort goes away too.
Write once, join shuffle-free forever — the standard warehouse layout for
repeated large joins (tests/test_plans.py asserts the Exchange-free plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> str:
    """Persist ``df`` as a bucketed (optionally per-bucket-sorted) table.

    ``num_buckets`` must match across tables that will join co-located.
    ``path`` makes it an external table (tests point this at a temp dir);
    without it the session warehouse dir is used.
    """
    w = df.write.format("parquet").mode("overwrite").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return name
