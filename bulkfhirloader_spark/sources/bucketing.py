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

import hashlib

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


def bucketed_table_name(prefix: str, path: str) -> str:
    """Deterministic catalog name for an external bucketed table at
    ``path`` — content-addressed by the path so two stores can't collide
    and the same store always seeds one name.  Stores RECORD the name in
    their meta at creation; readers use the recorded name (this derivation
    only seeds it)."""
    return f"{prefix}_{hashlib.md5(path.encode('utf-8')).hexdigest()[:12]}"


def register_external_bucketed_table(
    spark,
    table: str,
    data_path: str,
    bucket_col: str,
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> str:
    """(Re-)attach the external bucketed parquet table at ``data_path`` to
    THIS session's catalog without touching any data — the restart case
    bucketed layouts exist for: a fresh session (new cluster, new driver)
    issues one CREATE TABLE ... CLUSTERED BY ... LOCATION and immediately
    gets the Exchange-free joins and bucket-pruned probes the layout was
    written for; no rewrite, no cache fill.

    Idempotent: if the catalog already holds ``table`` it is verified to
    point at ``data_path`` (a different location under the same name
    raises — silently reading a different store's files is the worst
    failure mode).  Column DDL is derived from the parquet footers at
    ``data_path``.  Returns the table name."""
    qualified = _fs_qualified(spark, data_path)
    if spark.catalog.tableExists(table):
        loc = _table_location(spark, table)
        if loc is not None and loc.rstrip("/") != qualified.rstrip("/"):
            raise ValueError(
                f"catalog already holds table `{table}` at location {loc}, "
                f"but this store expects {qualified} — refusing to serve "
                f"one store's reads from another store's files"
            )
        return table
    schema = spark.read.parquet(data_path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    sorted_by = (
        f"SORTED BY ({', '.join(f'`{c}`' for c in sort_cols)}) " if sort_cols else ""
    )
    spark.sql(
        f"CREATE TABLE `{table}` ({cols}) USING PARQUET "
        f"CLUSTERED BY (`{bucket_col}`) {sorted_by}"
        f"INTO {int(num_buckets)} BUCKETS "
        f"LOCATION '{data_path}'"
    )
    return table


def _fs_qualified(spark, path: str) -> str:
    """``path`` fully qualified by the session's Hadoop filesystem (the
    same normalization the catalog applies to LOCATION), so location
    equality checks compare like with like."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.makeQualified(hpath).toString()


def _table_location(spark, table: str) -> str | None:
    """The catalog table's storage location, or None if not reported."""
    for r in spark.sql(f"DESCRIBE FORMATTED `{table}`").collect():
        if (r["col_name"] or "").strip() == "Location":
            return (r["data_type"] or "").strip()
    return None
