"""Testdata drift guard.

The driver regenerates /root/testdata between rounds; in round 4 it silently
changed events.ts from INT64 TIMESTAMP(NANOS) to plain timestamp[us], which
broke 16 registry queries and the whole bench before anyone noticed.  This
test pins the PHYSICAL parquet schema of every table (checked via pyarrow in
milliseconds, no Spark needed) so the next regeneration fails loudly here,
naming the drifted column — instead of surfacing as 16 cryptic
DATATYPE_MISMATCH errors in the driver's correctness run.

If this test fails after a regeneration: update EXPECTED below AND audit
every consumer of the drifted column (sources/tables.py normalizes events.ts;
registry oracles assume DuckDB reads the same physical type).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# Physical arrow types as of round 5 (2026-08-13 regeneration).  events.ts
# was INT64 TIMESTAMP(NANOS) in rounds 1-3; timestamp[us] since round 4.
# load_events handles both — but anything NEW must be looked at.
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        # Either historical encoding is fine — load_events adapts to both.
        "ts": ("timestamp[us]", "timestamp[ns]"),
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_physical_schema_unchanged(table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    actual = {f.name: str(f.type) for f in pq.read_schema(path)}
    expected = EXPECTED[table]
    assert set(actual) == set(expected), (
        f"testdata drift: {table} columns changed — "
        f"added {sorted(set(actual) - set(expected))}, "
        f"removed {sorted(set(expected) - set(actual))}"
    )
    for col, exp in expected.items():
        allowed = exp if isinstance(exp, tuple) else (exp,)
        assert actual[col] in allowed, (
            f"testdata drift: {table}.{col} is now {actual[col]!r} "
            f"(expected one of {allowed}) — audit every consumer before "
            f"updating EXPECTED (see module docstring)"
        )


def test_events_loader_normalizes_ts(spark):
    """Whatever the physical encoding, load_events must yield TimestampType
    with µs precision so unix_micros/F.window/session_window downstream and
    the DuckDB oracles all agree."""
    from pyspark.sql import types as T

    from bulkfhirloader_spark.sources.tables import load_events

    df = load_events(spark, os.path.join(SF_DIR, "events.parquet"))
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"load_events produced {df.schema['ts'].dataType} — downstream "
        f"consumers require TimestampType"
    )
    # And the values must round-trip: min epoch must be sane (2020s era),
    # catching an accidental ns-as-µs 1000x shift.
    from pyspark.sql import functions as F

    lo, hi = df.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    assert 1_500_000_000_000_000 < lo <= hi < 2_500_000_000_000_000, (
        f"events.ts epoch range [{lo}, {hi}] µs is outside 2017-2049 — "
        f"likely a unit (ns vs µs) regression in load_events"
    )
