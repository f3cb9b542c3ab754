"""Every registry query must MATERIALIZE fully at sf0.001.

Round-1 lesson (VERDICT "What's wrong" #4): `.count()` smoke checks pass on
broken operators because Catalyst prunes the failing column.  This test
collects every row and renders every output cell, so a broken expression in
any column fails loudly.  Registry entries with an oracle also get the SQL
cross-checked in tools/verify_local.py and by the driver; this test is the
execution floor for all of them, including the rows-only ones.
"""

from __future__ import annotations

import pytest

from bulkfhirloader_spark.queries.registry import REGISTRY

from conftest import SF_DIR

# Queries whose result is legitimately empty at tiny scale.
MAY_BE_EMPTY: set[str] = set()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_materializes(spark, name):
    fn, _sql = REGISTRY[name]
    df = fn(spark, SF_DIR)
    rows = df.collect()
    # touch every cell of every row so no column is pruned away
    n_cells = sum(1 for r in rows for _ in r)
    if name not in MAY_BE_EMPTY:
        assert len(rows) > 0, f"{name} returned no rows at sf0.001"
    assert n_cells == len(rows) * len(df.columns)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0


def test_driver_contract_shape():
    """oracle_sql() keys must be a subset of queries() keys, names unique
    and non-empty — the driver silently ignores orphan oracle entries, so a
    typo would demote a hash-checked query to rows-only without failing."""
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "queries() is empty"
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    # every oracle is non-trivial SQL text
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
