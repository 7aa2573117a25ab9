"""Every queries() entry hash-matches its DuckDB oracle at sf0.01 —
a local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.compare import compare_query, duckdb_connect
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def con():
    con = duckdb_connect(SF_ORACLE)
    yield con
    con.close()


def _query_names():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # every oracle key must have a query
    assert set(o) <= set(q), f"orphan oracles: {set(o) - set(q)}"
    return sorted(o)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, con, name):
    df = entry_mod.queries()[name](spark, SF_ORACLE)
    compare_query(df, con, entry_mod.oracle_sql()[name])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


def test_all_queries_have_oracle_or_are_flagged(spark):
    """Queries without an oracle still must run and return a stable schema."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    for name in set(q) - set(o):
        df = q[name](spark, SF_ORACLE)
        assert df.columns, f"{name} returned no columns"
