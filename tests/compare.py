"""Driver-mimic comparison: Spark DataFrame vs DuckDB oracle SQL.

Replicates the driver's t2 gate (row-count + column names + order-insensitive
value compare) so oracle drift is caught locally before a round lands.
"""

from __future__ import annotations

import datetime
import math

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr-exact (r8 verdict item 6): the driver hashes exact values, so
        # the local gate must not be leakier than the driver's.  repr() keeps
        # full double precision and distinguishes -0.0 from 0.0.
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare_query(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert the Spark result and the oracle result match."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    o_cols = [d[0] for d in rel.description]
    o_rows = [tuple(r) for r in rel.fetchall()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row-count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_norm = normalize(s_cols, s_rows)
    o_norm = normalize(o_cols, o_rows)
    if s_norm != o_norm:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b
        ][:5]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
