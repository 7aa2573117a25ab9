"""Driver-mimic comparison: Spark DataFrame vs DuckDB oracle SQL.

Replicates the driver's t2 gate (row-count + column names + order-insensitive
value compare) so oracle drift is caught locally before a round lands.
"""

from __future__ import annotations

import datetime
import decimal
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


_KIND = {
    bool: "bool", int: "int", float: "float", str: "str",
    bytes: "bytes", bytearray: "bytes",
    datetime.datetime: "datetime", datetime.date: "date",
    list: "seq", tuple: "seq",
    decimal.Decimal: "DECIMAL",
}


def _column_kinds(columns: list[str], rows: list[tuple]) -> dict[str, set]:
    kinds: dict[str, set] = {c: set() for c in columns}
    for row in rows:
        for c, v in zip(columns, row):
            if v is not None:
                kinds[c].add(_KIND.get(type(v), type(v).__name__))
    return kinds


def _assert_output_contract(side: str, columns: list[str], rows: list[tuple]) -> dict:
    """No DECIMAL may cross the output boundary (r10 fragility verdict:
    every r08/r09 driver-red query — and ONLY those — had a Decimal
    output cell whose canonical string differs from its float repr; the
    driver's hash treats Decimal asymmetrically across engines).  BIGINT,
    DOUBLE, STRING, BOOL, DATE and TIMESTAMP outputs are all proven
    driver-green."""
    kinds = _column_kinds(columns, rows)
    bad = sorted(c for c, k in kinds.items() if "DECIMAL" in k)
    assert not bad, (
        f"{side} emits DECIMAL output column(s) {bad} — cast to DOUBLE or "
        f"BIGINT at the output boundary (driver-fragile class, r10 verdict)"
    )
    return kinds


def compare_query(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert the Spark result and the oracle result match."""
    # schema-level decimal ban (catches all-NULL decimal columns the
    # value-level scan below cannot see)
    dec_fields = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.simpleString().startswith("decimal")
    ]
    assert not dec_fields, (
        f"spark schema emits DecimalType column(s) {dec_fields} — cast to "
        f"DOUBLE or BIGINT at the output boundary (r10 output contract)"
    )
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    o_cols = [d[0] for d in rel.description]
    o_rows = [tuple(r) for r in rel.fetchall()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    s_kinds = _assert_output_contract("spark", s_cols, s_rows)
    o_kinds = _assert_output_contract("oracle", o_cols, o_rows)
    for c in s_cols:
        sk, ok = s_kinds[c], o_kinds[c]
        if sk and ok:
            assert sk == ok, (
                f"type-kind mismatch on column {c!r}: spark={sk} oracle={ok} "
                f"(driver hashes these differently even when numerically equal)"
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
