"""Targeted unit tests for round-8 operator semantics the sf0.01
oracle-parity sweep can't isolate: dominance edge cases, interpolation
conventions, recursion state, and proration reconciliation."""

from __future__ import annotations

import pytest

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.functions import udfs
from simple_land_registry_data_ingestion_spark.operators import relational
from tests.conftest import SF_ORACLE


def _write_parts(tmp_path, rows):
    d = tmp_path / "data"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table(rows), str(d / "part.parquet"))
    return str(d)


def test_skyline_keeps_equal_points_and_prunes_dominated(spark, tmp_path):
    """Planted 2-D dominance: equal (price,size) duplicates collapse to
    ONE skyline row with n_parts=2 (mutually non-dominated); a point
    beaten on one axis and tied on the other is dominated; cross-bucket
    domination (cheaper bucket, larger size) prunes too."""
    sf = _write_parts(
        tmp_path,
        {
            "p_partkey": [1, 2, 3, 4, 5, 6],
            "p_name": ["a"] * 6,
            "p_brand": ["B"] * 6,
            "p_type": ["t"] * 6,
            # (10.0, 50) twice -> one skyline row, n_parts 2
            # (10.0, 40): same price, smaller size -> dominated
            # (250.0, 60): pricier but larger -> skyline
            # (250.0, 50): tied size with a strictly cheaper point
            #              (cross-bucket: floor(10/100)=0 < 2) -> dominated
            # (5.0, 10): cheapest -> skyline
            "p_size": [50, 50, 40, 60, 50, 10],
            "p_retailprice": [10.0, 10.0, 10.0, 250.0, 250.0, 5.0],
        },
    )
    rows = {
        (float(r["p_retailprice"]), r["p_size"]): r["n_parts"]
        for r in relational.part_skyline_pareto(spark, sf).collect()
    }
    assert rows == {(10.0, 50): 2, (250.0, 60): 1, (5.0, 10): 1}


def test_gini_zero_for_equal_and_known_for_planted(spark, tmp_path):
    """A segment where every customer has identical revenue must Gini to
    (n-1)/n - 1 + 1/n = 0 exactly; the 2-customer planted case (1, 3)
    gives the closed form (2*1*1 + 2*2*3 - 3*4) / (2*4) = 0.25."""
    d = tmp_path / "data"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_custkey": [1, 2, 3, 4],
                "o_orderstatus": ["F"] * 4,
                "o_totalprice": [100.0, 100.0, 1.0, 3.0],
                "o_orderdate": [None] * 4,
                "o_orderpriority": ["5-LOW"] * 4,
            },
            schema=pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("o_orderstatus", pa.string()),
                    ("o_totalprice", pa.float64()),
                    ("o_orderdate", pa.timestamp("us")),
                    ("o_orderpriority", pa.string()),
                ]
            ),
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": [1, 2, 3, 4],
                "c_name": ["c"] * 4,
                "c_nationkey": [0] * 4,
                "c_acctbal": [0.0] * 4,
                "c_mktsegment": ["EQ", "EQ", "SKEW", "SKEW"],
            },
            schema=pa.schema(
                [
                    ("c_custkey", pa.int64()),
                    ("c_name", pa.string()),
                    ("c_nationkey", pa.int32()),
                    ("c_acctbal", pa.float64()),
                    ("c_mktsegment", pa.string()),
                ]
            ),
        ),
        str(d / "customer.parquet"),
    )
    out = {
        r["segment"]: r["gini"]
        for r in relational.customers_gini_concentration(spark, str(d)).collect()
    }
    assert out["EQ"] == 0.0
    assert out["SKEW"] == 0.25


def test_gap_fill_linear_interior_and_edge_carry(spark, tmp_path):
    """A planted 5-hour series with hours 1 and 2 missing for one type:
    interior gaps interpolate linearly between the bracketing counts
    (10 at h0, 40 at h3 -> 20, 30); a leading gap carries the next
    observation back."""
    import datetime as dt

    d = tmp_path / "data"
    d.mkdir(exist_ok=True)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # type A: 10 events at hour 0, 40 at hour 3, 5 at hour 4
    for n, h in ((10, 0), (40, 3), (5, 4)):
        rows += [(f"A", base + dt.timedelta(hours=h, seconds=i)) for i in range(n)]
    # type B: present only from hour 1 (edge bfill for hour 0)
    for n, h in ((7, 1), (7, 2), (7, 3), (7, 4)):
        rows += [("B", base + dt.timedelta(hours=h, seconds=i)) for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "event_id": list(range(len(rows))),
                "ts": [r[1] for r in rows],
                "user_id": [0] * len(rows),
                "event_type": [r[0] for r in rows],
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            },
            schema=pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            ),
        ),
        str(d / "events.parquet"),
    )
    out = {
        (r["event_type"], r["hr"].hour): (r["was_gap"], r["filled"])
        for r in relational.events_gap_fill_interpolate(spark, str(d)).collect()
    }
    assert out[("A", 0)] == (False, 10.0)
    assert out[("A", 1)] == (True, 20.0)   # 10 + (40-10)*1/3
    assert out[("A", 2)] == (True, 30.0)   # 10 + (40-10)*2/3
    assert out[("A", 3)] == (False, 40.0)
    assert out[("B", 0)] == (True, 7.0)    # leading gap -> bfill
    assert out[("B", 1)] == (False, 7.0)


def test_ewma_crossover_counts_strict_sign_flips():
    """Unit-level fold: a series that rises then falls crosses twice;
    touch-and-go equality (f == s) must NOT count as a crossing."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_type": ["t"] * 6,
            "hr": list(range(6)),
            "c": [10.0, 30.0, 30.0, 1.0, 1.0, 1.0],
        }
    )
    out = udfs._ewma_group(pdf).iloc[0]
    # rise: fast pulls above slow (+1); crash: fast dives below (-1)
    assert out["n_crossings"] == 1
    assert out["n_hours"] == 6

    flat = pd.DataFrame(
        {"event_type": ["t"] * 3, "hr": [0, 1, 2], "c": [5.0, 5.0, 5.0]}
    )
    out2 = udfs._ewma_group(flat).iloc[0]
    # constant series: f == s throughout -> sign stays 0, no crossings
    assert out2["n_crossings"] == 0


def test_page_hinkley_alarm_latch_and_first_index():
    """A flat series then a level shift: the PH statistic accumulates
    (x - mu - delta) and alarms once the lift exceeds lambda; the first
    alarm index is 1-based and stable."""
    import pandas as pd

    xs = [10.0] * 50 + [40.0] * 20
    mu = sum(xs) / len(xs)
    pdf = pd.DataFrame(
        {
            "event_type": ["t"] * len(xs),
            "hr": list(range(len(xs))),
            "c": xs,
            "mu": [round(mu, 6)] * len(xs),
        }
    )
    out = udfs._ph_group(pdf).iloc[0]
    assert out["n_alarms"] > 0
    assert 50 < out["first_alarm_at"] <= 70
    assert out["ph_stat"] > 50.0


def test_interval_overlap_reconciles_to_300_per_event(spark):
    """Proration identity on the real fixture: every event contributes
    exactly 300 seconds across bands, so the band totals must sum to
    300 * n_events."""
    df = relational.join_interval_overlap_weighted(spark, SF_ORACLE)
    total = df.agg(F.sum("total_overlap_seconds")).first()[0]
    n = 10000  # sf0.01 events row count
    assert total == 300 * n
