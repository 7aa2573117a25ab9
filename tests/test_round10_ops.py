"""Targeted unit tests for round-10 operator semantics the sf0.01
oracle-parity sweep can't isolate: closed-form circular statistics on a
planted clock, Lorenz-asymmetry classification at the mean boundary,
turning-point counting with ties, length-bucket edges, and burstiness
signs on clockwork vs clumped cadences."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq

from simple_land_registry_data_ingestion_spark.functions import text as text_fns
from simple_land_registry_data_ingestion_spark.operators import relational


def _write(tmp_path, table, rows):
    d = tmp_path / "data"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table(rows), str(d / f"{table}.parquet"))
    return str(d)


def _events(tmp_path, types, ts, values=None):
    n = len(types)
    return _write(
        tmp_path,
        "events",
        {
            "event_id": list(range(n)),
            "ts": ts,
            "user_id": [1] * n,
            "event_type": types,
            "value": values or [1.0] * n,
            "props": ["{}"] * n,
        },
    )


def _orders(tmp_path, custkeys, dates, prices):
    n = len(custkeys)
    return _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": list(range(1, n + 1)),
            "o_custkey": custkeys,
            "o_orderstatus": ["F"] * n,
            "o_totalprice": prices,
            "o_orderdate": dates,
            "o_orderpriority": ["1-URGENT"] * n,
        },
    )


def _customers(tmp_path, custkeys, segments):
    return _write(
        tmp_path,
        "customer",
        {
            "c_custkey": custkeys,
            "c_name": [f"c{k}" for k in custkeys],
            "c_nationkey": [0] * len(custkeys),
            "c_acctbal": [0.0] * len(custkeys),
            "c_mktsegment": segments,
        },
    )


def test_circular_stats_single_hour_is_fully_concentrated(spark, tmp_path):
    """All events in one hour -> resultant_r == 1 (a point mass on the
    clock face), peak_share == 1, peak_hour is that hour."""
    sf = _events(
        tmp_path, ["click"] * 5, ["2024-01-01T07:10:00"] * 5
    )
    row = relational.events_circular_hour_stats(spark, sf).collect()[0]
    assert row.peak_hour == 7
    assert row.peak_share == 1.0
    assert abs(row.resultant_r - 1.0) < 1e-9


def test_circular_stats_antipodal_hours_cancel(spark, tmp_path):
    """Equal mass at hour 3 and hour 15 (opposite clock points) -> the
    resultant vector cancels to ~0 while a linear mean would report a
    meaningless 9 o'clock."""
    sf = _events(
        tmp_path,
        ["click"] * 6,
        ["2024-01-01T03:00:00"] * 3 + ["2024-01-01T15:00:00"] * 3,
    )
    row = relational.events_circular_hour_stats(spark, sf).collect()[0]
    assert row.resultant_r < 1e-6
    assert row.peak_hour == 3  # tie broken by hour asc


def test_lorenz_asymmetry_uniform_revenue(spark, tmp_path):
    """Equal revenues: every customer sits EXACTLY at the mean, so the
    Damgaard-Weiner half-weight (r10 ADVICE) puts e/2n = 0.5 into both
    F(mu) and L(mu) -> the conventional S = 1 (perfect equality), not
    the strict-test's misleading 0; n_below_mean stays the strict
    count (0)."""
    sf = _orders(
        tmp_path, [1, 2, 3], ["2024-01-01"] * 3, [100.0, 100.0, 100.0]
    )
    _customers(tmp_path, [1, 2, 3], ["AUTO"] * 3)
    row = relational.orders_lorenz_asymmetry(spark, sf).collect()[0]
    assert row.n_below_mean == 0
    assert row.share_below == 0.5
    assert row.lorenz_s == 1.0


def test_lorenz_asymmetry_whale(spark, tmp_path):
    """Revenues (1, 1, 1, 97): mean 25, three below holding 3% ->
    F(mu) = 0.75, L(mu) = 0.03, S = 0.78."""
    sf = _orders(
        tmp_path,
        [1, 2, 3, 4],
        ["2024-01-01"] * 4,
        [1.0, 1.0, 1.0, 97.0],
    )
    _customers(tmp_path, [1, 2, 3, 4], ["AUTO"] * 4)
    row = relational.orders_lorenz_asymmetry(spark, sf).collect()[0]
    assert row.n_cust == 4 and row.n_below_mean == 3
    assert row.share_below == 0.03
    assert row.lorenz_s == 0.78


def test_turning_points_alternating_series(spark, tmp_path):
    """An alternating hourly series turns at EVERY interior point:
    counts 1,3,1,3,1 over five hours -> n_turning = 3 = n - 2, and the
    z-score is positive (over-oscillating)."""
    ts = []
    counts = [1, 3, 1, 3, 1]
    for h, c in enumerate(counts):
        ts += [f"2024-01-01T{h:02d}:15:00"] * c
    sf = _events(tmp_path, ["click"] * len(ts), ts)
    row = relational.events_turning_points(spark, sf).collect()[0]
    assert row.n_hours == 5
    assert row.n_turning == 3
    assert row.expected_x3 == 6  # 3*E[T] = 2(n-2)
    n = 5.0
    z = (3.0 - 2.0 * (n - 2.0) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
    assert abs(row.z_score - round(z, 6)) < 1e-9


def test_turning_points_plateau_is_not_a_turn(spark, tmp_path):
    """Strictness: 1,2,2,1 has no STRICT peak (the plateau breaks both
    inequalities) -> n_turning = 0."""
    ts = []
    for h, c in enumerate([1, 2, 2, 1]):
        ts += [f"2024-01-01T{h:02d}:15:00"] * c
    sf = _events(tmp_path, ["click"] * len(ts), ts)
    row = relational.events_turning_points(spark, sf).collect()[0]
    assert row.n_turning == 0


def test_length_spectrum_bucket_edges(spark, tmp_path):
    """Documents of 1, 2, 3 and 4 tokens land in buckets 1, 2, 2, 4 —
    the power-of-two lower bounds, exact at the boundaries."""
    sf = _write(
        tmp_path,
        "documents",
        {
            "doc_id": [1, 2, 3, 4],
            "source": ["s"] * 4,
            "text": ["a", "a b", "a b c", "a b c d"],
            "lang": ["en"] * 4,
            "published_at": ["2024-01-01T00:00:00"] * 4,
        },
    )
    rows = {
        r.bucket_lo: r
        for r in text_fns.text_length_spectrum(spark, sf).collect()
    }
    assert rows[1].n_docs == 1 and rows[1].total_tokens == 1
    assert rows[2].n_docs == 2 and rows[2].total_tokens == 5
    assert rows[4].n_docs == 1 and rows[4].total_tokens == 4
    assert rows[2].doc_share == 0.5


def test_burstiness_clockwork_vs_clumped(spark, tmp_path):
    """A perfectly regular cadence (gaps 10,10,10) has cv = 0 -> B = -1;
    a clumped one (1,1,28) has cv > 1 -> B > 0 and counts as bursty."""
    dates_reg = ["1992-01-11", "1992-01-21", "1992-01-31", "1992-02-10"]
    dates_burst = ["1992-01-11", "1992-01-12", "1992-01-13", "1992-02-10"]
    sf = _orders(
        tmp_path,
        [1, 1, 1, 1, 2, 2, 2, 2],
        dates_reg + dates_burst,
        [10.0] * 8,
    )
    _customers(tmp_path, [1, 2], ["REG", "BURST"])
    rows = {
        r.segment: r
        for r in relational.orders_interarrival_burstiness(spark, sf).collect()
    }
    assert rows["REG"].mean_burstiness == -1.0
    assert rows["REG"].n_bursty == 0
    assert rows["BURST"].mean_burstiness > 0
    assert rows["BURST"].n_bursty == 1


def test_hits_final_plan_has_no_key_shuffle(spark):
    """The r10 HITS rewrite pre-partitions the edge list once per side
    and broadcasts the node-sized score frames, so the visible plan
    (everything downstream of the round checkpoints) must contain no
    SortMergeJoin and no hashpartitioning exchange — only the 1-row
    max-normalize broadcasts and the top-k sorts."""
    from simple_land_registry_data_ingestion_spark.operators import mining
    from tests.conftest import SF_SMALL

    df = mining.graph_hits_scores(spark, SF_SMALL)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "SortMergeJoin" not in plan, plan
    assert "hashpartitioning" not in plan, plan


def test_simhash_single_fold_plan_shape(spark):
    """The r10 single-fold fingerprint must stay ONE aggregate: the plan
    contains exactly one 'aggregate(' HOF application per row (the
    16-element array accumulator), not sixteen — a regression to the
    64-fold or 16-fold form re-inflates driver codegen by seconds."""
    from simple_land_registry_data_ingestion_spark.operators import dedup
    from tests.conftest import SF_ORACLE

    df = dedup.dedup_simhash(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("aggregate(") <= 2, (
        f"fingerprint fold count regressed: {plan.count('aggregate(')}"
    )
