"""Mining + new relational operators: fixed-fixture semantics and
hypothesis checks against plain-Python references.

Every fixture is written to a tmp sf_dir as parquet so the operators run
their real load path; datasets are tiny, assertions exact (or 1e-6 for
double sums)."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simple_land_registry_data_ingestion_spark.operators import mining, relational

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def test_er_blocked_match_pairs_only_within_blocks(spark, tmp_path):
    # same block (noun=widget, Brand#1): 1-2 match (dist 2), 1-3 too far
    # (dist 9 > 4); same noun different brand: 4 never pairs with 1/2/3;
    # different noun same brand: 5 never pairs with anything.
    rows = [
        (1, "red widget", "Brand#1"),
        (2, "redd widget", "Brand#1"),   # dist("red widget")=1 -> match
        (3, "chartreuse widget", "Brand#1"),
        (4, "red widget", "Brand#2"),
        (5, "red gizmo", "Brand#1"),
    ]
    _write(spark, tmp_path, "part", [
        (k, n, b, "ECONOMY", 1, 1.0) for k, n, b in rows
    ], "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double")
    got = {
        (r["p1"], r["p2"]): r["edit_distance"]
        for r in mining.er_blocked_match(spark, str(tmp_path)).collect()
    }
    assert got == {(1, 2): 1}


def test_basket_part_pairs_support_and_lift(spark, tmp_path):
    # 4 orders; parts 10&20 co-occur in orders 1,2 (support 2/4);
    # part 10 in 3 orders, part 20 in 2, part 30 only once with 10.
    li = []
    baskets = {1: [10, 20], 2: [10, 20, 30], 3: [10], 4: [40]}
    for o, parts in baskets.items():
        for i, p in enumerate(parts):
            li.append((o, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
                       datetime.datetime(2024, 1, 1)))
    _write(spark, tmp_path, "lineitem", li,
           "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
           "l_quantity double, l_extendedprice double, l_discount double, "
           "l_tax double, l_returnflag string, l_linestatus string, "
           "l_shipdate timestamp")
    got = {
        (r["part_a"], r["part_b"]): (r["pair_orders"], r["support"], r["lift"])
        for r in mining.basket_part_pairs(spark, str(tmp_path)).collect()
    }
    # lift(10,20) = (2 * 4) / (3 * 2)
    assert got == {(10, 20): (2, 0.5, round(8 / 6, 6))}


@settings(**_SETTINGS)
@given(
    seqs=st.lists(
        st.lists(st.floats(0.1, 100.0, allow_nan=False), min_size=1, max_size=12),
        min_size=1,
        max_size=5,
    )
)
def test_ema_closed_form_matches_recursion(spark, tmp_path, seqs):
    """The one-window closed form must equal the textbook recursion
    s_i = a*x_i + (1-a)*s_{i-1}, s_1 = x_1, per user."""
    rows, expected = [], {}
    eid = 0
    for u, values in enumerate(seqs):
        s = values[0]
        for i, v in enumerate(values):
            if i:
                s = 0.3 * v + 0.7 * s
            rows.append((eid, datetime.datetime(2024, 1, 1, 0, 0, i), u, "view", float(v), "{}"))
            eid += 1
        expected[u] = s
    _write(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    got = {
        r["user_id"]: r["ema_value"]
        for r in relational.events_ema_decay(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(expected)
    for u, s in expected.items():
        assert got[u] == pytest.approx(s, abs=2e-6)


def test_attribution_last_touch_ordering_and_direct(spark, tmp_path):
    mk = datetime.datetime
    rows = [
        # user 1: click then view then purchase -> credited to view
        (1, mk(2024, 1, 1, 0, 0), 1, "click", 1.0, "{}"),
        (2, mk(2024, 1, 1, 0, 1), 1, "view", 1.0, "{}"),
        (3, mk(2024, 1, 1, 0, 2), 1, "purchase", 50.0, "{}"),
        # user 2: purchase with no prior touch -> direct; the click AFTER
        # must not count
        (4, mk(2024, 1, 2, 0, 0), 2, "purchase", 20.0, "{}"),
        (5, mk(2024, 1, 2, 0, 1), 2, "click", 1.0, "{}"),
        # user 2 second purchase -> credited to that click
        (6, mk(2024, 1, 2, 0, 2), 2, "purchase", 30.0, "{}"),
        # same-ts tie: event_id orders click(7) before purchase(8)
        (7, mk(2024, 1, 3, 0, 0), 3, "click", 1.0, "{}"),
        (8, mk(2024, 1, 3, 0, 0), 3, "purchase", 10.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    got = {
        r["channel"]: (r["purchases"], r["revenue"])
        for r in relational.events_attribution_last_touch(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        "view": (1, 50.0),
        "direct": (1, 20.0),
        "click": (2, 40.0),
    }


def test_profile_expectations_flags_planted_violations(spark, tmp_path):
    mk = datetime.datetime
    _write(spark, tmp_path, "orders",
           [(1, 1, "O", 10.0, mk(2024, 1, 1), "1-URGENT"),
            (1, 2, "O", 20.0, mk(2024, 1, 2), "1-URGENT"),   # dup pk
            (2, 99, "O", 30.0, mk(2024, 1, 3), "1-URGENT")],  # orphan cust
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    _write(spark, tmp_path, "customer",
           [(1, "Customer#1", 0, 1.0, "BUILDING"),
            (2, "Customer#2", 0, 1.0, "BUILDING")],
           "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
           "c_mktsegment string")
    _write(spark, tmp_path, "lineitem",
           [(1, 10, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", mk(2024, 1, 1)),
            (7, 10, 1, 1, 99.0, 1.0, 0.0, 0.0, "N", "O", mk(2024, 1, 1))],
           # orderkey 7 is an orphan; quantity 99 out of range
           "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
           "l_quantity double, l_extendedprice double, l_discount double, "
           "l_tax double, l_returnflag string, l_linestatus string, "
           "l_shipdate timestamp")
    _write(spark, tmp_path, "events",
           [(1, mk(2024, 1, 1), 1, "view", 1.0, "{}")],
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    _write(spark, tmp_path, "documents",
           [(1, "abc", "en", "src0", 3), (2, "abc", "en", "src0", 99)],
           "doc_id long, text string, lang string, source string, n_chars long")
    got = {
        r["expectation"]: (r["n_checked"], r["n_failed"], r["passed"])
        for r in relational.profile_expectations(spark, str(tmp_path)).collect()
    }
    assert got["orders_pk_unique"] == (3, 1, False)
    assert got["lineitem_fk_orders"] == (2, 1, False)
    assert got["orders_fk_customer"] == (3, 1, False)
    assert got["lineitem_quantity_1_to_50"] == (2, 1, False)
    assert got["events_ts_not_null"] == (1, 0, True)
    assert got["events_value_positive"] == (1, 0, True)
    assert got["documents_nchars_matches_text"] == (2, 1, False)


def test_er_sorted_neighborhood_gap_bound_and_blocks(spark, tmp_path):
    # noun block "widget" sorted by name:
    #   red widget(1) < redd widget(2) < rede widget(3) < zzz widget(4)
    # every in-window pair clears edit distance <= 4 (zzz is d=3/4/4 from
    # red/redd/rede), so the assertion pins all six gap-bounded pairs.
    rows = [
        (1, "red widget", "Brand#1"),
        (2, "redd widget", "Brand#2"),   # different brand STILL pairs:
        (3, "rede widget", "Brand#1"),   # sorted-neighborhood ignores brand
        (4, "zzz widget", "Brand#1"),
        (5, "red gizmo", "Brand#1"),     # other noun: never pairs with 1-4
    ]
    spark.createDataFrame(
        [(k, n, b, "ECONOMY", 1, 1.0) for k, n, b in rows],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    got = {
        (r["p1"], r["p2"]): (r["rank_gap"], r["edit_distance"])
        for r in mining.er_sorted_neighborhood(spark, str(tmp_path)).collect()
    }
    assert got == {
        (1, 2): (1, 1),
        (1, 3): (2, 1),
        (1, 4): (3, 3),
        (2, 3): (1, 1),
        (2, 4): (2, 4),
        (3, 4): (1, 4),
    }
    # every record compares to at most `neighborhood` successors
    from collections import Counter

    per_left = Counter(p1 for p1, _ in got)
    assert max(per_left.values()) <= 3


@settings(**_SETTINGS)
@given(
    seqs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=15),
        min_size=1,
        max_size=4,
    )
)
def test_activity_islands_match_run_length_encoding(spark, tmp_path, seqs):
    """The rn-difference trick must produce exactly the runs a plain
    run-length encoder finds, per user, regardless of partitioning."""
    rows, expected = [], set()
    eid = 0
    for u, types in enumerate(seqs):
        run_start, run_len = eid, 0
        prev = None
        for t in types:
            if t != prev and run_len:
                expected.add((u, prev, run_len, run_start, eid - 1))
                run_start, run_len = eid, 0
            # constant ts: ordering rides entirely on the event_id tiebreak
            rows.append((eid, datetime.datetime(2024, 1, 1), u, t, 1.0, "{}"))
            prev = t
            run_len += 1
            eid += 1
        expected.add((u, prev, run_len, run_start, eid - 1))
    _write(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    got = {
        (r["user_id"], r["event_type"], r["n_events"],
         r["first_event_id"], r["last_event_id"])
        for r in relational.events_activity_islands(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == expected


def test_target_encoding_excludes_own_fold(spark, tmp_path):
    """Fold 0's encoding must be the mean of the OTHER folds' targets —
    the whole point of out-of-fold encoding."""
    mk = datetime.datetime
    # one segment, folds 0/1/2 (orderkey % 5), targets 10/20/30
    _write(spark, tmp_path, "orders",
           [(0, 1, "O", 10.0, mk(2024, 1, 1), "x"),
            (1, 1, "O", 20.0, mk(2024, 1, 1), "x"),
            (2, 1, "O", 30.0, mk(2024, 1, 1), "x")],
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    _write(spark, tmp_path, "customer",
           [(1, "Customer#1", 0, 1.0, "BUILDING")],
           "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
           "c_mktsegment string")
    got = {
        r["fold"]: r["oof_mean_totalprice"]
        for r in relational.customers_target_encoding(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {0: 25.0, 1: 20.0, 2: 15.0}


@settings(**_SETTINGS)
@given(
    parts=st.lists(
        st.tuples(st.integers(1, 50), st.integers(1, 50)),
        min_size=1,
        max_size=25,
    )
)
def test_pareto_frontier_matches_dominance_bruteforce(spark, tmp_path, parts):
    """The windowed skyline must equal the O(n²) dominance definition:
    keep p iff no q has (strictly lower price-tick AND size >= p's) —
    with the price-tick RANGE semantics, a strictly-cheaper q with equal
    size also dominates (p must strictly exceed the running max)."""
    rows = [
        (i, f"part {i}", "Brand#1", "ECONOMY", size, price / 10.0)
        for i, (price, size) in enumerate(parts)
    ]
    _write(spark, tmp_path, "part", rows,
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    expected = set()
    for i, (pi, si) in enumerate(parts):
        dominated = any(
            pj < pi and sj >= si for j, (pj, sj) in enumerate(parts) if j != i
        )
        if not dominated:
            expected.add(i)
    got = {
        r["p_partkey"]
        for r in relational.parts_pareto_frontier(spark, str(tmp_path)).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    series=st.lists(
        st.tuples(st.integers(0, 10_000), st.floats(0.1, 100.0)),
        min_size=3,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_linear_trend_matches_numpy_reference(spark, tmp_path, series):
    """The sufficient-statistics OLS must match a plain least-squares fit
    computed directly (slope within 1e-3 of the closed form re-derived in
    Python) — and r2 must stay in [0, 1]."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=x), 1, "view", float(y), "{}")
        for i, (x, y) in enumerate(series)
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    xs = [float(x) for x, _ in series]
    ys = [y for _, y in series]
    n = len(xs)
    x0 = min(xs)
    xs = [x - x0 for x in xs]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxx_c = sxx - sx * sx / n
    syy_c = syy - sy * sy / n
    rows_out = relational.events_linear_trend(spark, str(tmp_path)).collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    if sxx_c > 1e-9:
        slope = (sxy - sx * sy / n) / sxx_c
        assert r["slope_per_day"] == pytest.approx(slope * 86400, abs=1e-3)
        assert r["intercept"] == pytest.approx((sy - slope * sx) / n, abs=1e-3)
        if syy_c > 1e-9:
            assert -1e-9 <= r["r2"] <= 1.0 + 1e-9
