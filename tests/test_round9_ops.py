"""Targeted unit tests for round-9 operator semantics the sf0.01
oracle-parity sweep can't isolate: closed-form stats on planted data,
pruning losslessness, cap/contraction invariants, and convergence of the
power iteration on a known spectrum."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.functions import text as text_fns
from simple_land_registry_data_ingestion_spark.operators import (
    dedup,
    mining,
    relational,
    similarity,
)


def _write(tmp_path, table, rows):
    d = tmp_path / "data"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table(rows), str(d / f"{table}.parquet"))
    return str(d)


def _events(tmp_path, types, values, ts=None):
    n = len(values)
    return _write(
        tmp_path,
        "events",
        {
            "event_id": list(range(n)),
            "ts": ts or ["2024-01-01T00:00:00"] * n,
            "user_id": [1] * n,
            "event_type": types,
            "value": values,
            "props": ["{}"] * n,
        },
    )


def test_welch_ttest_closed_form(spark, tmp_path):
    """Two planted arms with known moments: click = (1,2,3),
    purchase = (2,4,6,8) -> means 2 and 5, variances 1 and 20/3;
    t = -3 / sqrt(1/3 + 5/3) = -2.121320...; Welch df from the
    Satterthwaite formula on the same numbers."""
    sf = _events(
        tmp_path,
        ["click"] * 3 + ["purchase"] * 4,
        [1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 8.0],
    )
    row = relational.events_welch_ttest(spark, sf).collect()[0]
    assert row.n_a == 3 and row.n_b == 4
    assert row.mean_a == 2.0 and row.mean_b == 5.0
    sea, seb = 1.0 / 3, (20.0 / 3) / 4
    t = (2.0 - 5.0) / math.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (sea**2 / 2 + seb**2 / 3)
    assert abs(row.t_stat - round(t, 6)) < 1e-9
    assert abs(row.welch_df - round(df, 6)) < 1e-9


def test_anova_f_two_groups_equals_t_squared(spark, tmp_path):
    """With exactly two groups, one-way ANOVA's F equals the POOLED
    t-statistic squared — the classic identity; planted arms (1,2,3)
    vs (4,5,6,7) give F = 49/5 * 12/10 ... checked numerically."""
    sf = _events(
        tmp_path,
        ["click"] * 3 + ["view"] * 4,
        [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
    )
    rows = relational.events_anova_f(spark, sf).collect()
    assert len(rows) == 2
    f = rows[0].f_stat
    # pooled t^2: means 2, 5.5; ssw = 2 + 5 = 7; s2p = 7/5; t^2 =
    # 3.5^2 / (s2p*(1/3+1/4))
    t2 = 3.5**2 / ((7.0 / 5) * (1.0 / 3 + 1.0 / 4))
    assert abs(f - round(t2, 6)) < 1e-6
    assert rows[0].df_between == 1 and rows[0].df_within == 5


def test_nelson_aalen_hazard_table(spark, tmp_path):
    """Three customers: A repeats after 10 days (interval 0), B after
    35 days (interval 1), C never (censors at day 40 -> interval 1).
    Interval 0: 3 at risk, 1 event, hazard 1/3; interval 1: 2 at risk,
    1 event, hazard 1/2; cum_hazard = 1/3 then 5/6."""
    sf = _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_custkey": [1, 1, 2, 2, 3],
            "o_orderstatus": ["F"] * 5,
            "o_totalprice": [10.0] * 5,
            "o_orderdate": [
                "2024-01-01T00:00:00",
                "2024-01-11T00:00:00",
                "2024-01-01T00:00:00",
                "2024-02-05T00:00:00",
                "2024-01-01T00:00:00",
            ],
            "o_orderpriority": ["1-URGENT"] * 5,
        },
    )
    rows = {
        r.interval_idx: r
        for r in relational.orders_nelson_aalen(spark, sf).collect()
    }
    assert rows[0].n_risk == 3 and rows[0].n_event == 1
    assert rows[1].n_risk == 2 and rows[1].n_event == 1
    assert abs(rows[0].cum_hazard - round(1 / 3, 6)) < 1e-9
    assert abs(rows[1].cum_hazard - round(1 / 3 + 1 / 2, 6)) < 1e-9


def test_sax_symbols_and_motif_counts(spark, tmp_path):
    """A planted 8-hour series with two identical low-low-high shapes:
    the quartile symbolization is deterministic (picked order stats)
    and the repeated 3-gram dominates the motif counts."""
    ts = [f"2024-01-01T{h:02d}:30:00" for h in range(8)]
    # hourly counts: 1,1,9,1,1,9,5,3  (each value v -> v events that hour)
    counts = [1, 1, 9, 1, 1, 9, 5, 3]
    types, values, stamps = [], [], []
    for h, c in enumerate(counts):
        for i in range(c):
            types.append("view")
            values.append(1.0)
            stamps.append(ts[h])
    sf = _events(tmp_path, types, values, ts=stamps)
    rows = relational.events_sax_motifs(spark, sf).collect()
    got = {r.motif: r.n_occurrences for r in rows}
    # n=8 hours; picks at ranks floor(9/4)=2, floor(18/4)=4, floor(27/4)=6
    # sorted counts: 1,1,1,1,3,5,9,9 -> q1=1, q2=1, q3=5
    # symbols by hour: a a d a a d c b -> motifs aad, ada, daa, aad, adc, dcb
    assert got["aad"] == 2
    assert sum(got.values()) == 6


def test_partition_skew_uniform_vs_hot(spark, tmp_path):
    """Uniform keys give gini ~0 and top1_share = 1/K; the profiler's
    job is to make a planted hot key visible in top1_share."""
    sf = _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": list(range(100)),
            "o_custkey": [1] * 60 + list(range(2, 42)),
            "o_orderstatus": ["F"] * 100,
            "o_totalprice": [1.0] * 100,
            "o_orderdate": ["2024-01-01T00:00:00"] * 100,
            "o_orderpriority": ["1-URGENT"] * 100,
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": list(range(8)),
            "l_partkey": [1, 2, 3, 4, 5, 6, 7, 8],
            "l_suppkey": [1, 1, 1, 1, 2, 2, 2, 2],
            "l_linenumber": [1] * 8,
            "l_quantity": [1.0] * 8,
            "l_extendedprice": [1.0] * 8,
            "l_discount": [0.0] * 8,
            "l_tax": [0.0] * 8,
            "l_returnflag": ["N"] * 8,
            "l_linestatus": ["O"] * 8,
            "l_shipdate": ["2024-01-01T00:00:00"] * 8,
        },
    )
    rows = {r.family: r for r in relational.profile_partition_skew(spark, sf).collect()}
    hot = rows["orders.o_custkey"]
    assert hot.n_rows == 100 and hot.n_keys == 41
    assert hot.top1_share == 0.6
    uniform = rows["lineitem.l_partkey"]
    assert uniform.gini == 0.0 and uniform.top1_share == 0.125


def test_bloom_semi_prune_is_lossless(spark, tmp_path):
    """The hash-bucket prune admits false positives but never drops a
    matching order: result equals the plain EXISTS semi join."""
    sf = _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": list(range(50)),
            "o_custkey": [1] * 50,
            "o_orderstatus": ["F"] * 50,
            "o_totalprice": [float(i) for i in range(50)],
            "o_orderdate": ["2024-01-01T00:00:00"] * 50,
            "o_orderpriority": ["1-URGENT" if i % 2 else "3-MEDIUM" for i in range(50)],
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": [3, 7, 11, 40],
            "l_partkey": [1] * 4,
            "l_suppkey": [1] * 4,
            "l_linenumber": [1] * 4,
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [1.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            # one ships before the cutoff -> its order must NOT qualify
            "l_shipdate": [
                "1996-01-01T00:00:00",
                "1996-01-01T00:00:00",
                "1990-01-01T00:00:00",
                "1996-01-01T00:00:00",
            ],
        },
    )
    rows = {
        r.o_orderpriority: r
        for r in relational.join_semi_bloom_pruned(spark, sf).collect()
    }
    # qualifying orders: 3, 7, 40 -> priorities URGENT(3,7), MEDIUM(40)
    assert rows["1-URGENT"].n_orders == 2
    assert rows["3-MEDIUM"].n_orders == 1


def test_duplicate_invoices_planted_pair(spark, tmp_path):
    """A planted double-booking (same customer, 2 days apart, 0.5%
    price delta) is found; a 5-day-apart twin and a 3%-delta twin are
    not.  The bin straddle (dates in adjacent 4-day bins) must not
    lose the pair."""
    sf = _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [1, 2, 3, 4, 5, 6],
            "o_custkey": [7, 7, 7, 7, 8, 8],
            "o_orderstatus": ["F"] * 6,
            # pair (1,2): 1000.00 vs 1004.00 (0.4%) 2 days apart -> HIT
            # pair (3,4): 5-days apart -> miss; (5,6): 3% delta -> miss
            "o_totalprice": [1000.0, 1004.0, 200.0, 200.0, 300.0, 309.5],
            "o_orderdate": [
                "2024-01-03T00:00:00",
                "2024-01-05T00:00:00",
                "2024-02-01T00:00:00",
                "2024-02-06T00:00:00",
                "2024-03-01T00:00:00",
                "2024-03-02T00:00:00",
            ],
            "o_orderpriority": ["1-URGENT"] * 6,
        },
    )
    rows = relational.orders_duplicate_invoices(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].days_apart == 2 and rows[0].n_pairs == 1
    assert rows[0].n_customers == 1


def test_soft_dedup_weights_effective_docs(spark, tmp_path):
    """Three copies of one text and one unique text in a source:
    effective_docs = 3*(1/3) + 1 = 2, dup_rate = 0.5; a source with all
    unique texts has dup_rate 0."""
    sf = _write(
        tmp_path,
        "documents",
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": ["same same", "same same", "same same", "uniq a", "x y", "z w"],
            "lang": ["en"] * 6,
            "source": ["s1", "s1", "s1", "s1", "s2", "s2"],
            "n_chars": [9, 9, 9, 6, 3, 3],
        },
    )
    rows = {r.source: r for r in dedup.sample_soft_dedup_weights(spark, sf).collect()}
    assert rows["s1"].n_docs == 4 and rows["s1"].n_clusters_touched == 2
    assert abs(rows["s1"].effective_docs - 2.0) < 1e-9
    assert abs(rows["s1"].dup_rate - 0.5) < 1e-9
    assert rows["s2"].dup_rate == 0.0


def test_power_iteration_recovers_dominant_axis(spark, tmp_path):
    """Vectors concentrated on dimension 5 (with small noise elsewhere):
    two iterations already put the max |loading| on dim 5 with loading
    1.0 (max-norm scaling), and growth > 0."""
    import random

    rng = random.Random(7)
    vecs = []
    for _ in range(40):
        v = [rng.uniform(-0.01, 0.01) for _ in range(64)]
        v[5] = rng.choice([1.0, -1.0]) * rng.uniform(0.9, 1.1)
        vecs.append(v)
    # make the dominant direction consistent in sign so the planted axis
    # is a true principal direction, not a cancelling mixture
    vecs = [[abs(x) if i == 5 else x for i, x in enumerate(v)] for v in vecs]
    sf = _write(
        tmp_path,
        "embeddings",
        {
            "vec_id": list(range(40)),
            "embedding": vecs,
            "label": [0] * 40,
        },
    )
    rows = similarity.similarity_power_iteration(spark, sf).collect()
    top = max(rows, key=lambda r: abs(r.loading))
    assert top.dim_idx == 5
    assert abs(abs(top.loading) - 1.0) < 1e-9
    assert top.growth > 0


def test_er_golden_record_contraction_matches_edge_cc(spark, tmp_path):
    """The name-group contraction must equal part-level CC: two names at
    distance 1 chain their parts into one entity whose id is the min
    part key, survivorship aggregates span BOTH name groups, and an
    edgeless multi-member group still surfaces as its own entity."""
    sf = _write(
        tmp_path,
        "part",
        {
            "p_partkey": [10, 11, 20, 30, 31],
            # 'red bolt' ~ 'rad bolt' (distance 1) -> one entity {10,11,20}
            # 'blue gear' twice, no neighbor -> entity {30,31}
            "p_name": ["red bolt", "red bolt", "rad bolt", "blue gear", "blue gear"],
            "p_brand": ["B1", "B1", "B1", "B2", "B2"],
            "p_type": ["t"] * 5,
            "p_size": [1, 5, 3, 2, 2],
            "p_retailprice": [10.0, 12.0, 11.0, 7.0, 9.0],
        },
    )
    rows = {r.entity_id: r for r in mining.er_golden_record(spark, sf).collect()}
    assert set(rows) == {10, 30}
    assert rows[10].n_members == 3
    assert rows[10].canonical_name == "rad bolt"
    assert rows[10].merged_price == 12.0
    assert rows[10].min_size == 1 and rows[10].max_size == 5
    assert rows[30].n_members == 2


def test_link_prediction_degree_cap_bounds_wedges(spark, monkeypatch):
    """With the SYMMETRIC degree cap (r9 advice) the scored graph is one
    consistent undirected graph, so common <= min(deg_u, deg_w) <= cap
    and union_size >= common > 0 are STRUCTURAL guarantees (no negative
    Jaccard / divide-by-zero on hub-heavy shapes), not fixture luck."""
    from tests.conftest import SF_ORACLE

    out = dedup.dedup_link_prediction(spark, SF_ORACLE, k=20, degree_cap=5)
    rows = out.collect()
    assert rows, "expected candidate predictions"
    for r in rows:
        assert 0 < r.common <= 5
        assert r.common <= r.union_size <= 10
        assert 0.0 < r.nbr_jaccard <= 1.0


def test_simhash_band_count_follows_threshold(spark):
    """Banding-invariance: the verified pair set at distance <= 1 (2
    bands of 8 nibbles) equals the pair set a 4-band run verifies down
    to the same threshold — pigeonhole recall is perfect either way."""
    from tests.conftest import SF_ORACLE

    tight = dedup.dedup_simhash_pairs(spark, SF_ORACLE, max_nibble_distance=1)
    loose = dedup.dedup_simhash_pairs(spark, SF_ORACLE, max_nibble_distance=3)
    got = {(r.doc_a, r.doc_b) for r in tight.collect()}
    want = {
        (r.doc_a, r.doc_b)
        for r in loose.collect()
        if r.nibble_distance <= 1
    }
    assert got == want


def test_asof_forward_matches_and_tolerance(spark, tmp_path):
    """A purchase with a click 10 min later matches; one whose next click
    is 2 h out exceeds the 1 h tolerance; one with no later click never
    matches.  Gaps are exact microseconds."""
    rows = [
        # user 1: purchase 10:00, click 10:10 -> gap 600s
        (1, "2024-01-01T10:00:00", 10, "purchase"),
        (1, "2024-01-01T10:10:00", 11, "click"),
        # user 2: purchase 09:00, next click 11:00 -> beyond tolerance
        (2, "2024-01-01T09:00:00", 20, "purchase"),
        (2, "2024-01-01T11:00:00", 21, "click"),
        # user 3: click BEFORE the purchase only -> no forward match
        (3, "2024-01-01T08:00:00", 30, "click"),
        (3, "2024-01-01T09:00:00", 31, "purchase"),
    ]
    sf = _write(
        tmp_path,
        "events",
        {
            "event_id": [r[2] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        },
    )
    from simple_land_registry_data_ingestion_spark.operators import asof

    got = {r.user_id: r for r in asof.join_asof_forward(spark, sf).collect()}
    assert got[1].n_matched == 1 and got[1].sum_gap_us == 600 * 1_000_000
    assert got[2].n_matched == 0
    assert got[3].n_matched == 0 and got[3].n_purchases == 1


def test_balanced_classes_kept_counts(spark, tmp_path):
    """Labels of sizes 5/3/2 balance to 2 kept per class; kept ids are a
    deterministic md5-order pick, so the id-sum is stable run to run."""
    sf = _write(
        tmp_path,
        "embeddings",
        {
            "vec_id": list(range(10)),
            "embedding": [[0.0] * 4] * 10,
            "label": [0] * 5 + [1] * 3 + [2] * 2,
        },
    )
    rows = {r.label: r for r in relational.sample_balanced_classes(spark, sf).collect()}
    assert [rows[k].n_total for k in (0, 1, 2)] == [5, 3, 2]
    assert all(rows[k].n_kept == 2 for k in (0, 1, 2))
    again = {r.label: r.kept_id_sum for r in relational.sample_balanced_classes(spark, sf).collect()}
    assert again == {k: rows[k].kept_id_sum for k in rows}


def test_functional_dependency_detects_violation(spark, tmp_path):
    """A planted orders table where o_orderkey is a key (FD holds) but
    one customer carries two priorities (FD violated)."""
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": [1, 1, 2],
            "l_partkey": [7, 7, 8],
            "l_suppkey": [5, 5, 6],
            "l_linenumber": [1, 2, 1],
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [1.0] * 3,
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O", "F", "O"],
            "l_shipdate": ["2024-01-01T00:00:00"] * 3,
        },
    )
    sf = _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [9, 9, 10],
            "o_orderstatus": ["F", "O", "F"],
            "o_totalprice": [1.0] * 3,
            "o_orderdate": ["2024-01-01T00:00:00"] * 3,
            "o_orderpriority": ["1-URGENT", "3-MEDIUM", "1-URGENT"],
        },
    )
    rows = {r.fd: r for r in relational.profile_functional_dependency(spark, sf).collect()}
    key_fd = rows["orders.o_orderkey->o_orderstatus"]
    assert key_fd.n_violating == 0 and key_fd.violation_rate == 0.0
    cust_fd = rows["orders.o_custkey->o_orderpriority"]
    assert cust_fd.n_violating == 1 and cust_fd.max_distinct_dep == 2
    li_fd = rows["lineitem.l_orderkey->l_linestatus"]
    assert li_fd.n_violating == 1


def test_fingerprint_and_signature_plan_shapes(spark):
    """The SimHash fingerprint must STAY scan-stage (the r9 contract:
    fan_out's RoundRobin spread is the one allowed exchange).  The
    MinHash signature contract changed in r12 — the array-HOF form ran
    every md5 interpreted, so signatures now flow through the codegen
    shingle emission + min-aggregates — but the plan must still carry
    exactly ONE doc-keyed hash exchange, shared by the emission window
    and the signature aggregate (a second one would mean the groupBy
    stopped reusing the window's partitioning)."""
    from simple_land_registry_data_ingestion_spark.plans.inspect import (
        formatted_plan,
    )
    from simple_land_registry_data_ingestion_spark.tables import load
    from tests.conftest import SF_ORACLE

    fp_plan = formatted_plan(dedup.dedup_simhash(spark, SF_ORACLE))
    assert "hashpartitioning" not in fp_plan, fp_plan
    assert "rangepartitioning" not in fp_plan, fp_plan
    docs = load(spark, SF_ORACLE, "documents")
    sig_plan = formatted_plan(dedup.minhash_signatures(docs))
    # formatted mode prints the node header and its Arguments separately,
    # so count the partitioning expression itself
    assert sig_plan.count("hashpartitioning(doc_id") == 1, sig_plan
    assert "rangepartitioning" not in sig_plan, sig_plan


def test_balanced_classes_invariant_under_repartition(spark, tmp_path):
    """The md5-order pick must not depend on physical layout: the same
    table written with a different row order / partitioning keeps the
    identical kept-id sums (the sample_hash_deterministic discipline)."""
    import random

    rng = random.Random(3)
    ids = list(range(200))
    labels = [i % 3 for i in ids]
    sf1 = _write(
        tmp_path,
        "embeddings",
        {"vec_id": ids, "embedding": [[0.0]] * 200, "label": labels},
    )
    first = {
        r.label: r.kept_id_sum
        for r in relational.sample_balanced_classes(spark, sf1).collect()
    }
    perm = ids[:]
    rng.shuffle(perm)
    d2 = tmp_path / "v2"
    d2.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": perm,
                "embedding": [[0.0]] * 200,
                "label": [i % 3 for i in perm],
            }
        ),
        str(d2 / "embeddings.parquet"),
    )
    second = {
        r.label: r.kept_id_sum
        for r in relational.sample_balanced_classes(spark, str(d2)).collect()
    }
    assert first == second
