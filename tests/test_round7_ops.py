"""Targeted unit tests for round-7 operator edge semantics that the
sf0.01 oracle-parity sweep can't isolate: guard rails, overlap
conventions, and integer-ceiling arithmetic."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.functions import text as text_fns
from simple_land_registry_data_ingestion_spark.functions import udfs
from simple_land_registry_data_ingestion_spark.operators import dedup
from tests.conftest import SF_ORACLE


def test_kcore_peel_rejects_zero_rounds(spark):
    """round-6 ADVICE: rounds=0 used to die with IndexError on
    peeled_parts[0]; now it must fail loudly and early."""
    with pytest.raises(ValueError, match="rounds >= 1"):
        dedup.dedup_kcore_peel(spark, SF_ORACLE, rounds=0)


def test_holt_complements_stay_in_sync():
    """round-6 ADVICE: the pinned complement literals must track
    alpha/beta; the module asserts at import, this pins the values."""
    assert udfs._HOLT_ALPHA + udfs._HOLT_ALPHA_C == 1.0
    assert udfs._HOLT_BETA + udfs._HOLT_BETA_C == 1.0


def test_bpe_overlapping_chain_merges_first_pair_only(spark, tmp_path):
    """The documented rewrite convention on 'a a a': left-to-right
    non-overlapping replace merges the FIRST pair only (the BPE
    convention), and the double-space working text lets CONSECUTIVE
    non-overlapping occurrences ('x y x y') BOTH merge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "docs"
    d.mkdir()
    rows = {
        "doc_id": [0, 1],
        "text": ["a a a", "x y x y"],
        "lang": ["en", "en"],
        "source": ["s", "s"],
        "n_chars": [5, 7],
    }
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    out = {
        (r["iter"], r["left_tok"], r["right_tok"]): r["n_occurrences"]
        for r in text_fns.text_bpe_word_merges(spark, str(d), iters=2).collect()
    }
    # iteration 1: pair counts are overlapping adjacencies:
    # (a,a) x2, (x,y) x2, (y,x) x1 -> argmax tie (a,a) vs (x,y) breaks
    # lexicographically to (a,a)
    assert out[(1, "a", "a")] == 2
    # iteration 2: doc0 is now 'a@a a' (first pair only merged); the
    # top remaining pair is (x,y) x2 — and BOTH occurrences merge, so
    # no (x@y, x@y)-adjacent artifacts appear in a later count
    assert out[(2, "x", "y")] == 2


def test_pinball_k_is_ceiling_of_q_times_n():
    """k = (n*900 + 999) div 1000 must equal ceil(0.9 n) for the
    order-statistic pick — spot the integer-ceiling arithmetic."""
    import math

    for n in range(1, 2000):
        assert (n * 900 + 999) // 1000 == math.ceil(0.9 * n)


def test_conformal_k_is_ceiling_form():
    """k = ((n+1)*900 + 999) div 1000 == ceil(0.9 (n+1)) — the split-
    conformal rank (alpha = 0.1)."""
    import math

    for n in range(1, 2000):
        assert ((n + 1) * 900 + 999) // 1000 == math.ceil(0.9 * (n + 1))


def test_kcenter_coreset_rejects_zero_k(spark):
    """Same guard discipline as kcore: k=0 used to silently return the
    seed row while the docstring promises k rows."""
    from simple_land_registry_data_ingestion_spark.operators import similarity

    with pytest.raises(ValueError, match="k >= 1"):
        similarity.sample_kcenter_coreset(spark, SF_ORACLE, k=0)


def _write_events(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "ev"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table(rows), str(d / "events.parquet"))
    return str(d)


def test_sprt_literals_match_ln():
    """The four pinned DECIMAL(13,12) SPRT literals must equal the
    12dp-rounded ln values they claim to be."""
    import math

    assert round(math.log(0.55 / 0.5), 12) == 0.095310179804
    assert round(math.log(0.45 / 0.5), 12) == -0.105360515658
    assert round(math.log(0.95 / 0.05), 12) == 2.944438979166
    assert round(math.log(0.05 / 0.95), 12) == -2.944438979166


def test_mann_whitney_matches_brute_force_ranks(spark, tmp_path):
    """Doubled-midrank U on a tiny tied sample == the textbook rank-sum
    computed by hand (values [1,2,2,3] A vs [2,3,3] B)."""
    from datetime import datetime

    from simple_land_registry_data_ingestion_spark.operators import relational

    # cohort A <=> ((uid % 1000003)*2654435761 + 13) % 1000 < 500
    in_a = lambda uid: ((uid % 1000003) * 2654435761 + 13) % 1000 < 500
    a_users = [u for u in range(50) if in_a(u)]
    b_users = [u for u in range(50) if not in_a(u)]
    vals_a, vals_b = [1.0, 2.0, 2.0, 3.0], [2.0, 3.0, 3.0]
    rows = {
        "event_id": list(range(7)),
        "ts": [datetime(2024, 1, 1, 0, i) for i in range(7)],
        "user_id": [a_users[i] for i in range(4)] + [b_users[i] for i in range(3)],
        "event_type": ["click"] * 7,
        "value": vals_a + vals_b,
        "props": ["{}"] * 7,
    }
    out = relational.events_mann_whitney(spark, _write_events(tmp_path, rows)).collect()
    r = {row["event_type"]: row for row in out}["click"]
    # combined sorted: 1,2,2,2,3,3,3 -> midranks: 1, 3,3,3, 6,6,6
    # R1 (A = 1,2,2,3) = 1 + 3 + 3 + 6 = 13 -> U1 = 13 - 4*5/2 = 3
    assert r["n_a"] == 4 and r["n_b"] == 3
    assert int(r["u1_x2"]) == 6  # doubled U1
    # effect size U1/(n_a*n_b) = 3/12
    assert abs(float(r["auc_effect"]) - 0.25) < 1e-9


def test_ks_two_identical_cohorts_is_zero(spark, tmp_path):
    """Identical value multisets in both cohorts -> D == 0."""
    from datetime import datetime

    from simple_land_registry_data_ingestion_spark.operators import relational

    in_a = lambda uid: ((uid % 1000003) * 2654435761 + 13) % 1000 < 500
    a_users = [u for u in range(50) if in_a(u)][:3]
    b_users = [u for u in range(50) if not in_a(u)][:3]
    rows = {
        "event_id": list(range(6)),
        "ts": [datetime(2024, 1, 1, 0, i) for i in range(6)],
        "user_id": a_users + b_users,
        "event_type": ["view"] * 6,
        "value": [1.0, 2.0, 3.0, 1.0, 2.0, 3.0],
        "props": ["{}"] * 6,
    }
    out = relational.events_ks_test(spark, _write_events(tmp_path, rows)).collect()
    assert float(out[0]["ks_d"]) == 0.0


def test_psi_identical_periods_is_tiny(spark, tmp_path):
    """The same value multiset before and after the boundary -> PSI ~ 0
    (exactly 0 up to Laplace smoothing of equal counts)."""
    from datetime import datetime

    from simple_land_registry_data_ingestion_spark.operators import relational

    vals = [float(v) for v in range(1, 41)]
    rows = {
        "event_id": list(range(80)),
        "ts": [datetime(2024, 1, 10)] * 40 + [datetime(2024, 1, 20)] * 40,
        "user_id": list(range(80)),
        "event_type": ["click"] * 80,
        "value": vals + vals,
        "props": ["{}"] * 80,
    }
    out = relational.events_psi_drift(spark, _write_events(tmp_path, rows)).collect()
    assert out[0]["n_ref"] == 40 and out[0]["n_cur"] == 40
    assert abs(float(out[0]["psi"])) < 1e-9


def test_entropy_rate_deterministic_chain_is_zero(spark, tmp_path):
    """A user repeating one event type has a single self-transition ->
    conditional entropy exactly 0."""
    from datetime import datetime

    from simple_land_registry_data_ingestion_spark.operators import relational

    rows = {
        "event_id": list(range(5)),
        "ts": [datetime(2024, 1, 1, 0, i) for i in range(5)],
        "user_id": [7] * 5,
        "event_type": ["view"] * 5,
        "value": [1.0] * 5,
        "props": ["{}"] * 5,
    }
    out = relational.events_entropy_rate(spark, _write_events(tmp_path, rows)).collect()
    assert len(out) == 1
    assert float(out[0]["cond_entropy"]) == 0.0
    assert out[0]["n_from"] == 4


def test_hill_boundary_ties_drop_by_value(spark, tmp_path):
    """Ties AT the (k+1)-th order statistic drop out of the Hill sum
    (cents > ref_cents), so k_used reflects the value multiset, not an
    arbitrary row pick."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from simple_land_registry_data_ingestion_spark.operators import relational

    d = tmp_path / "ord"
    d.mkdir()
    prices = [200.0, 100.0, 100.0, 100.0, 50.0, 10.0]
    rows = {
        "o_orderkey": list(range(6)),
        "o_custkey": [1] * 6,
        "o_orderstatus": ["F"] * 6,
        "o_totalprice": prices,
        "o_orderdate": [datetime(2024, 1, 1)] * 6,
        "o_orderpriority": ["1-URGENT"] * 6,
    }
    pq.write_table(pa.table(rows), str(d / "orders.parquet"))
    out = relational.orders_hill_tail_index(spark, str(d), k=3).collect()
    assert len(out) == 1
    assert out[0]["ref_cents"] == 10000
    assert out[0]["k_used"] == 1  # only 200.00 sits strictly above the ref


def test_holt_winters_complements_and_short_series(spark, tmp_path):
    """HW complement literals track alpha/beta/gamma, and a type with
    fewer than 25 hours emits NOTHING (init never completes)."""
    from datetime import datetime

    from simple_land_registry_data_ingestion_spark.functions import udfs

    assert udfs._HW_ALPHA + udfs._HW_ALPHA_C == 1.0
    assert udfs._HW_BETA + udfs._HW_BETA_C == 1.0
    assert udfs._HW_GAMMA + udfs._HW_GAMMA_C == 1.0

    rows = {
        "event_id": list(range(30)),
        # 'view': 26 hourly points (emits); 'click': 4 points (silent)
        "ts": [datetime(2024, 1, 1 + i // 24, i % 24) for i in range(26)]
        + [datetime(2024, 1, 1, i) for i in range(4)],
        "user_id": list(range(30)),
        "event_type": ["view"] * 26 + ["click"] * 4,
        "value": [1.0] * 30,
        "props": ["{}"] * 30,
    }
    out = udfs.events_holt_winters_pandas(
        spark, _write_events(tmp_path, rows)
    ).collect()
    assert {r["event_type"] for r in out} == {"view"}
    assert out[0]["n_hours"] == 26


def test_kalman_single_observation_state(spark, tmp_path):
    """One observation = init only: level is the observation, posterior
    variance stays at R, gain never computed (0), zero innovation."""
    from datetime import datetime

    from simple_land_registry_data_ingestion_spark.functions import udfs

    rows = {
        "event_id": [1],
        "ts": [datetime(2024, 1, 1, 0)],
        "user_id": [1],
        "event_type": ["view"],
        "value": [1.0],
        "props": ["{}"],
    }
    out = udfs.events_kalman_level(spark, _write_events(tmp_path, rows)).collect()
    r = out[0]
    assert r["n_hours"] == 1
    assert r["level"] == 1.0
    assert r["variance"] == 25.0
    assert r["gain_last"] == 0.0
    assert r["innovation_ssq"] == 0.0
