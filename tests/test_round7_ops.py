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
