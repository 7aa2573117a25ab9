"""Round-14 pins: ADVICE r13 fixes.

  (a) GEMM pre-filter slack covers the full HALF_UP rounding band —
      a pair whose RAW cosine sits in [t - 5e-7, t - 1e-9) rounds UP to
      the threshold at 6 dp and must survive the UDF pre-cut so the
      exact Spark-side filter can admit it (the old 1e-9 slack dropped
      it before the filter ever saw it).
  (b) dedup_semdedup's in-cluster gram is row-blocked: results are
      byte-identical at any block size (the division happens after the
      matmul, so each block row's floats equal the full-matrix ones),
      bounding a degenerate cluster's memory at O(block * c).
  (c) materialized_frame garbage-collects legacy-format store siblings
      and hour-old crashed-writer temp dirs, but never a fresh temp dir
      (a live concurrent writer mid-build).
"""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.operators import dedup, substrate
from tests.conftest import SF_SMALL


def test_gemm_precut_admits_halfup_boundary_band(spark):
    """Raw cosine 0.2999996 < t=0.3 but round(., 6) == 0.300000 >= t:
    the pair MUST appear in the output (ADVICE r13 medium)."""
    c = 0.2999996
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [c, math.sqrt(1.0 - c * c), 0.0]),
        # filler far below threshold so the frame has >1 block's worth
        (2, [0.0, 0.0, 1.0]),
        (3, [0.0, -1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "embeddings.parquet"))
        got = {
            (r.vec_a, r.vec_b): r.cosine
            for r in dedup.dedup_embedding_cosine(
                spark, td, threshold=0.3
            ).collect()
        }
    # float32 storage perturbs c by ~1e-8 — still inside the band
    assert (0, 1) in got, got
    assert got[(0, 1)] == 0.3


def test_semdedup_row_blocking_is_exact(spark):
    """Blocked and unblocked grams must produce identical rows — the
    per-row dot products are the same float64 values either way."""
    full = sorted(
        map(tuple, dedup.dedup_semdedup(spark, SF_SMALL).collect())
    )
    blocked = sorted(
        map(tuple, dedup.dedup_semdedup(spark, SF_SMALL, row_block=3).collect())
    )
    assert full == blocked and len(full) > 0


def test_store_gc_prunes_legacy_and_crashed_entries(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_STORE", str(tmp_path))
    base = os.path.basename(SF_SMALL.rstrip("/"))
    prefix = f"gctag_{base}_"
    legacy = tmp_path / f"{prefix}rawfingerprint0123456789"
    legacy.mkdir()
    old_tmp = tmp_path / f".{prefix}deadbeef.crashed"
    old_tmp.mkdir()
    two_hours_ago = __import__("time").time() - 7200
    os.utime(old_tmp, (two_hours_ago, two_hours_ago))
    fresh_tmp = tmp_path / f".{prefix}cafebabe.live"
    fresh_tmp.mkdir()

    df = substrate.materialized_frame(
        spark,
        SF_SMALL,
        "gctag",
        "region",
        lambda: spark.range(3).select(F.col("id").alias("k")),
    )
    assert df.count() == 3
    names = {p.name for p in tmp_path.iterdir()}
    assert legacy.name not in names, "legacy-format sibling must be pruned"
    assert old_tmp.name not in names, "hour-old crashed temp must be pruned"
    assert fresh_tmp.name in names, "fresh temp (live writer) must survive"
