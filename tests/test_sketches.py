"""Property tests for the round-3 training-pipeline operators: bounded-memory
heavy hitters, PQ/ADC compression, leakage-free splitting, and the
token-budget mixer — the guarantees the oracle-parity gate cannot state
(it checks one partitioning of one dataset; these pin the invariants)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark import plans
from simple_land_registry_data_ingestion_spark.operators import dedup, similarity, sketches
from simple_land_registry_data_ingestion_spark.operators.relational import (
    sample_token_budget_mix,
)
from tests.conftest import SF_ORACLE


def test_heavy_hitters_exact_under_any_partitioning(spark):
    """The MG candidate pass must yield a SUPERSET of true heavy hitters in
    every partitioning, so the exact recount gives identical results on 1
    partition, 32 partitions, and a key-clustered layout."""
    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    truth = {
        (r["user_id"], r["n_events"])
        for r in sketches.heavy_hitters_exact(
            events.coalesce(1), "user_id"
        ).collect()
    }
    assert len(truth) > 0
    scattered = {
        (r["user_id"], r["n_events"])
        for r in sketches.heavy_hitters_exact(
            events.repartition(32), "user_id"
        ).collect()
    }
    clustered = {
        (r["user_id"], r["n_events"])
        for r in sketches.heavy_hitters_exact(
            events.repartition(8, "user_id"), "user_id"
        ).collect()
    }
    assert scattered == truth
    assert clustered == truth


def test_misra_gries_never_misses_frequent_key():
    """Adversarial stream for one partition: one frequent key diluted by
    k distinct fillers per occurrence still survives the k-counter sketch
    (the classic MG guarantee: freq > N/(k+1) => kept)."""
    k = 8
    rows = []
    for i in range(200):
        rows.append(42)
        rows.extend(range(1000 + i * k, 1000 + i * k + k - 1))
    batches = [pd.DataFrame({"key": pd.Series(rows[i : i + 97], dtype="int64")})
               for i in range(0, len(rows), 97)]
    (out,) = list(sketches._misra_gries_partition(iter(batches), k))
    assert 42 in set(out["key"])
    assert len(out) <= k


def test_pq_code_is_fixed_width_and_complete(spark):
    """Every non-query vector gets exactly PQ_M nibbles (the compressed
    at-rest representation is fixed-width), and the ADC top-k is stable
    under repartitioning."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    sub_dim = 64 // similarity.PQ_M
    cb = similarity.pq_codebook(emb, sub_dim)
    assert cb.count() == similarity.PQ_M * similarity.PQ_K
    enc = similarity.pq_encode(emb, cb, sub_dim)
    n_vecs = emb.count()
    per_vec = enc.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_subspaces"),
        F.countDistinct("s").alias("n_distinct_s"),
    )
    bad = per_vec.where(
        (F.col("n_subspaces") != similarity.PQ_M)
        | (F.col("n_distinct_s") != similarity.PQ_M)
    )
    assert per_vec.count() == n_vecs
    assert bad.count() == 0
    codes = enc.agg(
        F.min("code_id").alias("lo"), F.max("code_id").alias("hi")
    ).first()
    assert 0 <= codes["lo"] and codes["hi"] < similarity.PQ_K

    a = similarity.similarity_pq_adc(spark, SF_ORACLE).collect()
    assert len(a) == 10
    dists = [r["adc_dist"] for r in a]
    assert dists == sorted(dists)
    assert all(len(r["pq_code"]) == similarity.PQ_M for r in a)


def test_pq_encode_is_narrow_no_shuffle(spark):
    """Encoding must stay a broadcast-join map pass: one tiny codebook
    aggregation is allowed, but the corpus side never shuffles (the pass
    that must stream 100 TB exactly once)."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cb = similarity.pq_codebook(emb, 8)
    enc = similarity.pq_encode(emb, cb, 8)
    plans.assert_no_cartesian_product(enc)
    assert plans.broadcast_join_count(enc) >= 1
    # shuffles: codebook TakeOrdered + its groupBy(s) — both over <=128 rows;
    # the emb-side explode joins broadcast-side only (no emb shuffle means
    # shuffle count stays at the tiny codebook aggregations)
    assert plans.shuffle_count(enc) <= 2, plans.formatted_plan(enc)


def test_split_leakage_free_no_cluster_straddles(spark):
    """THE split invariant: no duplicate cluster contributes documents to
    both sides (checked on raw assignments, not the aggregated query)."""
    assignments = dedup.dedup_cluster_assignments(spark, SF_ORACLE)
    nib = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 1)
    tagged = assignments.withColumn(
        "split", F.when(nib.isin(*"0123456789abc"), "train").otherwise("holdout")
    )
    straddlers = (
        tagged.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_sides"))
        .where(F.col("n_sides") > 1)
    )
    assert straddlers.count() == 0
    sides = {r["split"] for r in tagged.select("split").distinct().collect()}
    assert sides == {"train", "holdout"}


def test_token_budget_mix_fills_but_never_overshoots_by_more_than_one_doc(spark):
    """Per language: tokens_before of every taken doc < budget, and the
    selection is a PREFIX of the md5 draw order (no gaps) whose total
    reaches the budget (or exhausts the language)."""
    budget = 2000
    picked = sample_token_budget_mix(spark, SF_ORACLE, tokens_per_lang=budget)
    stats = (
        picked.groupBy("lang")
        .agg(
            F.max("tokens_before").alias("max_before"),
            F.sum("n_tokens").alias("total"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .collect()
    )
    assert len(stats) == 5
    for r in stats:
        assert r["max_before"] < budget
        # the crossing doc is included, so the total reaches the budget
        assert r["total"] >= budget or r["n_docs"] >= 60  # exhausted language


def test_pagerank_star_center_dominates(spark):
    """Planted star graph: the hub must out-rank every leaf, leaves tie,
    and total mass stays in (0, 1] (dangling simplification leaks mass,
    never creates it)."""
    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "doc_a long, doc_b long"
    )  # 0 is the hub; 6,7 are isolated (dangling)
    pr = {
        r["node"]: r["rank"]
        for r in dedup.pagerank_centrality(nodes, edges).collect()
    }
    assert len(pr) == 8
    leaves = [pr[i] for i in range(1, 6)]
    assert all(pr[0] > v for v in leaves)
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly
    assert pr[6] == pr[7] < min(leaves)  # isolated nodes: teleport mass only
    total = sum(pr.values())
    assert 0.0 < total <= 1.0 + 1e-6


def test_hll_sketch_estimate_is_partition_invariant(spark):
    """Spark's datasketches HLL aggregate must give the IDENTICAL estimate
    under any partitioning (register-max merge is commutative/associative)
    and land near the exact distinct count — the mergeable-sketch property
    that lets 100 TB cardinality estimates run as one map-side pass."""
    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select("user_id")
    est = F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
    one = events.coalesce(1).agg(est.alias("e")).first()["e"]
    wide = events.repartition(32).agg(est.alias("e")).first()["e"]
    clustered = events.repartition(8, "user_id").agg(est.alias("e")).first()["e"]
    assert one == wide == clustered
    exact = events.distinct().count()
    assert abs(one - exact) / exact < 0.05
