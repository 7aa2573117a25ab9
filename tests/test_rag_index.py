"""E2E test of the composed RAG index-build pipeline: the persisted
artifacts (postings / chunk lengths / global stats / bucketed vectors)
must be mutually consistent and the vector layout partition-pruned."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark import pipeline_rag_index
from simple_land_registry_data_ingestion_spark.tables import load
from tests.conftest import SF_SMALL


def test_rag_index_build_end_to_end(spark, tmp_path):
    out = str(tmp_path / "rag")
    summary = pipeline_rag_index.run_rag_index_build(spark, SF_SMALL, out)
    srows = summary.collect()
    assert len(srows) > 0
    assert set(summary.columns) == {
        "source", "n_docs_indexed", "n_chunks", "n_tokens"
    }

    postings = spark.read.parquet(f"{out}/postings.parquet")
    chunk_len = spark.read.parquet(f"{out}/chunk_lengths.parquet")
    stats = spark.read.parquet(f"{out}/index_stats.parquet").collect()[0]

    # global stats agree with the chunk-length table they summarize
    n_chunks = chunk_len.count()
    assert stats["n_chunks"] == n_chunks
    total_tokens = chunk_len.agg(F.sum("dl")).collect()[0][0]
    assert abs(stats["avgdl"] - total_tokens / n_chunks) < 1e-9

    # per-source summary sums to the chunk-length table
    assert sum(r["n_chunks"] for r in srows) == n_chunks
    assert sum(r["n_tokens"] for r in srows) == total_tokens

    # hapax cut honored; df bounded by the chunk count
    dfs = postings.agg(F.min("df"), F.max("df")).collect()[0]
    assert dfs[0] >= 2 and dfs[1] <= n_chunks

    # vector side: bucket-partitioned directories exist and the corpus
    # row count is preserved across the layout write
    vec_dir = f"{out}/vectors_by_bucket"
    buckets = [d for d in os.listdir(vec_dir) if d.startswith("bucket=")]
    assert len(buckets) > 1, buckets
    vecs = spark.read.parquet(vec_dir)
    assert vecs.count() == load(spark, SF_SMALL, "embeddings").count()

    # a bucket probe is partition-pruned: one directory, not the corpus
    one = buckets[0].split("=", 1)[1]
    probe = vecs.where(F.col("bucket") == one)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan or "bucket#" in plan
