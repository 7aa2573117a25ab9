"""End-to-end RAG INDEX-BUILD pipeline: the oracle-verified operators
composed into the flow a retrieval corpus actually runs at ingest time.

    quality filter (Gopher rules)
      -> near-dup dedup (cluster canonical survivors)
        -> chunking (UDTF fixed-window chunks)
          -> LEXICAL index: per-term document frequencies + per-chunk
             lengths + the global (N, avgdl) row — exactly the statistics
             BM25 scoring (text_bm25_topk / search_rank_fusion) consumes
          -> VECTOR index: the embedding corpus written PARTITIONED BY its
             sign-LSH bucket (write_ann_bucket_layout) so a probe reads
             one directory, not the corpus

This is the second composition next to pipeline_training.run_training_export
(curate -> pack for PRETRAINING); this one ends in serving indexes for
RETRIEVAL.  Each stage is an operator that is individually hash-verified
against its DuckDB twin; the module adds only the composition — one
declarative plan per stage, doc_id semi-joins between stages, no
driver-side loops or collects.

Scale shape: two semi-joins on doc_id; chunking is a Generate (row
expansion, no shuffle); the postings build is one (term) and one (chunk)
aggregation over the exploded tokens; the bucket-layout write is one
repartition("bucket").  The postings tables are the only new persisted
artifacts and are corpus-token-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.functions.text import text_gopher_filter, words_col
from simple_land_registry_data_ingestion_spark.functions.udfs import ChunkText
from simple_land_registry_data_ingestion_spark.operators.dedup import (
    dedup_cluster_assignments,
)
from simple_land_registry_data_ingestion_spark.operators.similarity import (
    write_ann_bucket_layout,
)
from simple_land_registry_data_ingestion_spark.tables import load


def run_rag_index_build(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_df: int = 2,
) -> DataFrame:
    """Run the full index-build flow; write the lexical index (postings +
    chunk lengths + global stats) and the bucketed vector layout under
    ``out_dir``; return the per-source build summary.

    ``min_df`` drops hapax terms from the postings (the classic index
    size/recall trade; df >= 2 keeps every term that can ever match more
    than its own document).
    """
    docs = load(spark, sf_dir, "documents")

    kept = text_gopher_filter(spark, sf_dir).where(F.col("keep")).select("doc_id")
    canonical = (
        dedup_cluster_assignments(spark, sf_dir)
        .where(F.col("is_canonical"))
        .select("doc_id")
    )
    eligible = docs.join(kept, "doc_id", "left_semi").join(
        canonical, "doc_id", "left_semi"
    )

    spark.udtf.register("chunk_text", ChunkText)
    eligible.createOrReplaceTempView("rag_eligible_v")
    chunks = spark.sql(
        """
        SELECT d.doc_id, d.source, c.chunk_idx, c.chunk
        FROM rag_eligible_v d, LATERAL chunk_text(d.text) c
        """
    ).select(
        "doc_id",
        "source",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk",
    )

    tokens = chunks.select(
        "doc_id",
        "source",
        "chunk_idx",
        F.explode(words_col("chunk")).alias("token"),
    )
    chunk_len = tokens.groupBy("doc_id", "chunk_idx").agg(
        F.count(F.lit(1)).cast("long").alias("dl"),
        F.first("source").alias("source"),
    )
    postings = (
        tokens.groupBy("token")
        .agg(
            F.count_distinct("doc_id", "chunk_idx").cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("tf_total"),
        )
        .where(F.col("df") >= min_df)
    )
    stats = chunk_len.agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    postings.write.mode("overwrite").parquet(f"{out_dir}/postings.parquet")
    chunk_len.write.mode("overwrite").parquet(f"{out_dir}/chunk_lengths.parquet")
    stats.write.mode("overwrite").parquet(f"{out_dir}/index_stats.parquet")
    write_ann_bucket_layout(
        load(spark, sf_dir, "embeddings"), f"{out_dir}/vectors_by_bucket"
    )

    per_source = chunk_len.groupBy("source").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs_indexed"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("dl").cast("long").alias("n_tokens"),
    )
    return per_source.orderBy("source")
