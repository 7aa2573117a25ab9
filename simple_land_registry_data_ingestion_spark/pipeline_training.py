"""End-to-end TRAINING-DATA export pipeline: the oracle-verified operators
composed into the curation flow a pretraining corpus actually runs.

    quality filter (Gopher rules)
      -> near-dup dedup (cluster canonical survivors)
        -> per-language token-budget mixing
          -> sequence packing (global token offsets)
            -> range-sorted manifest export + per-language summary

Each stage is the same operator registered (and hash-verified) as a driver
query; this module is the COMPOSITION — one declarative plan per stage,
joined by doc_id semi-joins, no driver-side loops or collects anywhere.
The reference pipeline (reference main.py:298-372: download -> parse ->
COPY) is the one-table ancestor of this flow; the LLM-data stages are the
north-star extension (SURVEY.md section 2.12).

Scale shape: two semi-joins on doc_id (hash-shuffle, AQE-coalesced), the
per-language budget window, the packing prefix-sum (two-level, sharded),
and a range shuffle for the sorted manifest.  Everything in between is
scan-speed column work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.functions.text import (
    text_gopher_filter,
    token_count_col,
)
from simple_land_registry_data_ingestion_spark.operators import packing
from simple_land_registry_data_ingestion_spark.operators.dedup import (
    dedup_cluster_assignments,
)
from simple_land_registry_data_ingestion_spark.operators.relational import (
    export_range_sorted,
    token_budget_mix,
)
from simple_land_registry_data_ingestion_spark.tables import load


def run_training_export(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    tokens_per_lang: int = 2000,
    seq_len: int = packing.SEQ_LEN,
) -> DataFrame:
    """Run the full curation flow; write the packed manifest (range-sorted
    by token_offset) to ``out_dir``; return the per-language summary.

    The manifest rows are (doc_id, lang, n_tokens, token_offset, seq_start,
    seq_end, n_seqs): everything a dataloader needs to slice fixed-length
    sequences without touching the text again.
    """
    docs = load(spark, sf_dir, "documents")

    kept = text_gopher_filter(spark, sf_dir).where(F.col("keep")).select("doc_id")
    canonical = (
        dedup_cluster_assignments(spark, sf_dir)
        .where(F.col("is_canonical"))
        .select("doc_id")
    )
    eligible = (
        docs.join(kept, "doc_id", "left_semi")
        .join(canonical, "doc_id", "left_semi")
        .select("doc_id", "lang", token_count_col("text").alias("n_tokens"))
    )
    selected = token_budget_mix(eligible, tokens_per_lang).select("doc_id", "lang")

    packed = packing.pack_sequences(
        docs.join(selected.select("doc_id"), "doc_id", "left_semi"),
        seq_len=seq_len,
    )
    manifest = packed.join(selected, "doc_id")
    export_range_sorted(manifest, out_dir, "token_offset", partitions=4)

    return (
        manifest.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (F.max(F.col("seq_end")) - F.min(F.col("seq_start")) + 1).alias(
                "n_sequences_spanned"
            ),
        )
        .orderBy("lang")
    )
