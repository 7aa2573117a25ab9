"""End-to-end MODEL-EVALUATION REPORT pipeline: the evaluation operators
composed into the one artifact an offline-eval job actually publishes —
a single long-format metrics table.

    threshold metrics .... exact rank-sum AUC, calibration/Brier
    ranking metrics ...... NDCG@10, MRR@10 + HitRate@10, MAP@10
    agreement ............ Cohen's kappa, per-class F1 (macro-averaged here)
    uncertainty .......... conformal coverage at alpha=0.1
    replay ............... SNIPS off-policy value (overall)

This is the third composition next to pipeline_training (curate->pack)
and pipeline_rag_index (filter->dedup->index): every source operator is
individually hash-verified against its DuckDB twin; this module adds only
the composition — each metric frame reshaped to (family, metric, value)
and UNIONED, no driver-side loops, no collect.

Scale shape: the expensive inputs (the user-partitioned ranking window,
the global AUC rank) are each computed ONCE inside their operator; the
reshape is a scan-stage projection of frames that are already <= a few
hundred rows, and the union is 5 tiny frames — the report materializes
in one job.

Output: (family, metric, value DOUBLE) — one row per published metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.operators import evaluation


def _kv(df: DataFrame, family: str, metric_col: str, metric_name: str) -> DataFrame:
    return df.select(
        F.lit(family).alias("family"),
        F.lit(metric_name).alias("metric"),
        F.col(metric_col).cast("double").alias("value"),
    )


def run_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the long-format metrics report (family, metric, value)."""
    auc = _kv(evaluation.eval_auc_rank(spark, sf_dir), "threshold", "auc", "auc")
    brier = _kv(
        evaluation.eval_calibration_bins(spark, sf_dir)
        .agg(F.round(F.avg("brier"), 6).alias("brier_macro")),
        "threshold",
        "brier_macro",
        "brier_macro",
    )
    ndcg = _kv(
        evaluation.eval_ndcg_at_k(spark, sf_dir)
        .agg(F.round(F.avg("ndcg_at_k"), 6).alias("ndcg_mean")),
        "ranking",
        "ndcg_mean",
        "ndcg_at_10_mean",
    )
    mrr_frame = evaluation.eval_mrr_hit_rate(spark, sf_dir)
    mrr = _kv(mrr_frame, "ranking", "mrr_at_k", "mrr_at_10")
    hit = _kv(mrr_frame, "ranking", "hit_rate_at_k", "hit_rate_at_10")
    map_ = _kv(
        evaluation.eval_map_at_k(spark, sf_dir), "ranking", "map_at_k", "map_at_10"
    )
    kappa = _kv(
        evaluation.eval_cohens_kappa(spark, sf_dir), "agreement", "kappa", "kappa"
    )
    f1_macro = _kv(
        evaluation.eval_multiclass_prf(spark, sf_dir)
        .agg(F.round(F.avg("f1"), 6).alias("f1_macro")),
        "agreement",
        "f1_macro",
        "f1_macro",
    )
    coverage = _kv(
        evaluation.eval_conformal_interval(spark, sf_dir)
        .agg(F.round(F.avg("coverage"), 6).alias("coverage_mean")),
        "uncertainty",
        "coverage_mean",
        "conformal_coverage_mean",
    )
    snips = _kv(
        evaluation.eval_ips_offpolicy(spark, sf_dir)
        .agg(F.round(F.avg("snips_value"), 6).alias("snips_mean")),
        "replay",
        "snips_mean",
        "snips_value_mean",
    )
    out = auc
    for frame in [brier, ndcg, mrr, hit, map_, kappa, f1_macro, coverage, snips]:
        out = out.unionByName(frame)
    return out
