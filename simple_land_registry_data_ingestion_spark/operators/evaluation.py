"""Model-evaluation operators: the offline metrics a training-data /
quality-classifier pipeline computes at scale (exact AUC from rank sums,
calibration reliability bins with Brier score).

The reference has no evaluation surface (it is a single-purpose ETL,
reference main.py:71-372); these are the ABSENT-side operators a corpus
pipeline needs the moment it trains a quality or filter model on the data
it ships.

Float discipline (the repo convention): everything that crosses the hash
gate is either BIGINT, a PICKED parquet value, or a per-row 6/12-dp
DECIMAL quantization whose SUM is exact and order-free; the final ratios
are single double expressions written identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.tables import load


def eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of "event value predicts purchase" via the
    Mann-Whitney rank-sum identity — the way AUC is computed at scale
    (one rank pass), not by threshold sweeping:

        AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg)

    with midranks for ties.  Everything before the final division is
    INTEGER: per-row doubled midrank 2·rank_min + (ties−1) (so the .5
    midranks never materialize as floats), summed over positives as
    BIGINT; the one double division rounds 6dp.  Ties on the score are
    handled exactly as scipy/sklearn do (average rank).

    Scale shape: ONE global rank over (value, then ties counted per
    value) — at 100 TB this is the two-phase distributed rank
    (per-partition rank + offset merge, the events_quantile_normalize
    precedent); the window here declares the same semantics.  After the
    rank, a single ungrouped BIGINT aggregate."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.col("value"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    w_rank = Window.orderBy("value")
    ranked = ev.select(
        "y",
        F.rank().over(w_rank).cast("long").alias("rank_min"),
        F.count(F.lit(1))
        .over(Window.partitionBy("value"))
        .cast("long")
        .alias("ties"),
    )
    agg = ranked.agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("n_neg"),
        F.sum(
            F.when(
                F.col("y") == 1,
                F.lit(2) * F.col("rank_min") + (F.col("ties") - F.lit(1)),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("r_pos_x2"),
    )
    auc = (
        F.col("r_pos_x2").cast("double") / F.lit(2.0)
        - F.col("n_pos").cast("double")
        * (F.col("n_pos") + F.lit(1)).cast("double")
        / F.lit(2.0)
    ) / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
    return agg.select(
        "n_pos", "n_neg", "r_pos_x2", F.round(auc, 6).alias("auc")
    )


def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration reliability diagram + per-bin Brier score for a
    synthetic quality-classifier: the pre-release check that a score
    used to FILTER the corpus actually means what it says (a 0.9 bucket
    should be ~90% positive).

    The corpus carries no model scores, so each event gets a
    deterministic planted probability from event_id arithmetic
    (the text_pii_scan planting pattern): positives draw from the upper
    range, negatives from the lower, so the diagram is non-trivially
    sloped and the green hash certifies binning + both metrics exactly.

    Float discipline: p is quantized to DECIMAL(9,6) at creation (sum
    exact, order-free); the per-row Brier term (p−y)² is one double
    multiply rounded 12dp into DECIMAL(18,12) before the sum; the three
    per-bin ratios are single double divisions rounded 6dp.

    Scale shape: pure scan-stage arithmetic then ONE map-side-combined
    aggregation on the 10-value bin key."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    mixed = (F.col("event_id") * 2654435761 + 13).cast("long")
    raw = F.when(
        F.col("y") == 1, F.lit(450) + (mixed % 549)
    ).otherwise(mixed % 700)
    p = F.round(raw.cast("double") / F.lit(999.0), 6).cast("decimal(9,6)")
    scored = ev.select(
        "y",
        p.alias("p"),
        F.least(
            F.lit(9), F.floor(p.cast("double") * 10).cast("long")
        ).alias("bin"),
    )
    brier_term = F.round(
        (F.col("p").cast("double") - F.col("y"))
        * (F.col("p").cast("double") - F.col("y")),
        12,
    ).cast("decimal(18,12)")
    return (
        scored.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("p").alias("sum_p"),
            F.sum(brier_term).alias("sum_bt"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(
                F.col("sum_p").cast("double") / F.col("n").cast("double"), 6
            ).alias("avg_p"),
            F.round(
                F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
            ).alias("frac_pos"),
            F.round(
                F.col("sum_bt").cast("double") / F.col("n").cast("double"), 6
            ).alias("brier"),
        )
    )
