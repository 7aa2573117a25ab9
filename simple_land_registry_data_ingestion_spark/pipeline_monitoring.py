"""End-to-end DATA-QUALITY / DRIFT MONITORING pipeline: the profiling and
drift operators composed into the single long-format report a scheduled
monitoring job publishes per snapshot.

    contract checks ..... expectations suite pass/fail counts,
                          referential-integrity orphan ppm per FK edge,
                          sample-ratio-mismatch chi-square per type
    drift ............... PSI per event type (ref vs current period),
                          two-sample KS D per event type,
                          Page-Hinkley mean-drift alarm per type (round 8)
    distribution ........ chi-square total over value bands,
                          Benford max-digit deviation,
                          MAD outlier fraction per type (round 8)
    freshness ........... hourly calendar-gap fraction per type (round 8)

This is the fifth composition next to pipeline (ingest), pipeline_training
(curate->pack), pipeline_rag_index (filter->dedup->index), and
pipeline_eval (metrics report): every source operator is individually
hash-verified against its DuckDB twin; this module adds ONLY the
composition — each frame reshaped to (family, check, value, alarmed) and
UNIONED.  No driver-side loops, no collect.

Alarm thresholds are pinned literals (PSI > 0.25, KS D > 0.1, orphan ppm
> 0, any failed expectation) — the point of the report is a one-column
answer to "can this snapshot ship?".

Scale shape: each input is one or two map-side-combined aggregations over
a single scan (the drift pair shares the events scan via Catalyst's
exchange reuse when materialized together); every reshaped frame is
< 100 rows, so the report is executor-cheap at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.functions import udfs
from simple_land_registry_data_ingestion_spark.operators import relational


def run_monitoring_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the long-format report (family, check, value, alarmed)."""
    expect = relational.profile_expectations(spark, sf_dir).select(
        F.lit("contract").alias("family"),
        F.concat(F.lit("expect:"), F.col("table_name"), F.lit("."),
                 F.col("expectation")).alias("check"),
        F.col("n_failed").cast("double").alias("value"),
        (~F.col("passed")).alias("alarmed"),
    )
    fk = relational.audit_referential_integrity(spark, sf_dir).select(
        F.lit("contract").alias("family"),
        F.concat(F.lit("fk:"), F.col("fk_name")).alias("check"),
        F.col("orphan_ppm").cast("double").alias("value"),
        (F.col("orphan_ppm") > 0).alias("alarmed"),
    )
    psi = relational.events_psi_drift(spark, sf_dir).select(
        F.lit("drift").alias("family"),
        F.concat(F.lit("psi:"), F.col("event_type")).alias("check"),
        F.col("psi").cast("double").alias("value"),
        (F.col("psi").cast("double") > 0.25).alias("alarmed"),
    )
    srm = relational.events_ab_srm_check(spark, sf_dir).select(
        F.lit("contract").alias("family"),
        F.concat(F.lit("srm:"), F.col("event_type")).alias("check"),
        F.col("chi2").alias("value"),
        F.col("srm_detected").alias("alarmed"),
    )
    ks = relational.events_ks_test(spark, sf_dir).select(
        F.lit("drift").alias("family"),
        F.concat(F.lit("ks:"), F.col("event_type")).alias("check"),
        F.col("ks_d").cast("double").alias("value"),
        (F.col("ks_d") > 0.1).alias("alarmed"),
    )
    chi = (
        relational.events_chi_square(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.round(F.sum("chi2_term"), 6).alias("chi2"))
        .select(
            F.lit("distribution").alias("family"),
            F.concat(F.lit("chi2:"), F.col("event_type")).alias("check"),
            F.col("chi2").cast("double").alias("value"),
            F.lit(False).alias("alarmed"),
        )
    )
    benford = (
        relational.profile_benford_deviation(spark, sf_dir)
        .groupBy()
        .agg(F.round(F.max("abs_deviation"), 6).alias("max_dev"))
        .select(
            F.lit("distribution").alias("family"),
            F.lit("benford:max_digit_deviation").alias("check"),
            F.col("max_dev").cast("double").alias("value"),
            (F.col("max_dev") > 0.05).alias("alarmed"),
        )
    )
    ph = udfs.events_page_hinkley_drift(spark, sf_dir).select(
        F.lit("drift").alias("family"),
        F.concat(F.lit("page_hinkley:"), F.col("event_type")).alias("check"),
        F.col("ph_stat").cast("double").alias("value"),
        (F.col("n_alarms") > 0).alias("alarmed"),
    )
    mad = relational.events_mad_outliers(spark, sf_dir).select(
        F.lit("distribution").alias("family"),
        F.concat(F.lit("mad_outliers:"), F.col("event_type")).alias("check"),
        F.round(
            F.col("n_outliers").cast("double") / F.col("n").cast("double"), 6
        ).alias("value"),
        (
            F.col("n_outliers").cast("double") / F.col("n").cast("double")
            > 0.01
        ).alias("alarmed"),
    )
    gaps = (
        relational.events_gap_fill_interpolate(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("was_gap").cast("long")).cast("long").alias("n_gaps"),
            F.count(F.lit(1)).cast("long").alias("n_hours"),
        )
        .select(
            F.lit("freshness").alias("family"),
            F.concat(F.lit("gaps:"), F.col("event_type")).alias("check"),
            # r8 advice: publish the calendar-gap FRACTION (what the module
            # doc promises and the alarm predicate tests), not the raw count
            F.round(
                F.col("n_gaps").cast("double") / F.col("n_hours").cast("double"),
                6,
            ).alias("value"),
            (
                F.col("n_gaps").cast("double") / F.col("n_hours").cast("double")
                > 0.1
            ).alias("alarmed"),
        )
    )
    out = expect
    for frame in [fk, srm, psi, ks, chi, benford, ph, mad, gaps]:
        out = out.unionByName(frame)
    return out


def snapshot_ships(report: DataFrame) -> DataFrame:
    """One-row verdict: the snapshot ships iff nothing alarmed."""
    return report.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_checks"),
        F.sum(F.col("alarmed").cast("int")).cast("long").alias("n_alarmed"),
        (F.sum(F.col("alarmed").cast("int")) == 0).alias("ships"),
    )
