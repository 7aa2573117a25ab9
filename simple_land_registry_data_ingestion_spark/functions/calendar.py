"""Land-Registry publication-calendar functions.

The reference ships these as plain-Python scalar functions in
``lib_land_registry_data/lib_datetime_not_used.py`` (dead code, but the only
scalar-function library it has — SURVEY.md section 2.8 F1-F5).  Here they are
column EXPRESSIONS built from sequence/filter/get — fully JVM-side and
codegen-friendly, no UDF, so they vectorize over billions of rows.

Semantics note: where the reference raises on a nonexistent nth working day
(lib_datetime_not_used.py:34-40), the column form yields NULL — the
relational convention for partial functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.tables import load


def working_days_of_month(d: Column) -> Column:
    """Array of all Mon-Fri dates in the month containing date ``d``."""
    days = F.sequence(F.trunc(d, "month"), F.last_day(d))
    # dayofweek: 1=Sunday .. 7=Saturday
    return F.filter(days, lambda x: ~F.dayofweek(x).isin(1, 7))


def nth_working_day_of_month(d: Column, nth: int) -> Column:
    """F1 (reference lib_datetime_not_used.py:14-40): the nth working day of
    the month containing ``d`` (1-based); NULL if the month has fewer."""
    return F.get(working_days_of_month(d), nth - 1)


def data_publish_datestamp_for_threshold(d: Column) -> Column:
    """F2 (reference lib_datetime_not_used.py:43-68): data with threshold
    date ``d`` is published on the 20th working day of the FOLLOWING month."""
    first_of_next = F.add_months(F.trunc(d, "month"), 1)
    return nth_working_day_of_month(first_of_next, 20)


def most_recent_publish_datestamp(d: Column) -> Column:
    """F3 (reference lib_datetime_not_used.py:71-114): most recent publish
    date (20th working day of a month) on or before ``d``."""
    d = F.to_date(d)
    this_month = nth_working_day_of_month(d, 20)
    prev_month = nth_working_day_of_month(F.add_months(F.trunc(d, "month"), -1), 20)
    return F.when(d >= this_month, this_month).otherwise(prev_month)


def threshold_datestamp_for_publish(d: Column) -> Column:
    """F5 (reference lib_datetime_not_used.py:130-132): a publish date covers
    data up to the last day of the publish month."""
    return F.last_day(most_recent_publish_datestamp(d))


# ---------------------------------------------------------------------------
# Query wrappers (driver-verifiable against DuckDB oracles)
# ---------------------------------------------------------------------------

def calendar_working_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per distinct order month: 5th and 20th working day + working-day
    count.  Months are distinct-ed FIRST (tiny set), so the per-month array
    expansion happens on dozens of rows, not billions."""
    orders = load(spark, sf_dir, "orders")
    months = orders.select(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month_start")
    ).distinct()
    return months.select(
        "month_start",
        nth_working_day_of_month(F.col("month_start"), 5).alias("wd_5"),
        nth_working_day_of_month(F.col("month_start"), 20).alias("wd_20"),
        F.size(working_days_of_month(F.col("month_start")))
        .cast("long")
        .alias("n_working_days"),
    )


def calendar_publish_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3/F5 parity (reference lib_datetime_not_used.py:43-132): for two
    sample dates per distinct order month (day 10 and day 28, exercising the
    before/after-publish branches of F3), the publish date following a
    threshold, the most recent publish date, and the threshold it covers."""
    orders = load(spark, sf_dir, "orders")
    months = orders.select(
        F.trunc(F.to_date("o_orderdate"), "month").alias("m")
    ).distinct()
    samples = months.select(
        F.explode(
            F.array(F.date_add(F.col("m"), 9), F.date_add(F.col("m"), 27))
        ).alias("d")
    )
    return samples.select(
        F.col("d").alias("sample_date"),
        data_publish_datestamp_for_threshold(F.col("d")).alias("publish_after_threshold"),
        most_recent_publish_datestamp(F.col("d")).alias("latest_publish"),
        threshold_datestamp_for_publish(F.col("d")).alias("threshold_covered"),
    )


def calendar_month_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 last_day (exact built-in, reference lib_datetime_not_used.py:117-127)
    + month arithmetic per order."""
    orders = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        F.add_months(d, 1).alias("next_month_same_day"),
        F.datediff(F.last_day(d), d).cast("long").alias("days_to_month_end"),
    )
