"""As-of (most-recent-match) join.

Spark has no ASOF JOIN operator; the reference (a pandas->Postgres ETL,
main.py:174-271) has no joins at all.  This implements the standard
Spark-first composition for an as-of join against a SMALL versioned
dimension: interval-ize the dimension with ``lead()`` (each version row
becomes a [valid_from, valid_to) interval), then BROADCAST range-join the
fact table against the intervals.  Each fact row matches exactly one
interval, so the join never duplicates and never shuffles the fact side.

Scale notes: the window that interval-izes the dimension is a single-
partition sort, which is fine *only because the dimension is tiny* (tens of
rows — one per quarter).  The fact side streams through a
BroadcastNestedLoopJoin / broadcast range join with zero exchanges.  For a
LARGE right side (e.g. trades-vs-quotes as-of), the composition switches to
union + per-key window (partitioned by the join key), which shuffles once
on the key — both variants stay O(one pass) over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.tables import load


def join_asof_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join orders -> quarterly rate table (most recent rate at or
    before the order date).

    The rate dimension is derived deterministically from the data: one row
    per Q1/Q3 quarter-start observed in ``orders`` (Q2/Q4 deliberately
    dropped so the as-of match is non-trivial — a Q2 order must reach back
    to the Q1 rate).  Orders before the first rate row drop out (inner
    as-of semantics).
    """
    orders = load(spark, sf_dir, "orders")

    rates = (
        orders.select(
            F.date_trunc("quarter", F.col("o_orderdate")).cast("date").alias("rate_date")
        )
        .distinct()
        .where(F.quarter("rate_date").isin(1, 3))
        .withColumn(
            "rate",
            F.round(
                F.lit(1.0)
                + (F.year("rate_date") % 5) * 0.01
                + F.quarter("rate_date") * 0.001,
                6,
            ),
        )
    )

    # Interval-ize: single-partition window is safe on a tens-of-rows dim.
    w = Window.orderBy("rate_date")
    intervals = rates.withColumn("rate_until", F.lead("rate_date").over(w))

    odate = F.to_date("o_orderdate")
    return (
        orders.join(
            F.broadcast(intervals),
            (odate >= F.col("rate_date"))
            & (F.col("rate_until").isNull() | (odate < F.col("rate_until"))),
        )
        .select(
            "o_orderkey",
            F.col("rate_date").alias("asof_date"),
            "rate",
            # no explicit round: the double product is IEEE-identical across
            # engines, while ROUND at a half-boundary is not
            (F.col("o_totalprice") * F.col("rate")).alias("adj_price"),
        )
    )
