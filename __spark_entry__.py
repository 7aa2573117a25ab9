"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001.
``queries()`` maps every implemented operator (SURVEY.md section 2) to a
callable ``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
twin for each.  Column names/types are aligned on both sides (aggregates
aliased identically, integer-ish derived columns cast to BIGINT, doubles
rounded) so the order-insensitive value-hash compare is stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from simple_land_registry_data_ingestion_spark.functions import calendar, scalars
from simple_land_registry_data_ingestion_spark.operators import relational
from simple_land_registry_data_ingestion_spark.session import apply_session_defaults


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_session_defaults(spark)
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        apply_session_defaults(spark)
        return fn(spark, sf_dir)

    run.__name__ = fn.__name__
    run.__doc__ = fn.__doc__
    return run


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- ingest parity (reference A1 / S8 shapes) --
    "ingest_max_date": relational.ingest_max_date,
    "ingest_run_summary": relational.ingest_run_summary,
    # -- filters / projections / conditionals --
    "filter_project": relational.filter_project,
    "case_when_bucketing": relational.case_when_bucketing,
    # -- aggregations --
    "q1_pricing_summary": relational.q1_pricing_summary,
    "q6_revenue_filter": relational.q6_revenue_filter,
    "agg_distinct_counts": relational.agg_distinct_counts,
    "distinct_rows": relational.distinct_rows,
    "rollup_orders": relational.rollup_orders,
    "cube_lineitem": relational.cube_lineitem,
    # -- joins --
    "join_customer_orders": relational.join_customer_orders,
    "join_multiway": relational.join_multiway,
    "join_left_outer": relational.join_left_outer,
    "join_left_semi": relational.join_left_semi,
    "join_left_anti": relational.join_left_anti,
    "join_range_nonequi": relational.join_range_nonequi,
    # -- windows --
    "window_topk_per_group": relational.window_topk_per_group,
    "window_running_sum": relational.window_running_sum,
    "window_lag_lead": relational.window_lag_lead,
    # -- sort / limit / top-k --
    "sort_topk": relational.sort_topk,
    # -- set operations --
    "set_union_distinct": relational.set_union_distinct,
    "set_intersect_except": relational.set_intersect_except,
    # -- scalar function families --
    "scalar_string_funcs": scalars.scalar_string_funcs,
    "scalar_date_funcs": scalars.scalar_date_funcs,
    "scalar_math_funcs": scalars.scalar_math_funcs,
    "array_funcs": scalars.array_funcs,
    # -- calendar functions (reference F1-F5) --
    "calendar_working_days": calendar.calendar_working_days,
    "calendar_month_bounds": calendar.calendar_month_bounds,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: _wrap(fn) for name, fn in _QUERIES.items()}


_ORACLES: dict[str, str] = {
    "ingest_max_date": "SELECT CAST(MAX(l_shipdate) AS DATE) AS auto_date FROM lineitem",
    "ingest_run_summary": """
        SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
               CAST(MAX(l_shipdate) AS DATE) AS auto_date,
               CAST(MIN(l_shipdate) AS DATE) AS min_date
        FROM lineitem
    """,
    "filter_project": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
    """,
    "case_when_bucketing": """
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 200000 THEN 'medium'
                    ELSE 'large' END AS price_band,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 2) AS avg_qty,
               ROUND(AVG(l_extendedprice), 2) AS avg_price,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_revenue_filter": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    "agg_distinct_counts": """
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "distinct_rows": "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "rollup_orders": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "cube_lineitem": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "join_customer_orders": """
        SELECT c_custkey, c_name, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name, c_mktsegment
    """,
    "join_multiway": """
        SELECT r_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "join_left_outer": """
        SELECT c_custkey, c_name, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "join_left_semi": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    "join_left_anti": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_range_nonequi": """
        SELECT band,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders
        JOIN (VALUES ('small', 0.0, 50000.0),
                     ('medium', 50000.0, 200000.0),
                     ('large', 200000.0, 1e12)) AS bands(band, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
    """,
    "window_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank_in_cust
            FROM orders)
        WHERE rank_in_cust <= 2
    """,
    "window_running_sum": """
        SELECT user_id, event_id, ts,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        FROM events
    """,
    "window_lag_lead": """
        SELECT user_id, event_id,
               ROUND(LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value,
               ROUND(LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_value
        FROM events
    """,
    "sort_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "set_union_distinct": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        UNION
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    "set_intersect_except": """
        SELECT nationkey, 'customer_only' AS tag FROM (
            SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
            EXCEPT
            SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'both' AS tag FROM (
            SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
            INTERSECT
            SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
    """,
    "scalar_string_funcs": r"""
        SELECT p_partkey,
               UPPER(p_brand) AS brand_upper,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               REGEXP_EXTRACT(p_name, '^(\w+)', 1) AS first_word,
               'B:' || p_brand || '/S:' || CAST(p_size AS VARCHAR) AS brand_size,
               REPLACE(p_type, ' ', '_') AS type_snake,
               LOWER(TRIM(p_name)) AS name_norm
        FROM part
    """,
    "scalar_date_funcs": """
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
               CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
               CAST(DAYOFMONTH(o_orderdate) AS BIGINT) AS order_day,
               CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_ts,
               CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_1998_end,
               CAST(o_orderdate AS DATE) + 30 AS due_date
        FROM orders
    """,
    "scalar_math_funcs": """
        SELECT l_orderkey,
               CAST(l_linenumber AS BIGINT) AS linenumber,
               ROUND(l_extendedprice, 1) AS price_r1,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
               ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
               ROUND(LN(l_extendedprice), 6) AS price_ln,
               ROUND(ABS(l_discount - 0.05), 4) AS disc_dev,
               CAST(l_orderkey % 7 AS BIGINT) AS okey_mod7
        FROM lineitem
    """,
    "array_funcs": """
        SELECT vec_id,
               CAST(LEN(embedding) AS BIGINT) AS dim,
               ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
               ROUND(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                     + CAST(embedding[3] AS DOUBLE), 6) AS head3_sum,
               ROUND(LIST_REDUCE(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x * x),
                                 (a, b) -> a + b), 6) AS norm_sq,
               CAST(label AS BIGINT) AS label
        FROM embeddings
    """,
    "calendar_working_days": """
        WITH months AS (
            SELECT DISTINCT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start
            FROM orders),
        days AS (
            SELECT month_start,
                   CAST(UNNEST(RANGE(CAST(month_start AS TIMESTAMP),
                                     CAST(month_start AS TIMESTAMP) + INTERVAL 1 MONTH,
                                     INTERVAL 1 DAY)) AS DATE) AS d
            FROM months),
        wd AS (
            SELECT month_start, d,
                   ROW_NUMBER() OVER (PARTITION BY month_start ORDER BY d) AS rn
            FROM days WHERE DAYOFWEEK(d) BETWEEN 1 AND 5)
        SELECT month_start,
               MAX(CASE WHEN rn = 5 THEN d END) AS wd_5,
               MAX(CASE WHEN rn = 20 THEN d END) AS wd_20,
               CAST(COUNT(*) AS BIGINT) AS n_working_days
        FROM wd GROUP BY month_start
    """,
    "calendar_month_bounds": """
        SELECT o_orderkey,
               LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month_same_day,
               CAST(DATEDIFF('day', CAST(o_orderdate AS DATE),
                             LAST_DAY(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_to_month_end
        FROM orders
    """,
}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI twins for each ``queries()`` entry."""
    return dict(_ORACLES)
