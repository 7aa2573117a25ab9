"""String / date / math / array scalar-function families (SURVEY 2.8 F9).

The reference has no scalar functions beyond its calendar helpers; these
queries exercise the built-in families the new engine exposes.  Everything is
a codegen'd JVM expression — scalar functions are free at 100 TB as long as
they stay out of Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.tables import load


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/substring/concat/regexp_extract/trim/replace."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat(F.lit("B:"), F.col("p_brand"), F.lit("/S:"), F.col("p_size").cast("string")).alias("brand_size"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lower(F.trim(F.col("p_name"))).alias("name_norm"),
    )


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day extraction, date_trunc, datediff, date arithmetic."""
    orders = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.quarter(d).cast("long").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_ts"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).cast("long").alias("days_to_1998_end"),
        F.date_add(d, 30).alias("due_date"),
    )


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/round/floor/ceil/sqrt/ln/pow/mod over prices."""
    lineitem = load(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    return lineitem.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("linenumber"),
        F.round(p, 1).alias("price_r1"),
        F.floor(p).cast("long").alias("price_floor"),
        F.ceil(p).cast("long").alias("price_ceil"),
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        (F.col("l_orderkey") % 7).cast("long").alias("okey_mod7"),
    )


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array manipulation over the embedding column: size, indexing, slice
    aggregation, element-wise transform — the building blocks the similarity
    operators compose (all JVM higher-order functions, no UDF)."""
    emb = load(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    head3 = F.slice(vec, 1, 3)
    return emb.select(
        "vec_id",
        F.size(vec).cast("long").alias("dim"),
        F.round(F.get(vec, 0).cast("double"), 6).alias("first_component"),
        F.round(
            F.aggregate(head3, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("head3_sum"),
        F.round(
            F.aggregate(
                F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("norm_sq"),
        F.col("label").cast("long").alias("label"),
    )
