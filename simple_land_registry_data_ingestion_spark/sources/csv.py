r"""CSV scan with the reference's exact null/empty semantics (S3 + E4).

The reference reads the headerless pp-complete CSV as all-string with pandas
inference OFF and NA-detection OFF (``dtype=str, keep_default_na=False``,
reference main.py:204-210), so an empty field is an empty STRING, and only
the ``\N`` sentinel becomes NULL at the COPY layer (main.py:200).

Spark translation: declared schema (never inferSchema — saves a full extra
scan at 100 TB) + expression-level sentinel mapping.  Spark's CSV parser
(univocity) collapses unquoted empty fields to NULL no matter what
``nullValue`` is set to, so the E4 semantics are restored AFTER the parse
with per-column codegen'd expressions: parser-NULL -> empty string (it was an
empty field), literal ``\N`` -> NULL (the sentinel).  Cost at 100 TB: zero —
the CASE WHEN fuses into the same whole-stage-codegen pass as the scan.

The reference's 50,000-row chunking (main.py:180) has no translation: Spark
partitions the file by byte ranges (``spark.sql.files.maxPartitionBytes``)
and streams each split — chunking is an execution detail, not semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.schemas import (
    PP_COMPLETE_RAW_SCHEMA,
    PP_NULL_SENTINEL,
    PP_TIMESTAMP_FORMAT,
)


def read_pp_complete_csv(spark: SparkSession, path: str) -> DataFrame:
    """Raw all-string read of the pp-complete feed (no header row), with the
    reference's null semantics: empty field = empty string, ``\\N`` = NULL."""
    raw = (
        spark.read.schema(PP_COMPLETE_RAW_SCHEMA)
        .options(
            header="false",
            # multi-line quoted fields do not occur in the feed; keeping the
            # default (off) preserves split-parallel scanning
            quote='"',
            escape='"',
        )
        .csv(path)
    )
    fixed = [
        F.when(F.col(c).isNull(), F.lit(""))
        .when(F.col(c) == PP_NULL_SENTINEL, F.lit(None))
        .otherwise(F.col(c))
        .alias(c)
        for c in raw.columns
    ]
    return raw.select(*fixed)


def parse_transaction_date(col: Column | str) -> Column:
    """String -> timestamp with the feed's exact format (reference
    main.py:218-222, '%Y-%m-%d %H:%M' in strptime dialect)."""
    return F.to_timestamp(col, PP_TIMESTAMP_FORMAT)


def with_pp_complete_types(df: DataFrame) -> DataFrame:
    """Apply the at-rest types (reference lib_db.py:19-39): price -> long,
    transaction_date -> timestamp; all other columns stay string."""
    return df.withColumn("price", F.col("price").cast("long")).withColumn(
        "transaction_date", parse_transaction_date("transaction_date")
    )
