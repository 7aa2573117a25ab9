"""DDL surface: create/drop the reference's tables in the Spark catalog.

Mirrors the reference's DDL scripts (reference
create_table_pp_complete_data.py:17-27, create_table_pp_complete_metadata.py,
create_test_table.py, orchestration create_table_recreate_all_tables.py:6-11):
CREATE SCHEMA IF NOT EXISTS + per-table create, with an optional drop-first
recreate.  The reference drives SQLAlchemy ORM metadata at Postgres; here the
same declared schemas (schemas.py) drive ``spark.sql`` DDL against the
catalog, producing managed parquet tables.

At 100 TB the only addition is PARTITIONED BY on the fact table — included
here (year of transaction_date) because partition layout is a CREATE-time
decision that cannot be retrofitted without rewriting the data.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from simple_land_registry_data_ingestion_spark.schemas import (
    PP_COMPLETE_METADATA_SCHEMA,
    PP_COMPLETE_SCHEMA,
    TEST_TABLE_SCHEMA,
)

logger = logging.getLogger(__name__)

DATABASE = "land_registry_simple"

#: table name -> (StructType, partition columns).  The partition column must
#: exist in the schema; pp_complete_data gains a derived ``transaction_year``.
#: Built as a NEW StructType — ``StructType.add`` mutates (and returns) self,
#: so calling it on the shared schemas.PP_COMPLETE_SCHEMA constant would
#: permanently grow the 16-column schema for every other importer.
_TABLES: dict[str, tuple[T.StructType, list[str]]] = {
    "pp_complete_data": (
        T.StructType(
            [*PP_COMPLETE_SCHEMA.fields,
             T.StructField("transaction_year", T.IntegerType(), True)]
        ),
        ["transaction_year"],
    ),
    "pp_complete_metadata": (PP_COMPLETE_METADATA_SCHEMA, []),
    "test_table": (TEST_TABLE_SCHEMA, []),
}


def _ddl_columns(schema: T.StructType) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)


def create_database(spark: SparkSession, database: str = DATABASE) -> None:
    """CREATE SCHEMA IF NOT EXISTS (reference create_table_pp_complete_data.py:17)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`")


def create_table(
    spark: SparkSession, name: str, database: str = DATABASE
) -> None:
    """Create one managed parquet table from its declared StructType."""
    schema, partition_cols = _TABLES[name]
    partition_clause = (
        f" PARTITIONED BY ({', '.join(f'`{c}`' for c in partition_cols)})"
        if partition_cols
        else ""
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{database}`.`{name}` "
        f"({_ddl_columns(schema)}) USING parquet{partition_clause}"
    )
    logger.info("created table %s.%s", database, name)


def drop_table(spark: SparkSession, name: str, database: str = DATABASE) -> None:
    """DROP TABLE IF EXISTS (reference create_table_*.py:25)."""
    spark.sql(f"DROP TABLE IF EXISTS `{database}`.`{name}`")


def recreate_all_tables(
    spark: SparkSession, database: str = DATABASE, drop_first: bool = True
) -> list[str]:
    """Drop-and-create every table (reference
    create_table_recreate_all_tables.py:6-11).  Returns the created names."""
    create_database(spark, database)
    for name in _TABLES:
        if drop_first:
            drop_table(spark, name, database)
        create_table(spark, name, database)
    return list(_TABLES)
