"""DDL parity tests (reference create_table_*.py scripts -> Spark catalog)."""

from __future__ import annotations

from pyspark.sql import Row

from simple_land_registry_data_ingestion_spark import ddl


def test_recreate_all_tables_round_trip(spark):
    created = ddl.recreate_all_tables(spark, database="ddl_test")
    try:
        tables = {
            t.name for t in spark.catalog.listTables("ddl_test")
        }
        assert set(created) <= tables
        # schema faithfulness: the fact table carries all 16 reference
        # columns + the partition column
        cols = [f.name for f in spark.table("ddl_test.pp_complete_data").schema]
        assert len(cols) == 17
        assert cols[-1] == "transaction_year"  # partition col is last
        # write/read round-trip through the metadata table (reference S8)
        spark.createDataFrame(
            [Row(string_column="hello world", int_column=1)]
        ).write.mode("append").saveAsTable("ddl_test.test_table")
        assert spark.table("ddl_test.test_table").count() == 1
        # idempotent recreate drops the row (reference drop-first semantics)
        ddl.recreate_all_tables(spark, database="ddl_test")
        assert spark.table("ddl_test.test_table").count() == 0
    finally:
        for name in created:
            ddl.drop_table(spark, name, database="ddl_test")
        spark.sql("DROP DATABASE IF EXISTS ddl_test")
