"""Schema-evolution reads: a parquet directory whose files were written
under DIFFERENT schema versions (columns added over time) must read as one
unified table with NULL backfill — the lakehouse ingestion reality the
reference never faces (its CSV schema is fixed, reference main.py:150-175)
but any long-lived 100 TB table does.

Pinned behaviors: the unified ``mergeSchema`` read sees the union of
columns with NULL backfill in old files' rows, and predicate pushdown +
column pruning survive the merged schema (a filter on the ADDED column
still reaches the scan).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _write_two_generations(spark, path: str) -> None:
    gen1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, name string"
    )
    gen1.coalesce(1).write.mode("overwrite").parquet(f"{path}/gen=1")
    gen2 = spark.createDataFrame(
        [(3, "gamma", 0.5), (4, "delta", 1.5)],
        "id long, name string, score double",
    )
    gen2.coalesce(1).write.mode("overwrite").parquet(f"{path}/gen=2")


def test_merge_schema_unifies_added_column(spark, tmp_path):
    path = str(tmp_path / "evolving")
    _write_two_generations(spark, path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "name", "score", "gen"}
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 4
    # old-generation rows backfill NULL in the added column
    assert rows[1]["score"] is None and rows[2]["score"] is None
    assert rows[3]["score"] == 0.5 and rows[4]["score"] == 1.5
    # values from both generations intact
    assert rows[1]["name"] == "alpha" and rows[4]["name"] == "delta"


def test_merge_schema_filter_still_prunes(spark, tmp_path):
    """The unified read must keep predicate pushdown: a filter on the
    added column reaches the scan (old files prune via missing-column
    statistics, not a post-scan filter over everything)."""
    path = str(tmp_path / "evolving2")
    _write_two_generations(spark, path)
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .where(F.col("score") > 1.0)
        .select("id", "score")
    )
    out = df.collect()
    assert [(r["id"], r["score"]) for r in out] == [(4, 1.5)]
    from simple_land_registry_data_ingestion_spark import plans

    pushed = plans.pushed_filters(df)
    assert any("score" in p for p in pushed), pushed
    schemas = plans.read_schemas(df)
    # column pruning holds across schema versions: only id + score read
    assert schemas and all("name" not in s for s in schemas), schemas
