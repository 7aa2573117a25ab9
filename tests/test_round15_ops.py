"""Round-15 (optimization round) focused tests: internals changed by the
r15 performance work keep their contracts."""

from __future__ import annotations

import pytest

from simple_land_registry_data_ingestion_spark.functions import udfs
from tests.conftest import SF_ORACLE, SF_SMALL


def _cusum_reference(spark, sf_dir):
    """The pre-r15 grouped-map fold, kept here as the reference
    implementation: one pandas frame per user, per-group sort, the same
    (s + v) - 50 clamped recursion."""
    import pandas as pd
    from pyspark.sql import functions as F

    from simple_land_registry_data_ingestion_spark.tables import load

    def _group(pdf):
        pdf = pdf.sort_values(["ts", "event_id"])
        s = 0.0
        mx = 0.0
        n_over = 0
        for v in pdf["value"]:
            s = s + float(v) - 50.0
            if s < 0.0:
                s = 0.0
            if s > mx:
                mx = s
            if s > 100.0:
                n_over += 1
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "max_cusum": [round(mx, 6)],
                "n_over": [n_over],
            }
        )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return ev.groupBy("user_id").applyInPandas(_group, udfs._CUSUM_SCHEMA)


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_cusum_mapinpandas_matches_grouped_fold(spark, sf_dir):
    """The r15 mapInPandas form is bit-identical to the grouped-map fold."""
    got = sorted(
        map(tuple, udfs.events_cusum_pandas(spark, sf_dir).collect())
    )
    want = sorted(map(tuple, _cusum_reference(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_footer_schema_equals_spark_inference(spark, sf_dir):
    """The r15 load() fast path (pyarrow footer read -> Spark schema,
    replacing the per-call schema-inference job) must produce EXACTLY the
    schema Spark would infer — nullability, column order, timestamp unit
    and all — for every testdata table."""
    import os

    from simple_land_registry_data_ingestion_spark import tables

    for name in tables.TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        converted = tables._footer_schema(path)
        assert converted is not None, f"{name}: fast path unavailable"
        inferred = spark.read.parquet(path).schema
        assert converted == inferred, (
            f"{name}: converted {converted.simpleString()} != "
            f"inferred {inferred.simpleString()}"
        )


def test_cusum_carry_state_across_batch_boundary(spark):
    """A user whose rows span several Arrow batches folds identically:
    force tiny batches so every user crosses a batch boundary."""
    saved = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = sorted(
            map(tuple, udfs.events_cusum_pandas(spark, SF_SMALL).collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", saved
        )
    want = sorted(map(tuple, _cusum_reference(spark, SF_SMALL).collect()))
    assert got == want and len(got) > 0
