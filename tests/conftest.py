"""Shared SparkSession fixture (session-scoped; one JVM for the whole run)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from simple_land_registry_data_ingestion_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="slr-tests", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # State-store maintenance (snapshot/cleanup) races finishing streaming
    # queries when dozens share one test JVM — the round-3 full-suite flake.
    # Tests never benefit from maintenance (every stream is availableNow and
    # short-lived), so push it past any plausible suite duration.
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    yield spark
    spark.stop()
