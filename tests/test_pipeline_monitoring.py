"""E2E test for the monitoring-report composition: the report runs on
real testdata, covers every family, and the ship verdict aggregates it."""

from __future__ import annotations

from simple_land_registry_data_ingestion_spark.pipeline_monitoring import (
    run_monitoring_report,
    snapshot_ships,
)
from tests.conftest import SF_ORACLE


def test_monitoring_report_covers_all_families(spark):
    report = run_monitoring_report(spark, SF_ORACLE)
    rows = report.collect()
    fams = {r["family"] for r in rows}
    assert fams == {"contract", "drift", "distribution", "freshness"}
    checks = {r["check"] for r in rows}
    # one psi + one ks row per event type
    assert sum(c.startswith("psi:") for c in checks) == 5
    assert sum(c.startswith("ks:") for c in checks) == 5
    assert any(c.startswith("fk:") for c in checks)
    assert sum(c.startswith("srm:") for c in checks) == 5
    assert any(c.startswith("expect:") for c in checks)
    # round-8 detectors: Page-Hinkley + MAD fence + calendar-gap monitor
    assert sum(c.startswith("page_hinkley:") for c in checks) == 5
    assert sum(c.startswith("mad_outliers:") for c in checks) == 5
    assert sum(c.startswith("gaps:") for c in checks) == 5
    assert all(r["value"] is not None for r in rows)


def test_ship_verdict_counts_alarms(spark):
    report = run_monitoring_report(spark, SF_ORACLE)
    v = snapshot_ships(report).collect()[0]
    assert v["n_checks"] == report.count()
    assert v["ships"] == (v["n_alarmed"] == 0)
