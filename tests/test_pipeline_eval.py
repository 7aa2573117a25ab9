"""E2E test for the composed evaluation-report pipeline: every family
present, values in range, and spot-agreement with the source operators
(which are themselves oracle-verified)."""

from __future__ import annotations

from simple_land_registry_data_ingestion_spark import pipeline_eval
from simple_land_registry_data_ingestion_spark.operators import evaluation
from tests.conftest import SF_ORACLE


def test_eval_report_composes_all_families(spark):
    rows = {
        (r["family"], r["metric"]): r["value"]
        for r in pipeline_eval.run_eval_report(spark, SF_ORACLE).collect()
    }
    assert len(rows) == 10
    assert {f for f, _ in rows} == {
        "threshold", "ranking", "agreement", "uncertainty", "replay"
    }
    # bounded metrics stay in range
    for key in [("threshold", "auc"), ("ranking", "mrr_at_10"),
                ("ranking", "hit_rate_at_10"), ("ranking", "map_at_10"),
                ("uncertainty", "conformal_coverage_mean")]:
        assert 0.0 <= rows[key] <= 1.0, (key, rows[key])
    # kappa is chance-corrected: in [-1, 1]
    assert -1.0 <= rows[("agreement", "kappa")] <= 1.0
    # spot-agreement with a source operator
    auc = evaluation.eval_auc_rank(spark, SF_ORACLE).collect()[0]["auc"]
    assert rows[("threshold", "auc")] == auc
    # conformal guarantee holds empirically at alpha=0.1
    assert rows[("uncertainty", "conformal_coverage_mean")] >= 0.85
