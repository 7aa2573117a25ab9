"""Repo-wide physical-plan guardrails over EVERY registered query.

Each per-operator plan test pins one property; this sweep pins the
invariants that must hold across the whole registry, so a future query
cannot ship a scale-killer unnoticed:

 - no CartesianProduct anywhere (the documented brute-force baselines are
   pair expansions via explode, not cartesian joins — they pass too);
 - no plan explosion (an operator count runaway signals accidental
   subtree duplication, the bug dedup_simhash_pairs once had).

Queries that EXECUTE work when called (streaming runs, iterative loops
with eager checkpoints, driver-side schema probes) are planned here too —
they're just slower to construct; the sweep budget stays small because
plan construction is lazy for everything else.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from simple_land_registry_data_ingestion_spark import plans
from tests.conftest import SF_ORACLE

#: Queries whose CALL already runs jobs to completion (streaming
#: availableNow drains; iterative loops checkpoint eagerly).  Their plans
#: are covered by their own tests; re-running them here would double suite
#: time for no new signal.
_EXECUTES_ON_CALL = {
    name
    for name in entry.queries()
    if name.startswith("stream_")
} | {
    "similarity_ivf_kmeans",      # Lloyd loop (eager per-iteration)
    "dedup_cluster_assignments",  # label propagation, localCheckpoint
    "dedup_simhash_pairs",        # eager fingerprint checkpoint
    "split_leakage_free",         # runs cluster assignment
    "dedup_canonical_by_quality", # runs cluster assignment
    # round-7 eager-checkpoint ops (argmax/selection loops materialize
    # per round at call time; their scale shapes are pinned in
    # tests/test_plans.py or by construction notes)
    "text_bpe_word_merges",       # 3 merge rounds, per-round checkpoint
    "sample_kcenter_coreset",     # k-1 farthest-point rounds
    "graph_degree_powerlaw",      # eager edge checkpoint
    "eval_multiclass_prf",        # eager confusion-cell checkpoint
    "eval_rank_correlation",      # eager hourly-rollup checkpoint
    "eval_pinball_loss",          # eager hourly-rollup checkpoint
    "graph_assortativity",        # eager edge checkpoint
}


@pytest.mark.parametrize(
    "name",
    sorted(n for n in entry.queries() if n not in _EXECUTES_ON_CALL),
)
def test_no_cartesian_and_bounded_plan(spark, name):
    df = entry.queries()[name](spark, SF_ORACLE)
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan}"
    # plan-explosion tripwire: the largest legitimate plan in the registry
    # (multiway joins, pair expansions) stays well under this
    n_ops = plan.count("\n(")
    assert n_ops < 120, f"{name} plan exploded to {n_ops} operators"
