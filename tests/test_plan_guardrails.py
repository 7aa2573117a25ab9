"""Repo-wide physical-plan guardrails over EVERY registered query.

Each per-operator plan test pins one property; this sweep pins the
invariants that must hold across the whole registry, so a future query
cannot ship a scale-killer unnoticed:

 - no CartesianProduct anywhere (the documented brute-force baselines are
   pair expansions via explode, not cartesian joins — they pass too);
 - no plan explosion (an operator count runaway signals accidental
   subtree duplication, the bug dedup_simhash_pairs once had);
 - no Window with an EMPTY partition spec (a global sort that executes
   as ONE task) unless the query is on the audited allowlist of
   provably-bounded frames below (r11 — VERDICT r10 item 7).

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


#: Queries whose plan legitimately contains a Window with an EMPTY
#: partition spec — each one audited (r11) to fold over a PROVABLY
#: BOUNDED frame, never the row-level data.  Three bounded classes:
#:   (bucket)  the offsets/boundary table of a two-phase global
#:             rank / prefix sum — one row per range bucket, bounded by
#:             the value DOMAIN (floor(acctbal) ~11k, floor(log2(cnt))
#:             ~40, floor(cos*1e3) ~2k), not by row count;
#:   (grid)    a domain grid — calendar days/months/hours, deciles,
#:             duration levels, price ticks, distinct cent values of a
#:             bounded measure, the 31-row region/nation rollup;
#:   (limit)   a frame that sits ABOVE a LIMIT k, so the window sees
#:             <= k rows by construction (TakeOrdered-then-rank).
#: Anything NOT listed here that plans an empty-partition window is a
#: new single-task global sort — the exact scale-killer class VERDICT
#: r10 item 1 retired — and must either adopt a two-phase mechanism or
#: argue its way onto this list with a bounded-frame justification.
_BOUNDED_GLOBAL_WINDOWS = {
    "agg_approx_quantile_error": "bucket: two-phase offsets (floor(price/64), price-domain bounded ~1.7k)",
    "customers_gini_concentration": "bucket: two-phase prefix offsets",
    "customers_woe_binning": "bucket: two-phase rank offsets (floor(acctbal) ~11k)",
    "eval_auc_rank": "bucket: two-phase rank offsets",
    "eval_qini_uplift": "grid: 10-row decile table",
    "events_cumulative_distinct_users": "grid: calendar first-seen days",
    "events_global_rank_two_phase": "bucket: two-phase rank offsets",
    "events_kruskal_wallis": "grid: distinct cent values of bounded measure",
    "events_lateness_audit": "bucket: boundary-max over range buckets",
    "events_quantile_normalize": "bucket: two-phase rank offsets",
    "events_sax_motifs": "grid: hourly series (calendar hours)",
    "events_stl_decompose": "grid: hourly series (calendar hours)",
    "join_asof_rates": "grid: rate dimension, one row per calendar day",
    "orders_backlog_burndown": "grid: calendar months",
    "orders_nelson_aalen": "grid: risk intervals (42 duration levels)",
    "orders_open_backlog": "grid: calendar days",
    "orders_pareto_8020": "grid: 10-row decile table",
    "pack_sequences_documents": "bucket: shard offsets (n/2048; 3-level scan at extreme n)",
    "part_skyline_pareto": "bucket: boundary-max over price buckets",
    "parts_abc_classification": "bucket: two-phase prefix offsets (log2 revenue, ~40)",
    "parts_pareto_frontier": "grid: price-tick table (~12k, price-domain bounded)",
    "sales_hierarchy_share": "grid: 31-row region/nation rollup",
    "sample_priority_estimate": "limit: rank over LIMIT k+1 rows",
    "search_rank_fusion": "limit: rank over LIMIT n_per_ranker rows",
    "similarity_ivfpq_adc": "limit: codebook draw over LIMIT k rows",
    "similarity_mips_transform": "bucket+limit: two-phase cos offsets; dot rank over LIMIT k",
    "similarity_pq_adc": "limit: codebook draw over LIMIT k rows",
    "text_heaps_law": "grid: 10-row corpus-decile table",
    "text_zipf_slope": "bucket: two-phase rank offsets (log2 count, ~30)",
    "users_kaplan_meier": "grid: distinct duration levels",
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
    # single-task global-sort tripwire: empty-partition windows only on
    # the audited bounded-frame allowlist
    if name not in _BOUNDED_GLOBAL_WINDOWS:
        offenders = plans.empty_partition_windows(df)
        assert not offenders, (
            f"{name} plans {len(offenders)} empty-partition Window(s) — a "
            f"single-task global sort; use two_phase_global_rank / "
            f"two_phase_prefix_sum / TakeOrdered-then-rank or justify a "
            f"bounded frame in _BOUNDED_GLOBAL_WINDOWS:\n" + "\n".join(offenders)
        )
