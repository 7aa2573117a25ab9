"""Round-11 plan pins: VERDICT r10 item 1 retired the registry's last
three dimension-sized single-partition global windows.  These tests make
the retirement a tripwire — each query's ROW frame must never collapse
to a single-task sort again; only the bounded bucket/grid tables may see
an unpartitioned fold.  Plus unit coverage for the new
two_phase_prefix_sum mechanism and the r11 TakeOrdered-then-rank /
two-phase upgrades of the rank-fusion, zipf and MIPS queries.
"""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark import plans
from simple_land_registry_data_ingestion_spark.operators import relational, similarity
from simple_land_registry_data_ingestion_spark.functions import text as text_fns
from tests.conftest import SF_ORACLE, SF_SMALL


def _single_partition_exchanges(plan: str) -> int:
    return len(
        [ln for ln in plan.splitlines() if "Arguments: SinglePartition" in ln]
    )


def test_woe_binning_row_window_is_bucket_partitioned(spark):
    """customers_woe_binning (ex-NTILE global window): the row-level
    rank window must be partitioned by the two-phase bucket key; the
    only unpartitioned folds run over the bucket-count table and the
    1-row totals."""
    df = relational.customers_woe_binning(spark, SF_ORACLE)
    plan = plans.formatted_plan(df)
    assert "ntile" not in plan.lower(), plan
    # the customer-row rank window is partitioned by the bucket column
    assert re.search(r"row_number\(\) windowspecdefinition\(__b#\d+L,", plan), plan
    # every remaining unpartitioned window folds a side table (the
    # bucket-count offsets), never the customer rows
    offenders = plans.empty_partition_windows(df)
    assert offenders and all("__cnt#" in o for o in offenders), offenders


def test_pareto_frontier_window_runs_on_tick_grid(spark):
    """parts_pareto_frontier (ex-global RANGE window over the part
    table): the running max must fold over the per-tick aggregate — the
    part rows themselves reach the result via a broadcast join, with one
    keyed shuffle (the tick groupBy) and no global sort of parts."""
    df = relational.parts_pareto_frontier(spark, SF_ORACLE)
    plan = plans.formatted_plan(df)
    offenders = plans.empty_partition_windows(df)
    # exactly one unpartitioned window, and it folds the TICK aggregate
    assert len(offenders) == 1 and "tick_max" in offenders[0], offenders
    assert plans.broadcast_join_count(df) >= 1, plan
    # the part rows never pass through a single-partition exchange: the
    # only one allowed feeds the tick-table window
    assert _single_partition_exchanges(plan) <= 1, plan


def test_abc_classification_prefix_sum_is_two_phase(spark):
    """parts_abc_classification (ex-global cumulative-sum window over
    the per-part aggregate): the running revenue sum must be partitioned
    by the log2-magnitude bucket, with the unpartitioned fold confined
    to the ~40-row bucket table."""
    df = relational.parts_abc_classification(spark, SF_ORACLE)
    plan = plans.formatted_plan(df)
    assert re.search(
        r"sum\(revenue_cents#\d+L\) windowspecdefinition\(__b#\d+L,", plan
    ), plan
    offenders = plans.empty_partition_windows(df)
    assert len(offenders) == 1 and "__s#" in offenders[0], offenders
    # bucket-offset fold + 1-row total only
    assert _single_partition_exchanges(plan) <= 2, plan


def test_two_phase_prefix_sum_matches_global_window(spark):
    """Mechanism certification: two_phase_prefix_sum == the single-task
    global running sum, both ascending and descending, with ties and
    with skewed bucket populations."""
    rows = [(i, (i * 37) % 11, ((i * 13) % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v", "val"])
    for desc in (False, True):
        order = (
            [F.col("v").desc(), F.col("k")] if desc else [F.col("v").asc(), F.col("k")]
        )
        bucket = (F.col("v") / 4).cast("long")
        got = relational.two_phase_prefix_sum(
            df, bucket, order, "val", out="cum", descending=desc
        )
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = df.withColumn("cum", F.sum("val").over(w).cast("long"))
        assert (
            got.select("k", "cum").exceptAll(want.select("k", "cum")).count() == 0
        ), f"descending={desc}"
        assert got.count() == want.count() == 500


def test_rank_fusion_and_mips_rank_after_limit(spark):
    """The r11 upgrades must keep ranks bit-identical while bounding the
    rank windows: rank fusion's per-ranker windows sit above LIMIT n
    (TakeOrdered plans), and MIPS' cosine rank runs two-phase."""
    fused = text_fns.search_rank_fusion(spark, SF_ORACLE)
    plan = plans.formatted_plan(fused)
    assert plan.count("TakeOrderedAndProject") >= 2, plan
    mips = similarity.similarity_mips_transform(spark, SF_SMALL)
    plan_m = plans.formatted_plan(mips)
    assert re.search(
        r"row_number\(\) windowspecdefinition\(__b#\d+L,", plan_m
    ), plan_m
    out = mips.collect()
    assert [r["rank_dot"] for r in out] == list(range(1, len(out) + 1))
    # rank agreement column present and boolean-ish
    assert all(r["agree"] in (0, 1) for r in out)


def test_zipf_rank_is_two_phase(spark):
    """text_zipf_slope's vocabulary rank must be bucket-partitioned —
    no single-task sort of the vocabulary."""
    df = text_fns.text_zipf_slope(spark, SF_ORACLE)
    offenders = plans.empty_partition_windows(df)
    # only the ~30-row log2-count bucket-offset fold remains
    assert all("__cnt#" in o for o in offenders), offenders
