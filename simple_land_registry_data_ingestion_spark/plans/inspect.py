"""Executed-plan inspectors over ``df._jdf.queryExecution()`` /
``.explain`` output.

Everything works on the FORMATTED physical plan string — stable enough
across Spark 3.x/4.x for the coarse properties that matter at scale:

 - how many shuffles (Exchange) a query pays;
 - whether a join broadcasts its small side or shuffles both;
 - whether filters reached the parquet scan (PushedFilters) and which
   columns survive column pruning (ReadSchema);
 - whether a join degenerated into a cartesian/nested-loop product.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _count_ops(df: DataFrame, op_pattern: str) -> int:
    """Count physical operators by their numbered detail header
    ``(N) OpName`` — each operator appears once there, while the plan tree
    repeats the name (so a bare substring count double-counts)."""
    return len(re.findall(rf"\(\d+\) (?:{op_pattern})\b", formatted_plan(df)))


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators = shuffles the plan pays before AQE
    coalescing.  Every one is a full write+read of its input: the scarcest
    resource at 100 TB, and the first thing to check in a new operator."""
    return _count_ops(df, "Exchange")


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins (hash or nested-loop) in the plan."""
    return _count_ops(df, "BroadcastHashJoin|BroadcastNestedLoopJoin")


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists from every file scan in the plan.  Empty
    brackets on a filtered scan mean the predicate runs AFTER reading every
    row — at 100 TB that is the bug."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the columns actually read after
    pruning.  A 2-column query reading a 17-column schema is paying ~8x
    the I/O it needs."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def empty_partition_windows(df: DataFrame) -> list[str]:
    """Window nodes in the OPTIMIZED logical plan whose partition spec is
    empty — each is a global sort that collapses to ONE task at execution
    (Exchange SinglePartition), the canonical 100 TB scale-killer.

    Legitimate uses exist — folds over PROVABLY BOUNDED frames (a bucket
    table of a two-phase rank/prefix-sum, an hour grid, a decile table)
    — so callers allowlist, not ban.  Walks the logical tree via py4j
    because the formatted physical string does not expose the partition
    spec unambiguously.  Returns one ``simpleString`` line per offender,
    so assertion messages show WHICH window collapsed."""
    out: list[str] = []

    def walk(node) -> None:
        if node.getClass().getSimpleName() == "Window" and node.partitionSpec().isEmpty():
            out.append(node.simpleString(25))
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def assert_no_cartesian_product(df: DataFrame) -> None:
    """Fail if the plan contains a CartesianProduct.  Broadcast nested-loop
    with a 1-row side is fine (similarity queries use it deliberately);
    an executor-side cartesian of two big relations never is."""
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"
