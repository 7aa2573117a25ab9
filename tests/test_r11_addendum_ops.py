"""Round-11 addendum pins: the post-close perf pass cut redundant
shuffles in the basket-graph / set-similarity families and made BPE's
adjacent-pair counting scan-stage.  These tests pin the two shapes that
could silently regress: the co-partitioned basket self-join (no second
order-key exchange after the pre-partition checkpoint) and the
zip_with == positional-join pair-count equivalence BPE now relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.operators import mining
from tests.conftest import SF_SMALL


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _assert_reads_copurchase_store(plan: str) -> None:
    """r12 pin (supersedes the r11 co-partitioning pin, per ADVICE r11:
    the old absence-only assertion passed vacuously under plan-shape
    drift): the basket lenses must READ the at-rest co-purchase store —
    a parquet scan whose path carries the store tag — and must never
    scan lineitem (an l_orderkey column anywhere means the in-query
    basket rebuild came back).  A narrow order_id exchange for the
    order-count aggregate is allowed; the basket-sized rebuild is not."""
    assert "copurchase_pairs_" in plan, plan
    assert "l_orderkey" not in plan, plan


def test_item_item_cf_reads_copurchase_store(spark):
    _assert_reads_copurchase_store(_formatted(mining.item_item_cf(spark, SF_SMALL)))


def test_assortativity_reads_copurchase_store(spark):
    _assert_reads_copurchase_store(
        _formatted(mining.graph_assortativity(spark, SF_SMALL))
    )


def test_basket_part_pairs_does_not_read_the_store(spark):
    """REVERSED in r13 (the r12 verdict's accounting objection): the
    basket family's producer query must PAY the live basket build, so
    no store path may appear anywhere in its plan.  The positive pins
    (lineitem scanned, pair aggregation in-plan) live in
    tests/test_round13_ops.py."""
    plan = _formatted(mining.basket_part_pairs(spark, SF_SMALL))
    assert "copurchase_pairs_" not in plan, plan
    assert "basket_items_" not in plan, plan


def test_degree_powerlaw_reads_copurchase_store(spark):
    _assert_reads_copurchase_store(
        _formatted(mining.graph_degree_powerlaw(spark, SF_SMALL))
    )


def test_bpe_zip_with_pairs_match_positional_join(spark):
    """The r11 BPE rewrite counts adjacent pairs with a scan-stage
    zip_with of the token array against its own tail; this pins its
    equivalence to the old positional self-join on (doc, pos+1) over
    the edge cases that matter: single-token docs (no pairs), repeated
    runs ('a a a' yields the pair twice at count level), and multi-doc
    aggregation."""
    rows = [
        (1, "a a a"),
        (2, "x"),
        (3, "a b a b"),
        (4, "q r"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id",
        F.concat(
            F.lit(" "),
            F.replace(F.col("text"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        ).alias("work"),
    )
    arr = F.split(F.trim(F.col("work")), "  ")
    n_adj = F.greatest(F.size(arr) - 1, F.lit(0))
    adj = F.zip_with(
        F.slice(arr, 1, n_adj),
        F.slice(arr, 2, n_adj),
        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
    )
    via_zip = (
        docs.select(F.explode(adj).alias("p"))
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("work")), "  ")).alias("pos", "tok"),
    )
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("tok").alias("x"))
    b = toks.select(
        F.col("doc_id").alias("db"),
        F.col("pos").alias("pb"),
        F.col("tok").alias("y"),
    )
    via_join = (
        a.join(
            b,
            (F.col("doc_id") == F.col("db")) & (F.col("pb") == F.col("pa") + 1),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    assert sorted(map(tuple, via_zip.collect())) == sorted(
        map(tuple, via_join.collect())
    )
    # the 'a a a' doc must contribute ('a','a') twice
    aa = {(r.x, r.y): r.cnt for r in via_zip.collect()}
    assert aa[("a", "a")] == 2
