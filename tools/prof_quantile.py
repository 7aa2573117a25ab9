#!/usr/bin/env python3
"""A/B of agg_approx_quantile_error: current (exact `percentile` single-
task merge) vs distributed selection (bucket counts -> offsets -> rank
pick, VERDICT r15 item 3).  Checks value equality at 3 SFs first."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "6"))

from pyspark.sql import Window
from pyspark.sql import functions as F


def v2(spark, sf_dir, accuracy: int = 10000):
    from simple_land_registry_data_ingestion_spark.tables import load

    li = load(spark, sf_dir, "lineitem").select("l_extendedprice")
    qs = [0.25, 0.5, 0.75, 0.9]
    q_arr = ", ".join(str(q) for q in qs)
    agg = (
        li.groupBy()
        .agg(
            F.expr(
                f"approx_percentile(l_extendedprice, array({q_arr}), {accuracy})"
            ).alias("approx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .localCheckpoint(eager=False)
    )
    per_q = agg.select(
        F.posexplode(F.col("approx")).alias("i", "approx_value"), "n_rows"
    ).select(
        F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("i") + 1).alias(
            "quantile"
        ),
        "approx_value",
        "n_rows",
    )
    # target sorted positions (0-indexed), replicating Percentile's
    # position = percentage * (count - 1) and floor/ceil interpolation
    pos_tbl = per_q.select(
        "quantile",
        "n_rows",
        (F.col("quantile") * (F.col("n_rows") - 1).cast("double")).alias("pos"),
    ).select(
        "quantile",
        "n_rows",
        "pos",
        F.floor("pos").cast("long").alias("lo_pos"),
        F.ceil("pos").cast("long").alias("hi_pos"),
    )

    v = F.col("l_extendedprice")
    b = li.where(v.isNotNull()).select(
        v.alias("v"), F.floor(v / F.lit(64)).cast("long").alias("__b")
    )
    bcounts = b.groupBy("__b").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wo = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = bcounts.select(
        "__b",
        "cnt",
        (F.sum("cnt").over(wo) - F.col("cnt")).cast("long").alias("off"),
    )
    hit_buckets = (
        offsets.join(
            F.broadcast(pos_tbl.select("lo_pos", "hi_pos")),
            (F.col("off") <= F.col("hi_pos"))
            & (F.col("lo_pos") < F.col("off") + F.col("cnt")),
        )
        .select("__b", "off")
        .distinct()
    )
    wr = Window.partitionBy("__b").orderBy("v")
    ranked = b.join(F.broadcast(hit_buckets), "__b").withColumn(
        "gpos", (F.row_number().over(wr).cast("long") - 1) + F.col("off")
    )
    m = (
        ranked.join(
            F.broadcast(pos_tbl),
            (F.col("gpos") == F.col("lo_pos"))
            | (F.col("gpos") == F.col("hi_pos")),
        )
        .groupBy("quantile", "pos", "lo_pos", "hi_pos")
        .agg(
            F.max(
                F.when(F.col("gpos") == F.col("lo_pos"), F.col("v"))
            ).alias("v_lo"),
            F.max(
                F.when(F.col("gpos") == F.col("hi_pos"), F.col("v"))
            ).alias("v_hi"),
        )
    )
    v_lo_d = F.col("v_lo").cast("double")
    v_hi_d = F.col("v_hi").cast("double")
    exact = F.when(
        (F.col("hi_pos") == F.col("lo_pos")) | (v_hi_d == v_lo_d), v_lo_d
    ).otherwise(
        (F.col("hi_pos").cast("double") - F.col("pos")) * v_lo_d
        + (F.col("pos") - F.col("lo_pos").cast("double")) * v_hi_d
    )
    exacts = m.select("quantile", exact.alias("exact_value"))

    ranks = (
        li.crossJoin(F.broadcast(per_q))
        .groupBy("quantile", "approx_value", "n_rows")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("approx_value"), 1).otherwise(0)
            ).alias("n_below"),
            F.sum(
                F.when(
                    F.col("l_extendedprice") <= F.col("approx_value"), 1
                ).otherwise(0)
            ).alias("n_at_or_below"),
        )
    )
    eps = 1.0 / accuracy
    within = (
        F.col("n_below") <= F.ceil((F.col("quantile") + eps) * F.col("n_rows"))
    ) & (
        F.col("n_at_or_below")
        >= F.floor((F.col("quantile") - eps) * F.col("n_rows"))
    )
    return ranks.join(F.broadcast(exacts), "quantile").select(
        "quantile",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round("exact_value", 4).alias("exact_value"),
        within.alias("within_rank_bound"),
    )


def main() -> None:
    from simple_land_registry_data_ingestion_spark.operators import relational
    from simple_land_registry_data_ingestion_spark.session import get_spark

    spark = get_spark(
        app_name="prof-quantile", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def clear():
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        spark.catalog.clearCache()

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", SF_DIR):
        a = sorted(
            map(tuple, relational.agg_approx_quantile_error(spark, sf).collect())
        )
        c = sorted(map(tuple, v2(spark, sf).collect()))
        assert a == c, f"mismatch at {sf}:\n{a}\n{c}"
        print(f"CHECK OK {sf}: {a}", flush=True)

    variants = {
        "v1": lambda: noop(relational.agg_approx_quantile_error(spark, SF_DIR)),
        "v2": lambda: noop(v2(spark, SF_DIR)),
    }
    for fn in variants.values():
        fn()
    results = {n: [] for n in variants}
    for p in range(PASSES):
        for n, fn in variants.items():
            clear()
            t0 = time.monotonic()
            fn()
            results[n].append(round(time.monotonic() - t0, 3))
        print(
            f"pass {p}: " + " ".join(f"{n}={results[n][-1]}" for n in variants),
            flush=True,
        )
    import statistics

    print("MIN: " + " ".join(f"{n}={min(v)}" for n, v in results.items()))
    print(
        "MED: "
        + " ".join(f"{n}={statistics.median(v)}" for n, v in results.items())
    )
    spark.stop()


if __name__ == "__main__":
    main()
