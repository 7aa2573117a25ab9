#!/usr/bin/env python3
"""ABBA re-verification of the r16 simhash rewrites vs the exact r15
implementations (retained as references in tests/test_round16_ops.py)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "6"))

from pyspark.sql import functions as F


def old_pairs(spark, sf_dir, fp_df, distance=3):
    from simple_land_registry_data_ingestion_spark.operators import dedup

    fp = fp_df.localCheckpoint(eager=True)
    n_bands = distance + 1
    sizes = [16 // n_bands + (1 if i < 16 % n_bands else 0) for i in range(n_bands)]
    starts = [sum(sizes[:i]) for i in range(n_bands)]
    bands = fp.select(
        F.struct(
            "doc_id",
            F.conv(F.substring("simhash", 1, 8), 16, 10).cast("long").alias("hi"),
            F.conv(F.substring("simhash", 9, 8), 16, 10).cast("long").alias("lo"),
        ).alias("m"),
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{b}:"),
                        F.substring("simhash", starts[b] + 1, sizes[b]),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_key"),
    )
    grouped = bands.groupBy("band_key").agg(
        F.array_sort(F.collect_list("m")).alias("ids")
    )
    cand = dedup.bucket_pairs(grouped, out_a="a", out_b="b", distribute_threshold=256)

    def _nc(x):
        folded = (
            x.bitwiseOR(F.shiftright(x, 1))
            .bitwiseOR(F.shiftright(x, 2))
            .bitwiseOR(F.shiftright(x, 3))
        )
        return F.bit_count(folded.bitwiseAND(F.lit(0x11111111)))

    dist = (
        _nc(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
        + _nc(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
    ).cast("long")
    return (
        cand.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("nibble_distance"),
        )
        .where(F.col("nibble_distance") <= distance)
        .distinct()
    )


def main() -> None:
    from simple_land_registry_data_ingestion_spark.operators import dedup
    from simple_land_registry_data_ingestion_spark.session import get_spark
    from tests.test_round16_ops import _simhash_reference

    spark = get_spark(app_name="prof-simhash-abba", extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def clear():
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        spark.catalog.clearCache()

    variants = {
        "fp_new": lambda: noop(dedup.dedup_simhash(spark, SF_DIR)),
        "fp_old": lambda: noop(_simhash_reference(spark, SF_DIR)),
        "pairs_new": lambda: noop(dedup.dedup_simhash_pairs(spark, SF_DIR)),
        "pairs_old": lambda: noop(
            old_pairs(spark, SF_DIR, _simhash_reference(spark, SF_DIR))
        ),
    }
    for fn in variants.values():
        fn()
    results = {n: [] for n in variants}
    names = list(variants)
    for p in range(PASSES):
        order = names if p % 2 == 0 else list(reversed(names))
        for n in order:
            clear()
            t0 = time.monotonic()
            variants[n]()
            results[n].append(round(time.monotonic() - t0, 3))
        print(
            f"pass {p}: " + " ".join(f"{n}={results[n][-1]}" for n in names),
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
