#!/usr/bin/env python3
"""Stage decomposition of dedup_simhash_pairs at sf0.1 (guide §1: measure
first).  Times each prefix of the pipeline with the noop sink, interleaved
over N passes to ride out ambient load storms."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "5"))


def main() -> None:
    from pyspark.sql import functions as F

    from simple_land_registry_data_ingestion_spark.session import get_spark
    from simple_land_registry_data_ingestion_spark.operators import dedup

    spark = get_spark(app_name="prof-simhash", extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def clear():
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        spark.catalog.clearCache()

    def t(fn):
        clear()
        t0 = time.monotonic()
        fn()
        return round(time.monotonic() - t0, 3)

    def stage_fp():
        noop(dedup.dedup_simhash(spark, SF_DIR))

    def stage_fp_ckpt():
        fp = dedup.dedup_simhash(spark, SF_DIR).localCheckpoint(eager=True)
        noop(fp)

    def _grouped():
        fp = dedup.dedup_simhash(spark, SF_DIR).localCheckpoint(eager=True)
        n_bands = 4
        sizes = [4, 4, 4, 4]
        starts = [0, 4, 8, 12]
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
        return bands.groupBy("band_key").agg(
            F.array_sort(F.collect_list("m")).alias("ids")
        )

    def stage_grouped():
        noop(_grouped())

    def stage_cand():
        noop(dedup.bucket_pairs(_grouped(), out_a="a", out_b="b", distribute_threshold=256))

    def stage_verify_nodistinct():
        g = _grouped()
        cand = dedup.bucket_pairs(g, out_a="a", out_b="b", distribute_threshold=256)

        def _nc(x):
            folded = (
                x.bitwiseOR(F.shiftright(x, 1))
                .bitwiseOR(F.shiftright(x, 2))
                .bitwiseOR(F.shiftright(x, 3))
            )
            return F.bit_count(folded.bitwiseAND(F.lit(0x11111111)))

        distance = (
            _nc(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
            + _nc(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
        ).cast("long")
        noop(
            cand.select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                distance.alias("nibble_distance"),
            ).where(F.col("nibble_distance") <= 3)
        )

    def stage_full():
        noop(dedup.dedup_simhash_pairs(spark, SF_DIR))

    stages = [
        ("fp", stage_fp),
        ("fp_ckpt", stage_fp_ckpt),
        ("grouped", stage_grouped),
        ("cand", stage_cand),
        ("verify_nodistinct", stage_verify_nodistinct),
        ("full", stage_full),
    ]
    # warm
    stage_full()
    results: dict[str, list[float]] = {n: [] for n, _ in stages}
    for p in range(PASSES):
        for n, fn in stages:
            results[n].append(t(fn))
        print(f"pass {p}: " + " ".join(f"{n}={results[n][-1]}" for n, _ in stages), flush=True)
    print("MIN: " + " ".join(f"{n}={min(v)}" for n, v in results.items()))
    import statistics

    print("MED: " + " ".join(f"{n}={statistics.median(v)}" for n, v in results.items()))
    # cardinalities (once)
    g = _grouped()
    print("n_buckets:", g.count())
    print(
        "n_candidates:",
        dedup.bucket_pairs(g, out_a="a", out_b="b", distribute_threshold=256).count(),
    )
    print("n_verified:", dedup.dedup_simhash_pairs(spark, SF_DIR).count())
    spark.stop()


if __name__ == "__main__":
    main()
