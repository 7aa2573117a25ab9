#!/usr/bin/env python3
"""Interleaved A/B: AQE on (session default) vs off for the iterative
small-job families (VERDICT r15 item 6) — HITS, textrank,
power-iteration, Lloyd (semdedup/ivf_kmeans).  AQE re-optimizes every
tiny job in the loop; the plans are known and all joins are hinted
broadcasts, so the hypothesis is pure driver-side overhead."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "5"))


def main() -> None:
    from simple_land_registry_data_ingestion_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="prof-aqe", extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = [
        "graph_hits_scores",
        "text_textrank_keywords",
        "similarity_power_iteration",
        "dedup_semdedup",
        "similarity_ivf_kmeans",
    ]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def clear():
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        spark.catalog.clearCache()

    variants = [("aqe_on", "true"), ("aqe_off", "false")]
    for n in names:
        noop(qs[n](spark, SF_DIR))
    results = {n: {vn: [] for vn, _ in variants} for n in names}
    for p in range(PASSES):
        for n in names:
            for vn, flag in variants:
                spark.conf.set("spark.sql.adaptive.enabled", flag)
                clear()
                t0 = time.monotonic()
                noop(qs[n](spark, SF_DIR))
                results[n][vn].append(round(time.monotonic() - t0, 3))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        print(
            f"pass {p}: "
            + " | ".join(
                f"{n} "
                + " ".join(f"{vn}={results[n][vn][-1]}" for vn, _ in variants)
                for n in names
            ),
            flush=True,
        )
    import statistics

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    for n in names:
        print(
            f"{n}: "
            + " ".join(
                f"{vn} min={min(results[n][vn])} med={statistics.median(results[n][vn])}"
                for vn, _ in variants
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
