#!/usr/bin/env python3
"""Interleaved A/B of the landed loop_plan_scope: flag on (AQE off in
loops) vs flag off (scope no-op), same session, same code structure."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "5"))
NAMES = os.environ.get(
    "NAMES",
    "graph_hits_scores,text_textrank_keywords,similarity_power_iteration,"
    "dedup_semdedup,similarity_ivf_kmeans,dedup_cluster_assignments,"
    "dedup_pagerank_hubs",
).split(",")


def main() -> None:
    from simple_land_registry_data_ingestion_spark import tuning
    from simple_land_registry_data_ingestion_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="prof-loop-scope", extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def clear():
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        spark.catalog.clearCache()

    variants = [("scoped_off", True), ("aqe_on", False)]
    for n in NAMES:
        noop(qs[n](spark, SF_DIR))
    results = {n: {vn: [] for vn, _ in variants} for n in NAMES}
    for p in range(PASSES):
        # ABBA: alternate within-pass order so JIT/cache warmth from the
        # first variant cannot systematically favor the second
        order = variants if p % 2 == 0 else list(reversed(variants))
        for n in NAMES:
            for vn, flag in order:
                tuning._LOOP_AQE_OFF = flag
                clear()
                t0 = time.monotonic()
                noop(qs[n](spark, SF_DIR))
                results[n][vn].append(round(time.monotonic() - t0, 3))
        tuning._LOOP_AQE_OFF = True
        print(
            f"pass {p}: "
            + " | ".join(
                f"{n} "
                + " ".join(f"{vn}={results[n][vn][-1]}" for vn, _ in variants)
                for n in NAMES
            ),
            flush=True,
        )
    import statistics

    tuning._LOOP_AQE_OFF = True
    for n in NAMES:
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
