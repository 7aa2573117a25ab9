#!/usr/bin/env python3
"""Interleaved A/B for the stream interval joins + inactivity sessions
(VERDICT r15 item 2): state_partitions sweep (8 = current default, 4, 2)
and tmpfs-backed ephemeral checkpoints, measured with the noop sink.

Variants are interleaved inside each pass so ambient load storms hit all
variants alike."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "5"))


def main() -> None:
    from simple_land_registry_data_ingestion_spark.session import get_spark
    from simple_land_registry_data_ingestion_spark.streaming import ops

    spark = get_spark(app_name="prof-streams", extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def clear():
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        spark.catalog.clearCache()

    queries = {
        "interval_join": ops.stream_stream_interval_join,
        "left_outer": ops.stream_stream_left_outer_interval_join,
        "full_outer": ops.stream_full_outer_interval_join,
        "inactivity": ops.stream_inactivity_sessions,
    }

    orig_defaults = ops.run_stream_to_table.__defaults__

    def set_sp(n):
        ops.run_stream_to_table.__defaults__ = (n,)

    variants = [("sp8", 8), ("sp4", 4), ("sp2", 2)]

    # warm pools + codegen once per query
    for q in queries.values():
        noop(q(spark, SF_DIR))

    results: dict[str, dict[str, list[float]]] = {
        qn: {vn: [] for vn, _ in variants} for qn in queries
    }
    for p in range(PASSES):
        for qn, q in queries.items():
            for vn, n in variants:
                set_sp(n)
                clear()
                t0 = time.monotonic()
                noop(q(spark, SF_DIR))
                results[qn][vn].append(round(time.monotonic() - t0, 3))
        ops.run_stream_to_table.__defaults__ = orig_defaults
        print(
            f"pass {p}: "
            + " | ".join(
                f"{qn} "
                + " ".join(f"{vn}={results[qn][vn][-1]}" for vn, _ in variants)
                for qn in queries
            ),
            flush=True,
        )
    import statistics

    ops.run_stream_to_table.__defaults__ = orig_defaults
    for qn in queries:
        print(
            f"{qn}: "
            + " ".join(
                f"{vn} min={min(results[qn][vn])} med={statistics.median(results[qn][vn])}"
                for vn, _ in variants
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
