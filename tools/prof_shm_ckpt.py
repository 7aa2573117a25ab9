#!/usr/bin/env python3
"""Interleaved A/B: tmpfs (/dev/shm) ephemeral stream checkpoints vs the
default temp checkpoint on disk, at the current state_partitions."""

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

    spark = get_spark(app_name="prof-shm", extra_conf={"spark.driver.memory": "16g"})
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
        "inactivity": ops.stream_inactivity_sessions,
        "tumbling_append": ops.stream_tumbling_append_watermark,
        "session_window": ops.stream_session_window,
    }
    variants = [("disk", False), ("shm", True)]
    for q in queries.values():
        noop(q(spark, SF_DIR))
    results = {qn: {vn: [] for vn, _ in variants} for qn in queries}
    for p in range(PASSES):
        for qn, q in queries.items():
            for vn, flag in variants:
                ops._SHM_CHECKPOINTS = flag
                clear()
                t0 = time.monotonic()
                noop(q(spark, SF_DIR))
                results[qn][vn].append(round(time.monotonic() - t0, 3))
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

    ops._SHM_CHECKPOINTS = True
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
