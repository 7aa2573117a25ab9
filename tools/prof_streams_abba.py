#!/usr/bin/env python3
"""ABBA re-verification of the r16 stream changes: landed (sp4 interval
joins + tmpfs checkpoints) vs r15 behavior (sp8 + disk temp checkpoints),
variant order alternating per pass."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "6"))


def main() -> None:
    from simple_land_registry_data_ingestion_spark.session import get_spark
    from simple_land_registry_data_ingestion_spark.streaming import ops

    spark = get_spark(app_name="prof-streams-abba", extra_conf={"spark.driver.memory": "16g"})
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
        "tumbling_append": ops.stream_tumbling_append_watermark,
        "session_window": ops.stream_session_window,
    }

    real_run = ops.run_stream_to_table

    def run_old(df, output_mode, state_partitions=8):
        # r15 behavior: helper default 8 regardless of caller, disk ckpt
        return real_run(df, output_mode, 8)

    def set_variant(new: bool):
        ops._SHM_CHECKPOINTS = new
        ops.run_stream_to_table = real_run if new else run_old

    variants = [("landed", True), ("r15", False)]
    for q in queries.values():
        noop(q(spark, SF_DIR))
    results = {qn: {vn: [] for vn, _ in variants} for qn in queries}
    for p in range(PASSES):
        order = variants if p % 2 == 0 else list(reversed(variants))
        for qn, q in queries.items():
            for vn, flag in order:
                set_variant(flag)
                clear()
                t0 = time.monotonic()
                noop(q(spark, SF_DIR))
                results[qn][vn].append(round(time.monotonic() - t0, 3))
        set_variant(True)
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

    set_variant(True)
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
