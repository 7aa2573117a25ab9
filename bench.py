#!/usr/bin/env python3
"""Benchmark harness: run every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

The FINAL stdout line is one SHORT JSON record
{"metric", "value", "unit", "sf", "n_queries"} (well under 1 KB, so a
tail-buffered consumer never truncates it mid-line); the full per-query
timing map is written to BENCH_DETAIL.json next to this script.

Execution is forced through the noop sink (df.write.format("noop")) so the
timing covers scan -> compute -> (would-be) write without driver-side
collect costs, matching how the engine runs in production.  A warmup query
is run first so JVM/codegen startup does not pollute the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return base


def main() -> None:
    from simple_land_registry_data_ingestion_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="simple-land-registry-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()

    # Warmup: JVM, codegen, parquet footer caches.
    queries["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        start = time.monotonic()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - start, 3)

    total = round(sum(timings.values()), 3)
    ordered = sorted(timings.values())
    median = round(ordered[len(ordered) // 2], 3) if ordered else 0.0
    summary = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": _sf_label(SF_DIR),
        "n_queries": len(timings),
        "median_query_sec": median,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump({**summary, "queries": timings}, fh, indent=1, sort_keys=True)
    spark.stop()
    # Short line LAST so tail-truncating log buffers keep it intact.
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
