#!/usr/bin/env python3
"""Capture .explain('formatted') for named queries into plans/<dir>/.

Usage: python tools/capture_plan.py <outdir> <suffix> <query> [<query> ...]
Writes plans/<outdir>/<query>_<suffix>.txt for each query name.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    from simple_land_registry_data_ingestion_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="capture-plan", extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", outdir)
    os.makedirs(dest, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(dest, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
