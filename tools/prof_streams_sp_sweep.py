"""ABBA sp4-vs-sp8 sweep for the three stateful streams never swept:
stream_session_window (JVM session-window state), stream_state_inspect
(JVM agg state + statestore read; uses session shuffle conf), and
stream_stateful_user_stats (applyInPandasWithState, Python state)."""
import os, sys, time, statistics
sys.path.insert(0, "/root/repo")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 6
from simple_land_registry_data_ingestion_spark.session import get_spark
from simple_land_registry_data_ingestion_spark.streaming import ops

spark = get_spark(app_name="prof-streams-sp", extra_conf={"spark.driver.memory": "16g"})
spark.sparkContext.setLogLevel("ERROR")
noop = lambda df: df.write.format("noop").mode("overwrite").save()
def clear():
    for _i, r in spark.sparkContext._jsc.getPersistentRDDs().items(): r.unpersist()
    spark.catalog.clearCache()

real_run = ops.run_stream_to_table
SP = {"v": 8}
def patched(df, output_mode, state_partitions=8):
    return real_run(df, output_mode, SP["v"])
ops.run_stream_to_table = patched

def run_state_inspect():
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(SP["v"]))
    try:
        noop(ops.stream_state_inspect(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)

queries = {
    "session_window": lambda: noop(ops.stream_session_window(spark, SF)),
    "state_inspect": run_state_inspect,
    "stateful_user_stats": lambda: noop(ops.stream_stateful_user_stats(spark, SF)),
}
variants = [("sp4", 4), ("sp8", 8)]
for f in queries.values(): f()   # warm
res = {q: {v: [] for v, _ in variants} for q in queries}
for p in range(PASSES):
    order = variants if p % 2 == 0 else list(reversed(variants))
    for qn, f in queries.items():
        for vn, sp in order:
            SP["v"] = sp; clear()
            t0 = time.monotonic(); f(); res[qn][vn].append(round(time.monotonic()-t0,3))
    print(f"pass {p}: " + " | ".join(f"{qn} " + " ".join(f"{vn}={res[qn][vn][-1]}" for vn,_ in variants) for qn in queries), flush=True)
for qn in queries:
    print(qn + ": " + " ".join(f"{vn} min={min(res[qn][vn])} med={statistics.median(res[qn][vn])}" for vn,_ in variants))
spark.stop()
