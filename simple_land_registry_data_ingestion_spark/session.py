"""SparkSession factory tuned for large-scale batch analytics.

Replaces the reference's single-process execution model (reference
main.py:298-372: one Python thread, 50k-row pandas chunks) with a configured
Spark session.  The chunk loop disappears into partitions; partial/final
aggregation, spill, and pipelining are engine-provided (SURVEY.md section 4).

Scale defaults (local[32] test box, but written for a 1000-executor cluster):
 - AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
 - Arrow on: vectorized pandas interchange for the few Pandas-UDF operators.
 - shuffle.partitions sized by env (cluster deployments override per job).
 - session timezone pinned UTC: the reference parses timestamps as UTC
   (reference main.py:218-222, ``utc=True``); pinning removes machine-local
   nondeterminism from date extraction.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Configuration applied to every session this package builds.  These are all
#: safe to set on a shared cluster session as well (idempotent, no side
#: effects beyond this app).
TUNING = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MiB input splits: big enough to amortize task overhead, small
    # enough that a 100 TB scan still yields ~800k tasks of bounded memory.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Auto-broadcast threshold: dimension tables (region/nation/supplier and
    # the reference's would-be lookup tables) stay well under 64 MiB.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.orc.compression.codec": "zstd",
    # Runtime bloom-filter join pruning: when a selective filter sits on one
    # side of a shuffle join, Spark injects a bloom filter on the other
    # side's scan — at 100 TB this skips whole row groups of the fact table
    # that cannot match.  Free when it doesn't apply; decisive when it does.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def get_spark(
    app_name: str = "simple-land-registry-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the package's tuning applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster is
    configured; on a real cluster, leave it unset and let spark-submit decide.
    ``extra_conf`` lets callers add STATIC confs that must be set before the
    JVM starts (e.g. ``spark.driver.memory`` for an oversized local run);
    it has no effect if a session already exists in the process.
    """
    builder = SparkSession.builder.appName(app_name)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{DEFAULT_CPUS}]"
    if master is not None:
        builder = builder.master(master)
    for key, value in TUNING.items():
        builder = builder.config(key, value)
    builder = builder.config(
        "spark.sql.shuffle.partitions",
        str(shuffle_partitions if shuffle_partitions is not None else DEFAULT_CPUS),
    )
    return builder.getOrCreate()


def apply_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally provided session.

    The driver harness hands us its own SparkSession; only conf keys that
    are runtime-mutable are applied (static ones like driver memory are
    left alone).  ``spark.sql.shuffle.partitions`` IS runtime-mutable and
    matters most here (r11): a stock session defaults to 200 shuffle
    partitions, ~6x more tasks than the 32-core box needs — every keyed
    exchange in a driver-side run paid that scheduling overhead before
    AQE coalescing clawed part of it back.

    r12 (ADVICE r11): the shuffle-partition override applies ONLY when
    the session still carries Spark's stock 200 default — a harness that
    deliberately configured its own value keeps it.  The applied value
    follows the session's actual parallelism (``defaultParallelism``),
    not this box's core count, so a differently-sized host is sized
    correctly; ``SPARK_GRAFT_CPUS`` remains the explicit escape hatch
    and wins when set.
    """
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
    ):
        try:
            spark.conf.set(key, TUNING.get(key, "true"))
        except Exception:  # pragma: no cover - static conf on some builds
            pass
    try:
        # KNOWN AMBIGUITY (ADVICE r12): "== 200" cannot distinguish the
        # stock default from a harness that deliberately configured
        # exactly 200 — SQLConf reports no explicitly-set flag for a
        # session conf, so a deliberate 200 is resized like the default.
        # Accepted: 200 partitions on an arbitrary host is the one value
        # that is overwhelmingly more likely to mean "unconfigured" than
        # a choice, and SPARK_GRAFT_CPUS remains the explicit override.
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            if "SPARK_GRAFT_CPUS" in os.environ:
                target = DEFAULT_CPUS
            else:
                target = max(spark.sparkContext.defaultParallelism, 1)
            spark.conf.set("spark.sql.shuffle.partitions", str(target))
    except Exception:  # pragma: no cover
        pass
    return spark
