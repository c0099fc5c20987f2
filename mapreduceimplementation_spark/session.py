"""SparkSession factory + runtime tuning.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same configs are the
ones we'd set on a 1000-executor cluster (AQE, partial agg, Arrow), with
``spark.sql.shuffle.partitions`` scaled to cluster cores at deploy time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs, applied defensively at the top of every query
# entry point because the driver may hand us a session we did not build.
_RUNTIME_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 32 matches local[32]; on a real cluster set ~2-3x total cores.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime SQL confs to an existing session (idempotent)."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked in this deployment; keep going
    return spark


def spread(df, spark: SparkSession):
    """Ensure a compute-heavy per-row stage runs with full parallelism.

    Local test files are single-partition parquet, which would serialize
    expensive row-local work (shingling/hashing via higher-order functions
    is interpreted, not codegen'd) onto one core.  On a real cluster a
    100 TB scan already has thousands of splits, so this guard never fires
    and no corpus-sized shuffle is added.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(app_name: str = "mapreduceimplementation-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
