"""SparkSession factory with scale-aware defaults.

The reference has no engine configuration at all (eager single-process
pandas). Here the session *is* the engine configuration: AQE for runtime
re-planning and skew joins, Arrow for the Python boundary, UTC so results
are oracle-comparable, shuffle parallelism matched to the actual cores
instead of Spark's 200 default.

On a real cluster the same builder is used with ``master`` unset (taken
from spark-submit) — only local testing pins ``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100 TB design point, harmless locally:
# - AQE re-plans shuffles at runtime (coalesce small partitions, split skew).
# - 128 MB target per shuffle partition post-AQE keeps partitions
#   executor-memory-sized at scale.
# - Arrow makes the unavoidable Pandas-UDF boundary batched, not per-row.
_BASE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Parquet TIMESTAMP(NANOS) (events.ts in the fixtures) is otherwise an
    # error in Spark; read as epoch-nanos long, converted to a microsecond
    # timestamp at registration (sources/tables.py) — same truncation
    # DuckDB applies, so oracle comparisons line up.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}


def get_session(
    app_name: str = "neulix_datahub_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    manager is configured; ``shuffle_partitions`` defaults to the core
    count locally (AQE coalesces further), and should be left to AQE on a
    real cluster.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # Local mode = single JVM; give it room. Ignored if a session exists.
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
