"""SparkSession factory.

Replaces the reference's hand-rolled multiprocessing consumer pool
(reference main.py:47-68, 138-159) with the Spark scheduler: one
session, parallelism from partitioning, no per-process DB connections.

Defaults are chosen for the driver's local[N] harness but written so
the same code scales to a multi-executor cluster: AQE enabled (runtime
coalesce + skew-join handling), explicit shuffle partition count,
Arrow-accelerated Python interop for the few pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ngafid-cpat-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Env knobs (driver contract): ``SPARK_GRAFT_CPUS`` sets local
    parallelism; ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` overrides the
    shuffle width (default 32 — sized so sf0.1 partitions fit easily
    in memory; on a real cluster you would size this to ~2-3x total
    cores and let AQE coalesce).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
