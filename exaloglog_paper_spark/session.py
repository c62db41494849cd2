"""SparkSession factory with scale-oriented defaults.

Designed for a multi-executor cluster (the sandbox runs local[N] as a
single-JVM proxy): AQE on for runtime coalescing/skew handling of the exact
relational queries, Arrow enabled for all pandas-UDF sketch paths, shuffle
partition count sized to core count (sketch shuffles carry only tiny binary
states, so fewer/larger partitions beat Spark's 200 default at this shape).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "exaloglog-paper-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    scheduler_mode: str | None = None,
) -> SparkSession:
    """``scheduler_mode="FAIR"`` lets concurrent jobs submitted from
    multiple driver threads share executor slots round-robin (per-thread
    pools) instead of FIFO head-of-line blocking — used by the error-sim
    grid's --jobs fan-out. Only honored at session creation."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = max(int(n), 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.scheduler.mode",
            scheduler_mode
            or os.environ.get("SPARK_GRAFT_SCHEDULER", "FIFO"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # wide aggregates (SimHash's 64 bit-sum columns) exceed the default
        # whole-stage-codegen field cap (100) and silently fall back to
        # interpreted evaluation — measured 23% slower on the signature
        # stage. 256 keeps codegen on for every operator this engine plans
        # at any scale; the trade-off is only one-time JIT compile cost.
        .config(
            "spark.sql.codegen.maxFields",
            os.environ.get("SPARK_GRAFT_CODEGEN_MAX_FIELDS", "256"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    return builder.getOrCreate()
