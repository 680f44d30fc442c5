"""SparkSession factory tuned for this engine.

Defaults target the sandbox (local[N], single JVM) but every knob is the one
you would also set on a 1000-executor cluster: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), sensible shuffle partitioning,
Arrow for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ahrd_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract) or
    ``local[*]``.  ``shuffle_partitions`` defaults to the core count so local
    runs don't pay 200-task scheduling overhead; on a real cluster you would
    leave AQE's coalescing to pick the effective number.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "32")
        try:
            shuffle_partitions = max(int(cpus_s), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches cut the per-batch Python dispatch share of
        # the vectorized scorers (the NumPy kernels are batch-size-invariant;
        # 64k rows x ~15 cols ~ 10 MB per batch — well within executor heap)
        # SPARK_GRAFT_ARROW_BATCH exists for stress-testing the batch
        # scorers' group-boundary chaining: a tiny value (e.g. 64) forces
        # Arrow batch splits inside nearly every protein group
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "65536"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
