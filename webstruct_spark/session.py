# -*- coding: utf-8 -*-
"""SparkSession factory with the configuration this pipeline assumes.

Local-mode defaults are sized for the sandbox (single JVM); on a real
cluster the same options apply per executor and AQE handles runtime
re-planning (skew-join splitting, partition coalescing).
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webstruct_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(8, cores)
    # Shuffle spill location: this VM's root disk has pathological
    # sync behavior (shuffle-bound stages spend 2x more time in kernel
    # than in user code and 32-core scaling goes NEGATIVE); tmpfs
    # restores it (132k -> 251k turns/s at 32 cores on the 4.4M-turn
    # corpus).  On a real cluster this maps to local NVMe scratch —
    # the standard executor configuration — so it does not flatter the
    # scaling story.  Trade-off: a shuffle larger than free tmpfs
    # fails with ENOSPC instead of spilling slowly to disk — at this
    # sandbox's scale factors spill is <1% of the 126 GB tmpfs; for
    # bigger-than-memory runs set SPARK_LOCAL_DIRS to a disk path.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/webstruct-spark-local"
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
