"""SparkSession factory with scale-oriented defaults.

Single place to pin the configs that matter at 100 TB: AQE (runtime
re-planning + skew-join splitting), Arrow batching for the pandas UDF
pipeline, and shuffle-partition sizing. Tests and bench override cores via
``master``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "baram-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cores}]"
    # local[N] defaults to task maxFailures=1 (fail-fast); give transient
    # task failures the same retry budget a cluster would: local[N, 4]
    if master.startswith("local[") and "," not in master:
        master = master[:-1] + ",4]"
    if shuffle_partitions is None:
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else cores
        n = inner.split(",")[0].strip()
        # ~2 waves per stage: stragglers (Zipf-skewed pack groups) cost a
        # fraction of a wave instead of gating a single-wave stage; AQE
        # coalesces the small ones back together.
        shuffle_partitions = 64 if n == "*" else max(int(n) * 2, 16)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.scheduler.mode", "FAIR")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
