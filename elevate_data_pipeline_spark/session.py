"""SparkSession factory tuned for the engine.

Local testing runs ``local[N]``; the same conf scales to a multi-executor
cluster — AQE handles runtime re-planning (partition coalescing, skew-join
splitting), broadcast threshold covers dimension tables, and shuffle
partitions are set explicitly instead of the 200 default.

The reference pinned ``local[2]`` (task/mentoringExecution2.scala:23); we
instead take core count from the environment so the driver's
``SPARK_GRAFT_CPUS`` applies.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these move to cluster-level conf; the *ratios* are what matter:
# shuffle partitions sized so a partition fits comfortably in executor memory
# (~128-256 MB of shuffle data each), AQE coalescing the excess at runtime.
_DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.parquet.filterPushdown": "true",
    # testdata events.parquet stores TIMESTAMP(NANOS); read as long and let
    # the catalog convert to a proper timestamp column
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # the \r-refreshed console progress bar interleaves with anything the
    # driver prints (bench.py emits one machine-parsed JSON line) — off
    "spark.ui.showConsoleProgress": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(app_name: str = "elevate_data_pipeline_spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Core count comes from ``SPARK_GRAFT_CPUS`` (default ``*``). Any conf
    key can be overridden via ``overrides``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(_DEFAULTS)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
