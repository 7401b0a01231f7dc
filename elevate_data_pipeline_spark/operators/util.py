"""Partitioning utilities shared by CPU-bound operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_us(col) -> Column:
    """Microseconds-since-epoch from a timestamp column, NTZ-safe.

    ``unix_micros`` rejects TIMESTAMP_NTZ, and parquet written without
    UTC adjustment (the driver's events table) reads back as NTZ on a
    vanilla session. Casting to TIMESTAMP first converts via the session
    timezone — the catalog pins it to UTC, so NTZ values are interpreted
    as UTC instants, matching DuckDB's ``epoch_us`` on naive timestamps.
    A no-op cast for columns that are already TIMESTAMP."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions ahead of a CPU-bound stage.

    A parquet file smaller than ``spark.sql.files.maxPartitionBytes``
    arrives as ONE split — fine for IO, fatal for a downstream
    compute-heavy stage (Pandas UDF, wide expression trees, self-joins)
    that would then run on a single core. Round-robin repartition when
    the frame has fewer partitions than the session's default
    parallelism; no-op otherwise. At real scale the scan already
    produces hundreds of splits and this never fires — it exists for
    the small-file tail (and local benchmarks), where the shuffle it
    adds is proportionally tiny.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
