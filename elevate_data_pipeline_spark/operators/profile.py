"""Dataset profiling — per-column statistics in one pass.

The data-quality sibling of the curation stages: before training on a
100 TB crawl you profile it. One job computes every column's stats
simultaneously (a single scan, one global aggregate — NOT one job per
column), emitted in long form (column, metric, value).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile numeric columns: n, n_null, n_distinct, min, max, mean.

    Returns (col_name, n, n_null, n_distinct, min, max, mean) — one row
    per column, all stats double-typed. Exact distinct counts (swap in
    approx_count_distinct at the 100 TB tier when exactness isn't
    required). Single scan + single aggregate for all columns.
    """
    aggs = []
    for c in cols:
        dc = F.col(c).cast("double")
        # mean via decimal-exact sum: a parallel double sum is summation-
        # order dependent at the last ulp; decimal is not
        mean = F.sum(F.col(c).cast("decimal(28,6)")).cast("double") / F.count(F.col(c))
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__n_null"),
            F.countDistinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(dc).alias(f"{c}__min"),
            F.max(dc).alias(f"{c}__max"),
            mean.alias(f"{c}__mean"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__n").cast("long").alias("n"),
            F.col(f"{c}__n_null").cast("long").alias("n_null"),
            F.col(f"{c}__n_distinct").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min"),
            F.col(f"{c}__max").alias("max"),
            F.col(f"{c}__mean").alias("mean"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def profile_completeness(df: DataFrame) -> DataFrame:
    """Null-rate per column for EVERY column, one pass.

    Returns (col_name, n, n_null, null_rate).
    """
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn")
        for c in df.columns
    ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").cast("long").alias("n"),
            F.col(f"{c}__nn").cast("long").alias("n_null"),
            (F.col(f"{c}__nn") / F.col("__n")).alias("null_rate"),
        )
        for c in df.columns
    ]
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
