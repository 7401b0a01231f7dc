"""Approximate / sketch aggregations for the 100 TB tier.

Exact distinct counts and percentiles shuffle every distinct value;
at crawl scale the sketch versions bound memory and shuffle volume by
the sketch size instead (HyperLogLog++ registers, quantile summaries,
frequent-item maps), at a documented accuracy cost. The reference has
no approximate operators (SURVEY.md §2.4 — its five aggregates are all
exact); this module is north-star scope.

These wrap Spark's JVM-side sketch aggregates (no Python in the hot
path). They are NOT registered as oracle queries: the sketches are
engine-specific (Spark's HLL++ vs DuckDB's), so cross-engine hashes
can't match — correctness is asserted as relative-error bounds against
the exact answers in tests/test_operators.py instead. The exact heavy-
hitters query (queries_llm.events_heavy_hitters) carries the oracle for
this family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, cols: list[str], group_by: list[str] | None = None, rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ distinct count per column (optionally per group).

    ``rsd`` is the target relative standard deviation (2% default ≈ the
    1.5 KB register set); memory per aggregate is O(1/rsd²), independent
    of cardinality — the reason this replaces countDistinct at scale.
    Output columns are ``<col>_approx_distinct``.
    """
    aggs = [
        F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct") for c in cols
    ]
    return df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    group_by: list[str] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (error <= 1/accuracy of
    rank). One ``qs`` array column holding the requested quantiles in
    order; the exact twin is ``percentile`` (events_value_percentiles).
    """
    probs = ", ".join(repr(float(p)) for p in probabilities)
    agg = F.expr(f"approx_percentile({col}, array({probs}), {accuracy})").alias("qs")
    return df.groupBy(*group_by).agg(agg) if group_by else df.agg(agg)


def frequent_items(
    df: DataFrame, col: str, min_share: float = 0.01
) -> DataFrame:
    """Exact heavy hitters: values of ``col`` occurring in more than
    ``min_share`` of rows, with count and share.

    Exact-by-aggregation (groupBy + a broadcast scalar total) rather
    than a lossy CMS/SpaceSaving sketch: the group count shuffle is on
    the profiled column itself and partial aggregation collapses it
    map-side, so the cost is #distinct values, which the min_share
    cutoff makes worth paying. For columns where even #distinct
    explodes, cut cardinality first (hash-bucket the long tail).
    """
    total = df.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("_total"))
        .filter(F.col("share") > min_share)
        .drop("_total")
    )
