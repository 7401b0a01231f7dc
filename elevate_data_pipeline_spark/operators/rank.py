"""Scale-safe global ranking: exact row numbers and ntile buckets
without a single-partition window.

``ntile(k) OVER (ORDER BY ...)`` and ``row_number() OVER (ORDER BY ...)``
plan as one-partition WindowExec — every row through one task, the
classic scale-killer. These helpers compute the identical values with:

1. ``repartitionByRange`` on the total order (a distributed sort);
2. partition-local ``row_number`` plus broadcast per-partition offsets
   (the offset frame is one row per partition, so its window is
   trivially small);
3. for ntile, the bucket from the global rank arithmetically — the SQL
   standard's definition (first ``N mod k`` buckets take one extra row),
   so results match the built-in bucket-for-bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# Test hook: plan-shape tests flip this off to inspect the pre-checkpoint
# plan (localCheckpoint truncates lineage, hiding the RangePartitioning
# the pins assert on). Production paths never touch it.
PIN_PARTITIONS = True


def _pin(part: DataFrame) -> DataFrame:
    """Pin one materialization of the range-partitioned ``_pid`` frame.

    Every helper here references that frame from two subtrees (the
    per-partition offsets and the main join). ``repartitionByRange``
    SAMPLES its boundaries, so if the subtrees ever recompute
    independently (executor loss, AQE replan) the offsets would be
    derived from a different partitioning than the rows they are joined
    back to — silently wrong results. ``localCheckpoint(eager)``
    truncates lineage so both subtrees read the same materialized
    blocks — and on block loss the job FAILS (no lineage to silently
    recompute a different partitioning from) instead of mismatching."""
    if not PIN_PARTITIONS:
        return part
    return part.localCheckpoint(eager=True)


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact 1-based global row number over ``order_cols`` (which must
    form a total order — include a unique tiebreak column). Adds
    ``out_col``; drops no input columns."""
    part = _pin(
        df.repartitionByRange(num_partitions, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off")
    )
    wl = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn("_lrn", F.row_number().over(wl))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_lrn"))
        .drop("_pid", "_lrn", "_off")
    )


def exact_ntile(
    df: DataFrame,
    k: int,
    order_cols: list[str],
    out_col: str = "bucket",
    num_partitions: int = 32,
) -> DataFrame:
    """``ntile(k)`` over a global order, scale-safely. ``order_cols``
    must include a unique tiebreak so bucket membership is
    deterministic. Adds ``out_col`` (int)."""
    ranked = global_row_number(df, order_cols, out_col="_rn",
                               num_partitions=num_partitions)
    total = ranked.agg(F.count(F.lit(1)).alias("_n"))
    # base = N div k rows per bucket; first N mod k buckets take one
    # extra; ceil(a/b) = (a+b-1) div b keeps everything integer
    bucket = F.expr(
        f"CASE WHEN _rn <= (_n % {k}) * (_n div {k} + 1) "
        f"THEN (_rn + _n div {k}) div (_n div {k} + 1) "
        f"ELSE _n % {k} + (_rn - (_n % {k}) * (_n div {k} + 1) "
        f"      + greatest(_n div {k}, 1) - 1) div greatest(_n div {k}, 1) "
        f"END"
    ).cast("int")
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, bucket)
        .drop("_rn", "_n")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str,
    out_col: str = "cumsum",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact running total of ``sum_col`` over a global order, without a
    single-partition window.

    Same decomposition as :func:`global_row_number`: a distributed range
    sort, a partition-local cumulative sum, and a broadcast join against
    per-partition sum offsets (one row per partition). ``order_cols``
    must form a total order (include a unique tiebreak)."""
    part = _pin(
        df.repartitionByRange(num_partitions, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    sums = part.groupBy("_pid").agg(F.sum(sum_col).alias("_psum"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "_pid", F.coalesce(F.sum("_psum").over(woff), F.lit(0)).alias("_off")
    )
    wl = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        part.withColumn("_lsum", F.sum(sum_col).over(wl))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_lsum"))
        .drop("_pid", "_lsum", "_off")
    )


def grouped_cumsum(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    sum_col: str,
    out_col: str = "cumsum",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact per-group running total when single groups are too big for
    one window partition — the cumsum face of
    :func:`grouped_row_number`: range repartition over (group, order),
    partition-local running sums, per-(partition, group) sums cumulated
    across partition ids and broadcast back as offsets. The running
    total EXCLUDES the current row's value is NOT assumed — ``out_col``
    includes the current row (subtract ``sum_col`` for an exclusive
    offset)."""
    key_cols = [group_col, *order_cols]
    part = _pin(
        df.repartitionByRange(num_partitions, *key_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    sums = part.groupBy("_pid", group_col).agg(F.sum(sum_col).alias("_psum"))
    woff = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_psum").over(woff), F.lit(0)).alias("_off"),
    )
    wl = (
        Window.partitionBy("_pid", group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        part.withColumn("_lsum", F.sum(sum_col).over(wl))
        .join(F.broadcast(offsets), ["_pid", group_col])
        .withColumn(out_col, F.col("_off") + F.col("_lsum"))
        .drop("_pid", "_lsum", "_off")
    )


def grouped_row_number(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact per-group 1-based row number when single groups are too
    big for one window partition.

    ``row_number() OVER (PARTITION BY g ORDER BY ...)`` puts each
    group's entire row set through one task — fine for many small
    groups, a straggler when one group holds 10% of a 100 TB table
    (e.g. ranking all English documents by quality). Decomposition:

    1. ``repartitionByRange(group_col, *order_cols)`` — a group may SPAN
       partitions, but rows of a group are contiguous across the range;
    2. partition-local row_number per (partition, group);
    3. per-(partition, group) counts — at most ``num_partitions`` rows
       per group — cumulated per group across partition ids and
       broadcast back as offsets.

    ``order_cols`` must include a unique tiebreak for determinism.
    """
    key_cols = [group_col, *order_cols]
    part = _pin(
        df.repartitionByRange(num_partitions, *key_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = part.groupBy("_pid", group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    woff = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"),
    )
    wl = Window.partitionBy("_pid", group_col).orderBy(*order_cols)
    return (
        part.withColumn("_lrn", F.row_number().over(wl))
        .join(F.broadcast(offsets), ["_pid", group_col])
        .withColumn(out_col, F.col("_off") + F.col("_lrn"))
        .drop("_pid", "_lrn", "_off")
    )
