"""As-of (backward) join — an operator Spark lacks natively.

For each left row, attach the most recent right row of the same key with
``right.ts <= left.ts``. The naive formulation is a range join (quadratic
per key); this implementation uses the union + windowed
last-non-null trick instead:

1. tag right rows 0 / left rows 1 and union them by name;
2. one shuffle: window over (key) ordered by (ts, tag, tiebreak) with
   ``last(payload, ignorenulls=True)`` carrying the latest right payload
   forward (at equal ts the right row sorts first, so ties match);
3. keep only left rows.

Cost is a single shuffle + sort on the key — the same as a regular
sort-merge join — and state per row is O(payload), so it scales to
100 TB wherever a sort-merge join does. Right rows should be unique per
(key, ts); pre-aggregate otherwise (ties would be resolved by the
tiebreak column, deterministically but arbitrarily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from .util import epoch_us


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join: left rows matched to interval rows of the
    same key with ``start <= ts <= end``.

    Catalyst plans a raw BETWEEN join as BroadcastNestedLoop (quadratic
    per key). This rewrite buckets time: each interval explodes over the
    buckets it covers, each point lands in exactly one bucket, and the
    join becomes an equi-join on (key, bucket) plus a residual range
    filter. Cost: one shuffle on (key, bucket); interval duplication is
    bounded by span/bucket_seconds — size the bucket near the median
    interval length.
    """
    lb = left.withColumn("_bkt", (epoch_us(F.col(ts)) / (bucket_seconds * 1_000_000)).cast("long"))
    ib = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (epoch_us(F.col(start)) / (bucket_seconds * 1_000_000)).cast("long"),
                (epoch_us(F.col(end)) / (bucket_seconds * 1_000_000)).cast("long"),
            )
        ),
    )
    return (
        lb.join(ib, [on, "_bkt"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_bkt")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_ts_out: str = "matched_ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row per key at
    or before the left timestamp.

    ``right``'s non-key, non-ts columns become the attached payload
    (NULL when no right row precedes). ``right.ts`` itself is attached
    as ``right_ts_out``.
    """
    payload_cols = [c for c in right.columns if c not in (on, ts)]
    clash = (set(payload_cols) | {right_ts_out}) & set(left.columns)
    if clash:
        raise ValueError(
            f"right payload columns collide with left columns: {sorted(clash)}; "
            "rename the right side's payload before joining"
        )
    # Carry the matched row as ONE struct with a single last(ignorenulls):
    # per-column carries would mix fields across right rows whenever the
    # most recent row has a NULL in one payload column (it would fall
    # back to an older row's value for just that column).
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts).alias(right_ts_out), *[F.col(c) for c in payload_cols]
        ).alias("_match"),
    )
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_match", F.last("_match", ignorenulls=True).over(w))
    return (
        u.filter(F.col("_side") == 1)
        .select(
            *left.columns,
            F.col(f"_match.{right_ts_out}").alias(right_ts_out),
            *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
        )
    )
