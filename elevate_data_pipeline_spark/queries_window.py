"""Window-function query family: frames (moving aggregates), offsets
(lag deltas), and distribution buckets (ntile).

The reference has no window functions at all (SURVEY.md §2.4 "no window
functions, sorts, limits, or top-k exist"); these extend the engine's
surface alongside the existing running-total / grouped top-k /
percentile entries in queries.py. Exactness: windowed sums are
decimal-cast (partition- and frame-order independent), averages are
exact-decimal sums over bigint counts with one double division, and
every window ORDER BY carries a unique tie-break key so both engines
compute identical frames.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import query
from .sources.catalog import Catalog
from .operators.util import epoch_us


@query(
    "orders_moving_avg",
    """
    SELECT o_orderkey,
           o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / count(*) OVER w AS mov_avg_price
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
    )
    """,
)
def orders_moving_avg(spark, sf_dir):
    """Trailing 3-order moving average of order value per customer.
    ROWS frame over (o_orderdate, o_orderkey) — the unique key makes the
    frame contents deterministic; one shuffle on o_custkey."""
    o = Catalog(spark, sf_dir).table("orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    mov = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast(
        "double"
    ) / F.count("*").over(w)
    return o.select("o_orderkey", "o_custkey", mov.alias("mov_avg_price"))


@query(
    "events_user_gaps",
    """
    SELECT user_id,
           count(gap_us) AS n_gaps,
           CAST(sum(gap_us) AS DOUBLE) / count(gap_us) AS avg_gap_us
    FROM (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    ) g
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_user_gaps(spark, sf_dir):
    """Average inter-event gap per user via lag(). Microsecond integers
    keep the arithmetic exact in both engines (Spark unix_micros ==
    DuckDB epoch_us); the first event per user has no predecessor and is
    excluded from the average."""
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
    return (
        ev.select("user_id", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            (F.sum("gap_us").cast("double") / F.count("gap_us")).alias("avg_gap_us"),
        )
    )


@query(
    "customer_balance_deciles",
    """
    SELECT decile,
           count(*) AS n_customers,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
    FROM (
      SELECT c_acctbal,
             ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer
    ) d
    GROUP BY decile
    """,
)
def customer_balance_deciles(spark, sf_dir):
    """Account-balance deciles with exact ntile(10) semantics, computed
    scale-safely: a plain ``ntile OVER (ORDER BY ...)`` is a
    single-partition WindowExec (every row through one task — a
    scale-killer on a 100x table). Instead:

    1. ``repartitionByRange`` on the total order — a distributed sort;
    2. partition-local ``row_number`` + broadcast per-partition offsets
       (the offset/total frames are one row per partition, so their
       window is trivially small) -> exact global rank;
    3. the ntile bucket from the rank arithmetically: with N rows the
       first ``N % 10`` buckets get ``N div 10 + 1`` rows — the SQL
       standard's (and DuckDB's) definition, so the oracle still
       matches row-for-row.
    """
    from .operators.rank import exact_ntile

    c = Catalog(spark, sf_dir).table("customer").select("c_acctbal", "c_custkey")
    return (
        exact_ntile(c, 10, ["c_acctbal", "c_custkey"], out_col="decile")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@query(
    "events_pivot_types",
    """
    SELECT user_id AS user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def events_pivot_types(spark, sf_dir):
    """Pivot: one row per user, one count column per event type. The
    value list is pinned so Spark skips the extra distinct-values scan
    (at 100 TB an unpinned pivot is two jobs) and the output schema is
    static; absent combinations fill 0 to match COUNT FILTER."""
    ev = Catalog(spark, sf_dir).table("events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


@query(
    "events_resample_hourly",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts FROM bounds
    ),
    agg AS (
      SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
      FROM events GROUP BY date_trunc('hour', ts)
    )
    SELECT g.hour_ts AS hour_ts,
           coalesce(a.n, 0) AS n,
           last_value(a.avg_value IGNORE NULLS)
             OVER (ORDER BY g.hour_ts ROWS UNBOUNDED PRECEDING) AS avg_value_ffill
    FROM grid g LEFT JOIN agg a USING (hour_ts)
    """,
)
def events_resample_hourly(spark, sf_dir):
    """Regularize an event stream onto a continuous hourly grid: empty
    hours appear with n=0 and a forward-filled average (last non-null
    in time order). The grid is sequence+explode off a 1-row min/max
    aggregate (broadcast); the join is grid-side tiny. The ffill window
    is global-order but runs over the GRID (rows ∝ hours in the span,
    not events), so its single partition stays bounded at any corpus
    size; partition by series key when resampling per-entity.
    Gap-filling is the standard prep for time-series models — the
    reference computes nothing like it (SURVEY.md §2.4)."""
    ev = Catalog(spark, sf_dir).table("events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour_ts")
    )
    agg = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts")).agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")
        ).alias("avg_value"),
    )
    w = Window.orderBy("hour_ts").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(agg, "hour_ts", "left")
        .select(
            "hour_ts",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_ffill"),
        )
    )


@query(
    "events_interpolate_hourly",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT t.event_type, g.hour_ts
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
            FROM bounds) g
    ),
    agg AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    carried AS (
      SELECT g.event_type, g.hour_ts, a.v,
             epoch_us(g.hour_ts) // 3600000000 AS hr,
             last_value(a.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour_ts
               ROWS UNBOUNDED PRECEDING) AS pv,
             last_value(CASE WHEN a.v IS NOT NULL
                             THEN epoch_us(g.hour_ts) // 3600000000 END
                        IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour_ts
               ROWS UNBOUNDED PRECEDING) AS ph,
             first_value(a.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN a.v IS NOT NULL
                              THEN epoch_us(g.hour_ts) // 3600000000 END
                         IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM grid g LEFT JOIN agg a USING (event_type, hour_ts)
    )
    SELECT event_type AS event_type, hour_ts AS hour_ts, v AS avg_value,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  pv + (nv - pv) * (CAST(hr - ph AS DOUBLE)
                                    / CAST(nh - ph AS DOUBLE))
                ELSE coalesce(pv, nv) END AS value_interp
    FROM carried
    """,
)
def events_interpolate_hourly(spark, sf_dir):
    """Per-series linear interpolation onto the hourly grid: missing
    hours get pv + (nv-pv) * gap_fraction between the bracketing known
    points; edges hold the nearest known value (ffill/bfill). The
    complement of events_resample_hourly's forward fill — the standard
    gap repair before training time-series models.

    Exactness: known points are exact-decimal hourly means; the
    interpolation is three IEEE ops on doubles in pinned order with the
    gap fraction from exact integer hour indices (epoch_us div 3600e6)
    — bitwise identical across engines, no libm.

    Scale shape: the grid is |series| x |hours| (broadcast-joined from a
    1-row bounds aggregate — never materialized from raw events); all
    four carries are windows PARTITIONED BY the series key over grid
    rows, so no single-partition window and state bounded by the time
    span, not the event count."""
    ev = Catalog(spark, sf_dir).table("events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(bounds).select(
                F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias(
                    "hour_ts"
                )
            )
        )
    )
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")
        ).alias("v")
    )
    hr = (epoch_us(F.col("hour_ts")) / F.lit(3_600_000_000)).cast("long")
    back = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_hr = F.when(F.col("v").isNotNull(), hr)
    carried = (
        grid.join(agg, ["event_type", "hour_ts"], "left")
        .withColumn("_hr", hr)
        .withColumn("pv", F.last("v", ignorenulls=True).over(back))
        .withColumn("ph", F.last(known_hr, ignorenulls=True).over(back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("nh", F.first(known_hr, ignorenulls=True).over(fwd))
    )
    frac = (F.col("_hr") - F.col("ph")).cast("double") / (
        F.col("nh") - F.col("ph")
    ).cast("double")
    return carried.select(
        "event_type",
        "hour_ts",
        F.col("v").alias("avg_value"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .otherwise(F.coalesce("pv", "nv"))
        .alias("value_interp"),
    )


@query(
    "events_trend_slope",
    """
    WITH h AS (
      SELECT event_type, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
             count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    base AS (SELECT min(hr) AS h0 FROM h),
    s AS (
      SELECT event_type,
             count(*) AS k,
             sum(hr - h0) AS sx,
             sum(n) AS sy,
             sum((hr - h0) * (hr - h0)) AS sxx,
             sum((hr - h0) * n) AS sxy
      FROM h CROSS JOIN base GROUP BY event_type
    )
    SELECT event_type AS event_type, CAST(k AS BIGINT) AS n_hours,
           CAST(k * sxy - sx * sy AS DOUBLE)
             / CAST(k * sxx - sx * sx AS DOUBLE) AS slope_per_hour
    FROM s
    """,
)
def events_trend_slope(spark, sf_dir):
    """Per-series volume trend: the OLS slope of hourly event counts
    against the hour index — the load-growth/decay signal a monitoring
    stack fits per metric. No libm and no float accumulation: the four
    sufficient statistics are exact int64 sums over REBASED hour indices
    (hr - min(hr), keeping k*sxy ~ k*hours²*count far under 2^63 even
    for decade-long series), and the slope is one IEEE division of two
    exact integers — bitwise identical across engines.

    Scale shape: the hourly rollup shuffles events once on (series,
    hour) with map-side partials; the sufficient-statistics rollup
    reuses that key prefix; the rebase constant is a broadcast 1-row
    min. Fitting per-series trends over a 100 TB log never moves more
    than |series| x |hours| rows."""
    ev = Catalog(spark, sf_dir).table("events")
    h = ev.groupBy(
        "event_type",
        (epoch_us(F.date_trunc("hour", F.col("ts"))) / F.lit(3_600_000_000))
        .cast("long")
        .alias("hr"),
    ).agg(F.count("*").alias("n"))
    base = h.agg(F.min("hr").alias("h0"))
    x = F.col("hr") - F.col("h0")
    s = (
        h.crossJoin(F.broadcast(base))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(x).alias("sx"),
            F.sum("n").alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(x * F.col("n")).alias("sxy"),
        )
    )
    return s.select(
        "event_type",
        F.col("k").cast("long").alias("n_hours"),
        (
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("slope_per_hour"),
    )
