"""Parquet-backed table catalog.

The reference reads every input via a pushed-down JDBC sub-query
(``readFromPostgres``, functions/mentoringFunction2.scala:20-28 —
``dbtable = "($query) as subquery"``). In the new engine the primary
source is parquet; filters and projections reach the scan through
Catalyst (PushedFilters / ReadSchema in ``.explain``), so pushdown is
declarative rather than string-assembled.

``Catalog`` also registers every table as a temp view so specs and users
can address tables by name in ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, data_dir: str, name: str) -> DataFrame:
    """Load one table from ``<data_dir>/<name>.parquet``.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark reads
    as a nanosecond long under ``spark.sql.legacy.parquet.nanosAsLong``;
    convert it back to a microsecond timestamp here so downstream plans
    (and the DuckDB oracle) see a real timestamp column.

    The conf is set defensively at runtime so the loader works on ANY
    SparkSession (the driver gate hands us a vanilla one, not the builder
    from ``session.py``); it is runtime-settable and a no-op when already
    set.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # oracle timestamps are TZ-naive; pin the session to UTC so date_trunc
    # and friends agree with DuckDB regardless of host timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(data_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer division — ns epoch values (~1.7e18) overflow double precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


class Catalog:
    """Named-table access over a data directory, with lazy view registration."""

    def __init__(self, spark: SparkSession, data_dir: str):
        self.spark = spark
        self.data_dir = data_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.data_dir, name)
        return self._cache[name]

    def register_views(self, names: tuple[str, ...] = TABLES) -> None:
        """Register each table as a temp view (skip missing/unreadable files).

        Per-table fault tolerance: one unreadable table must not poison
        queries that never touch it.
        """
        for name in names:
            path = os.path.join(self.data_dir, f"{name}.parquet")
            if not os.path.exists(path):
                continue
            try:
                self.table(name).createOrReplaceTempView(name)
            except Exception:
                self._cache.pop(name, None)

    def sql(self, query: str) -> DataFrame:
        """Run SQL against the catalog, registering only referenced tables.

        Lazy registration: a word-boundary scan of the query text picks out
        the known table names so an orders-only query never loads (or
        fails on) an unrelated table.
        """
        import re

        referenced = tuple(
            name for name in TABLES if re.search(rf"\b{name}\b", query)
        )
        self.register_views(referenced or TABLES)
        return self.spark.sql(query)
