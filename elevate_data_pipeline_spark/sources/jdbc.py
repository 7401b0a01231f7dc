"""JDBC compat source/sink — the reference's native access path.

Reference S1 runs an arbitrary SQL string on Postgres and loads the result
(``readFromPostgres``, mentoringFunction2.scala:20-28: ``dbtable =
"($query) as subquery"``); S5 appends to a sink table (ibid:269-278).

These are thin, driver-free wrappers; the local test environment has no
Postgres, so they are exercised only by unit tests that assert option
wiring, not round-trips. At scale, prefer ``partition_column`` bounds so
the read parallelizes instead of funneling through one connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
):
    """Pushed-down JDBC sub-query read (reference S1)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) as subquery")
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    schema_mode: str = "raw",
):
    """Append writer to a JDBC sink table (reference S5). Returns the
    configured writer; caller invokes ``.save()``.

    The reference appends with no schema check at all
    (mentoringFunction2.scala:269-278) — a drifted frame either errors
    deep in the JDBC layer or, worse, silently lands in the wrong
    columns. ``schema_mode`` makes the contract explicit:

    - ``"raw"`` (default): reference behavior, no check;
    - ``"strict"``: read the sink's schema first (a metadata-only JDBC
      read) and raise ``ValueError`` naming the drift before any row is
      written;
    - ``"lenient"``: project the frame onto the sink's columns — extra
      frame columns are dropped, missing sink columns fill with typed
      NULLs, types are cast to the sink's.

    A sink table that does not exist yet passes every mode (the append
    creates it).
    """
    if schema_mode not in ("raw", "strict", "lenient"):
        raise ValueError(f"schema_mode must be raw|strict|lenient, got {schema_mode!r}")
    if schema_mode != "raw":
        try:
            existing = (
                df.sparkSession.read.format("jdbc")
                .option("url", url)
                .option("dbtable", table)
                .option("user", user)
                .option("password", password)
                .option("driver", driver)
                .load()
                .schema
            )
        except Exception:
            existing = None  # first write creates the table
        if existing is not None:
            sink_types = {f.name: f.dataType for f in existing.fields}
            frame_cols = set(df.columns)
            missing = [c for c in sink_types if c not in frame_cols]
            extra = [c for c in df.columns if c not in sink_types]
            if schema_mode == "strict":
                if missing or extra:
                    raise ValueError(
                        f"schema drift appending to {table}: "
                        f"sink columns missing from frame={missing}, "
                        f"frame columns unknown to sink={extra}"
                    )
            else:
                from pyspark.sql import functions as F

                df = df.select(
                    *[
                        F.col(c).cast(t).alias(c)
                        if c in frame_cols
                        else F.lit(None).cast(t).alias(c)
                        for c, t in sink_types.items()
                    ]
                )
    return (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
    )
