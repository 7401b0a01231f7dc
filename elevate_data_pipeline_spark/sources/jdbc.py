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
):
    """Append writer to a JDBC sink table (reference S5). Returns the
    configured writer; caller invokes ``.save()``."""
    return (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
    )
