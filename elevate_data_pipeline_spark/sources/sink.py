"""Sinks.

Reference S5: append to a Postgres sink table
(``writeDataToPostgres``, mentoringFunction2.scala:269-278). Primary sink
here is parquet append (partitionable, scales to cluster writes); JDBC
append retained as compat via :mod:`.jdbc`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Append frame to a parquet dataset. At scale, pass ``partition_by``
    on a low-cardinality key so downstream reads partition-prune."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
