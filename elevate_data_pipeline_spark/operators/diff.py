"""Snapshot diff: compare two versions of a keyed table.

The reference pipeline is append-only batch (SURVEY.md §0); a data
engine feeding recurring 100 TB training runs additionally needs to
answer "what changed between snapshot A and snapshot B" — to build
incremental dedup inputs, invalidate downstream caches, and audit
ingests. This operator computes the classic CDC-style diff — added /
removed / changed rows — with ONE full outer join on the key:

- both sides reduce to (key, row_hash) where row_hash covers the
  compared columns (xxhash64, JVM-side, whole-stage codegen);
- the outer join shuffles both snapshots by key once; Catalyst prunes
  every column except keys + hash + any carried payload;
- at 100× scale both sides hash-partition on the same key, so the join
  is a straight shuffle join with no skew beyond the key's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Diff snapshots ``a`` (old) and ``b`` (new) by ``key_cols``.

    Returns one row per key that differs: ``key_cols...`` + ``status``
    in {'added','removed','changed'}. Unchanged keys are dropped.
    ``compare_cols`` define row identity for 'changed' detection.
    """
    def hashed(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *key_cols,
            F.xxhash64(*[F.col(c) for c in compare_cols]).alias(f"_h_{tag}"),
        )

    ha, hb = hashed(a, "a"), hashed(b, "b")
    joined = ha.join(hb, key_cols, "full_outer")
    status = (
        F.when(F.col("_h_a").isNull(), F.lit("added"))
        .when(F.col("_h_b").isNull(), F.lit("removed"))
        .when(F.col("_h_a") != F.col("_h_b"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )
