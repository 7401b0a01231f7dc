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


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str],
    delete_condition: F.Column | None = None,
    tag_col: str | None = "action",
    on_duplicate_keys: str = "fanout",
) -> DataFrame:
    """Lakehouse ``MERGE INTO`` semantics as one full-outer join.

    **Precondition:** the source must be unique per ``key_cols``. A real
    MERGE raises on multiple source matches; this join-based form
    instead fans out one output row per duplicate (``on_duplicate_keys
    = "fanout"``, the default — zero-cost when the precondition holds).
    Pass ``on_duplicate_keys="dedup"`` to enforce uniqueness first: the
    greatest non-key tuple wins per key (deterministic regardless of
    partition order — the same rule ``write_jdbc_upsert`` applies), at
    the cost of one extra aggregate shuffle on the source.

    The resolution of a MERGE (WHEN MATCHED [AND cond] THEN
    DELETE / UPDATE SET ..., WHEN NOT MATCHED THEN INSERT) against an
    append-only store is the *materialized post-merge state*; Delta /
    Iceberg implement it as exactly this join plus a rewrite of the
    touched files. Semantics here:

    - matched + ``delete_condition`` (evaluated on source columns) →
      row dropped;
    - matched otherwise → ``update_cols`` taken from source, all other
      target columns kept;
    - source-only → inserted as-is;
    - target-only → kept unchanged.

    ``tag_col`` (optional) appends the per-row action in
    {'kept','updated','inserted','deleted'→absent}.

    Scale shape: both sides shuffle once on ``key_cols`` (the same
    hash partitioning a real table-format MERGE uses to co-locate
    matches); source columns not present in the target are pruned
    before the join; no window, no collect. At 100 TB the
    source is typically ≪ target — Catalyst/AQE will pick a broadcast
    join on its own when the source stats allow it.
    """
    missing = [c for c in update_cols if c not in source.columns]
    if missing:
        raise ValueError(f"merge_upsert: update_cols not in source: {missing}")
    if on_duplicate_keys not in ("fanout", "dedup"):
        raise ValueError(
            f"on_duplicate_keys must be fanout|dedup, got {on_duplicate_keys!r}"
        )
    if on_duplicate_keys == "dedup":
        nk = [c for c in source.columns if c not in key_cols]
        if nk:
            source = source.groupBy(*key_cols).agg(
                F.max(F.struct(*nk)).alias("_m")
            ).select(*key_cols, *[F.col(f"_m.{c}").alias(c) for c in nk])
        else:
            source = source.dropDuplicates(key_cols)
    s_cols = [c for c in source.columns if c in set(target.columns)]
    src = source.select(
        *[F.col(c).alias(f"_s_{c}") for c in s_cols],
        F.lit(True).alias("_in_src"),
        F.coalesce(
            delete_condition if delete_condition is not None else F.lit(False),
            F.lit(False),
        ).alias("_del"),
    )
    tgt = target.withColumn("_in_tgt", F.lit(True))
    cond = [tgt[k] == src[f"_s_{k}"] for k in key_cols]
    j = tgt.join(src, cond, "full_outer")

    matched = F.col("_in_tgt").isNotNull() & F.col("_in_src").isNotNull()
    # matched + delete predicate → drop the row entirely
    j = j.filter(~(matched & F.col("_del")))

    out_cols = []
    for c in target.columns:
        if c in key_cols:
            out_cols.append(F.coalesce(F.col(c), F.col(f"_s_{c}")).alias(c))
        elif c in update_cols:
            # matched OR inserted → source value; target-only → target value
            out_cols.append(
                F.when(F.col("_in_src").isNotNull(), F.col(f"_s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        elif c in s_cols:
            # not an update column: keep target value on match, but an
            # INSERT (no target row) still takes the full source row
            out_cols.append(
                F.when(F.col("_in_tgt").isNull(), F.col(f"_s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    if tag_col:
        out_cols.append(
            F.when(matched, F.lit("updated"))
            .when(F.col("_in_tgt").isNull(), F.lit("inserted"))
            .otherwise(F.lit("kept"))
            .alias(tag_col)
        )
    return j.select(*out_cols)


def incremental_join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
    tag_col: str | None = "ivm_term",
) -> DataFrame:
    """Delta of an inner join under insert-only updates — incremental
    view maintenance (IVM) for a materialized join:

        (A + dA) join (B + dB) = A join B  +  dA join B
                                          +  A join dB  +  dA join dB

    so a maintained view appends exactly the three delta terms and never
    rescans ``A join B``. This is how a recurring 100 TB pipeline keeps a
    materialized fact-join current: the old sides are the (large) stored
    tables, the deltas the (small) new partitions, and every term is a
    key-partitioned join where Catalyst/AQE broadcasts the delta side
    when stats allow — cost scales with the CHANGE, not the corpus.
    The three terms are disjoint by construction (a row's A-side is in
    exactly one of dA / A, likewise B), so the union is exact for
    multiset semantics; ``tag_col`` (optional) records which term
    produced each row ('delta_a', 'delta_b', 'both_delta') for audit.

    Deletions/updates are CDC retractions — compose with
    :func:`snapshot_diff` to derive signed deltas first; this operator
    implements the insert-only (append-only ingest) case, which is the
    reference pipeline's write model.
    """
    def _t(df: DataFrame, tag: str) -> DataFrame:
        return df.withColumn(tag_col, F.lit(tag)) if tag_col else df

    t1 = _t(a_delta.join(b_old, on), "delta_a")
    t2 = _t(a_old.join(b_delta, on), "delta_b")
    t3 = _t(a_delta.join(b_delta, on), "both_delta")
    return t1.unionByName(t2).unionByName(t3)
