"""Declarative data-quality validation — expectation checks in one pass.

Before a 100 TB corpus feeds training, every load gets gated on
expectations (ranges, nullability, set membership, referential
sanity). This evaluates ALL rules in a single scan + single aggregate
(one `sum(case when violated)` per rule — no per-rule jobs), emitting
long-form (rule, n, n_violations, violation_rate) so a gate can fail
the load on any nonzero (or above-threshold) rate.

The reference's only validation is the output type gate that silently
skips renames on mismatch (SURVEY.md §2.2 P6, a quirk we replace with
strict errors); this operator is the general, declarative version.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate expectation rules; each rule is a boolean Column that
    should hold for every row (nulls count as violations — an unknown
    is not a pass). Returns (rule, n, n_violations, violation_rate),
    one row per rule, computed in one aggregate."""
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")] + [
        F.sum(F.when(cond, 0).otherwise(1)).alias(f"{name}__viol")
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").cast("long").alias("n"),
            F.col(f"{name}__viol").cast("long").alias("n_violations"),
            (F.col(f"{name}__viol") / F.col("__n")).alias("violation_rate"),
        )
        for name in rules
    ]
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def check(df: DataFrame, rules: dict[str, Column], max_rate: float = 0.0) -> None:
    """Gate: raise ``ValueError`` listing every rule whose violation
    rate exceeds ``max_rate``. The strict-mode face of :func:`validate`."""
    bad = [
        f"{r['rule']}: {r['n_violations']}/{r['n']} ({r['violation_rate']:.4%})"
        for r in validate(df, rules).collect()
        if r["violation_rate"] > max_rate
    ]
    if bad:
        raise ValueError("validation failed: " + "; ".join(bad))


def observed_write(
    df: DataFrame,
    path: str,
    rules: dict[str, Column],
    max_rate: float = 0.0,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> dict:
    """Validate WHILE writing — zero extra scans.

    :func:`check` costs one extra pass over the data before the write;
    at 100 TB that doubles the job. This gate rides the write itself
    with Spark's ``Observation`` API (accumulator-backed metrics
    collected by the same tasks that write the rows): every rule's
    violation count is aggregated in-flight, and after the write
    finishes the gate raises if any rate exceeds ``max_rate`` — with the
    offending dataset already on disk under ``<path>`` for forensics
    (the caller decides whether to promote or drop it; an atomic-swap
    publish belongs to :mod:`..materialize`).

    Returns the observed metrics dict ``{"n": ..., "<rule>__viol": ...}``.
    """
    from pyspark.sql import Observation

    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(cond, 0).otherwise(1)).alias(f"{name}__viol")
        for name, cond in rules.items()
    ]
    writer = df.observe(obs, *aggs).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    got = obs.get
    n = got["n"] or 0
    bad = []
    for name in rules:
        viol = got[f"{name}__viol"] or 0
        rate = viol / n if n else 0.0
        if rate > max_rate:
            bad.append(f"{name}: {viol}/{n} ({rate:.4%})")
    if bad:
        raise ValueError("observed_write gate failed: " + "; ".join(bad))
    return dict(got)
