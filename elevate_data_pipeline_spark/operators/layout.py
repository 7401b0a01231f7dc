"""Data-layout operators: space-filling-curve clustering for scan pruning.

At 100 TB the cheapest query is the one that skips most of the data.
Parquet/Delta readers prune row groups and files on column min/max
statistics, but statistics only help when the writer CLUSTERED the data
so each file covers a narrow range of the filter columns. A sort on one
column gives perfect pruning for that column and none for the others;
interleaving the bits of several columns into one Z-order (Morton) key
and range-partitioning on it bounds EVERY dimension per file — the
standard multi-dimensional layout (used by Delta OPTIMIZE ZORDER BY,
Hudi, Iceberg).

All arithmetic is int64 bit ops inside whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(*cols: Column | str, bits: int = 16) -> Column:
    """Morton (Z-order) key interleaving the low ``bits`` bits of each
    column (columns are first reduced mod 2**bits so arbitrary int64
    keys map into the lattice).

    Bit j of column i lands at position ``j * n_cols + i``, so the key
    fits in ``bits * n_cols`` bits — keep that <= 62 for int64.
    """
    ncols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(ncols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols overflows int64")
    mask = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(ncols):
        v = F.pmod(c.cast("long"), F.lit(1 << bits))
        for j in range(bits):
            z = z.bitwiseOR(F.shiftleft(F.shiftright(v, j).bitwiseAND(mask), j * n + i))
    return z


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The equivalent ANSI-SQL expression (for oracles / pushdown docs)."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        v = f"(({c}) % {1 << bits})"
        terms.extend(f"((({v} >> {j}) & 1) << {j * n + i})" for j in range(bits))
    return "(" + " | ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame, cols: list[str], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Repartition by range of the Z-key and sort within partitions —
    the write-side layout step. Each output file then spans a small
    Z-range, i.e. a bounded hyper-rectangle in ALL ``cols``, so min/max
    file statistics prune multi-column predicates.

    ``repartitionByRange`` samples the key distribution (one extra job)
    and balances output sizes even under skew; the within-partition sort
    is the piece that tightens row-group statistics.
    """
    z = zorder_key(*cols, bits=bits).alias("_zkey")
    out = df.withColumn("_zkey", z)
    out = (
        out.repartitionByRange(num_partitions, "_zkey")
        if num_partitions
        else out.repartitionByRange("_zkey")
    )
    return out.sortWithinPartitions("_zkey").drop("_zkey")
