"""Skew-resistant aggregation and join helpers.

At 100 TB a handful of hot keys (one viral document source, one giant
customer) can stall a shuffle stage on a single reducer. Two standard
mitigations, expressed as plan rewrites so results are bit-identical to
the naive plan:

- **salted aggregation**: decomposable aggregates run in two stages —
  ``groupBy(key, salt)`` partial then ``groupBy(key)`` final — spreading
  each hot key over ``n_salts`` reducers. The salt is a deterministic
  hash of a row-unique column (NOT ``rand()``: task retries must
  re-produce the same salt or shuffle-file reuse double-counts rows).
- **salted broadcast join**: for a skewed fact ⋈ small dim, explode the
  dim ``n_salts`` ways and salt the fact side, turning one hot hash
  bucket into ``n_salts`` even ones. (With AQE's skew-join handling on,
  prefer letting AQE split; this helper covers the stubborn cases AQE
  can't — e.g. skewed *aggregations*, which AQE does not rebalance.)

These compose with the A1 dynamic-aggregate surface: ``salted_agg``
accepts the same aggregate names the spec compiler allowlists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial, final) expression names per decomposable aggregate
_DECOMPOSABLE = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def salted_agg(
    df: DataFrame,
    key: str,
    agg_on: str,
    agg: str = "sum",
    rename: str | None = None,
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregate: identical result to
    ``df.groupBy(key).agg(agg(agg_on))``, but each key's rows first
    combine across ``n_salts`` sub-groups.

    ``salt_on`` names a row-unique column for the deterministic salt;
    defaults to ``agg_on`` (any column works — an uneven salt only
    costs balance, never correctness).
    """
    if agg not in _DECOMPOSABLE:
        raise ValueError(
            f"aggregate {agg!r} is not decomposable; salted_agg supports "
            f"{sorted(_DECOMPOSABLE)}"
        )
    partial_fn, final_fn = _DECOMPOSABLE[agg]
    out = rename or f"{agg}_{agg_on}"
    salt = F.pmod(F.xxhash64(F.col(salt_on or agg_on)), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.expr(f"{partial_fn}({agg_on})").alias("_partial"))
    )
    return partial.groupBy(key).agg(F.expr(f"{final_fn}(_partial)").alias(out))


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ dim equi-join with the dim side exploded ``n_salts`` ways.

    Use when the fact's key distribution is heavily skewed and the dim
    is broadcastable; each (key, salt) bucket holds ~1/n_salts of a hot
    key's rows. Result equals ``fact.join(dim, key, how)``.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        salted_fact.join(F.broadcast(salted_dim), [key, "_salt"], how).drop("_salt")
    )
