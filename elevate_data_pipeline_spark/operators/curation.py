"""Training-data curation operators: quality filtering, deterministic
sampling, sharding, and sequence packing.

These are the batch-curation stages of an LLM data pipeline downstream
of dedup: score -> filter -> sample per language/source -> pack into
fixed token budgets -> shard for the trainer. Everything is built-in
DataFrame ops (JVM-side, whole-stage codegen) and all randomness is a
deterministic integer hash of the row ID, so runs are reproducible and
a SQL oracle can replay them exactly.

Scale notes:
- filtering/sampling are narrow (no shuffle);
- packing shuffles once on the shard column and sorts within shards —
  at 100 TB use a high-cardinality shard key so window partitions stay
  executor-sized;
- shard assignment is a pure projection; the writer partitions by the
  shard column (``partitionBy("shard")``) so downstream readers prune.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import quality_score, token_count_ws

# Knuth multiplicative hash over the 32-bit ring — uniform enough for
# sampling, trivially identical in any SQL engine.
_KNUTH = 2654435761
_RING = 1 << 32
_HALF = 1 << 16


def _hash32(id_col: str) -> Column:
    """``(id * KNUTH) mod 2^32`` without int64 overflow.

    A direct ``id * 2654435761`` wraps negative in Spark's int64 for
    id >= ~3.5e9 (a 100 TB corpus easily exceeds that), silently breaking
    sampling. Split-multiply keeps every intermediate < 2^48:
    id32 = id mod 2^32 = hi*2^16 + lo, then
    (id32*K) mod 2^32 == ((hi*K mod 2^16)*2^16 + lo*K) mod 2^32.
    """
    id32 = F.pmod(F.col(id_col), F.lit(_RING))
    hi = (id32 / _HALF).cast("long")
    lo = id32 % _HALF
    return (hi * _KNUTH % _HALF * _HALF + lo * _KNUTH) % _RING


def sample_hash(id_col: str) -> Column:
    """Deterministic uniform [0,1) from an integer ID (JVM-side)."""
    return _hash32(id_col) / F.lit(float(_RING))


def sample_hash_sql(id_col: str) -> str:
    """DuckDB expression equivalent to :func:`sample_hash`.

    DuckDB promotes the product to HUGEINT, so the plain form is exact;
    reducing mod 2^32 first keeps it equal to the Spark split-multiply
    for every id.
    """
    return f"((({id_col} % {_RING}) * {_KNUTH}) % {_RING}) / {float(_RING)}"


def quality_filter(
    docs: DataFrame,
    min_quality: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents scoring >= ``min_quality``; carries the score."""
    return docs.withColumn("quality", quality_score(text_col)).filter(
        F.col("quality") >= min_quality
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling.

    ``rates`` maps stratum value -> keep probability; rows hash-sampled
    by ID so the sample is stable across runs and engines (no
    ``rand()``). Narrow operation — no shuffle.
    """
    rate = None
    for value, r in rates.items():
        clause = F.when(F.col(stratum_col) == value, F.lit(float(r)))
        rate = clause if rate is None else rate.when(
            F.col(stratum_col) == value, F.lit(float(r))
        )
    rate = (rate.otherwise(F.lit(float(default_rate)))
            if rate is not None else F.lit(float(default_rate)))
    return docs.filter(sample_hash(id_col) < rate)


def assign_shards(
    docs: DataFrame, n_shards: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Stable shard assignment: ``shard = hash(id) % n_shards``.

    Uses the same multiplicative hash as sampling so shards are
    decorrelated from raw ID ranges (monotone IDs would otherwise land
    range-contiguous rows in the same shard).
    """
    return docs.withColumn("shard", (_hash32(id_col) % F.lit(n_shards)).cast("int"))


def temperature_rates(
    docs: DataFrame,
    stratum_col: str = "source",
    target_total: float = 100.0,
) -> DataFrame:
    """Temperature-resampling rates per stratum (τ = 0.5).

    The standard mixture-reweighting step for multi-source corpora
    (e.g. Raffel et al. 2020 §3.4.3 temperature-scaled mixing): sampling
    share q_s ∝ n_s^τ flattens the source distribution so small sources
    are not drowned out. τ is fixed at 0.5 so the power is ``sqrt`` —
    correctly-rounded IEEE in every engine, unlike ``pow(x, τ)`` whose
    last-bit behavior is implementation-defined.

    Returns ``(stratum, n_docs, q, keep_rate)`` where
    ``keep_rate = min(1, target_total * q / n_s)`` is the per-row keep
    probability that yields ~``target_total`` docs in expectation.
    Exactness: the q denominator Σ sqrt(n_t) is summed as DECIMAL so the
    result is independent of partition/order (IEEE double sums are not
    associative); each q is then one double division. The stats frame is
    one row per stratum — tiny at any corpus size.
    """
    stats = docs.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    ).withColumn("_r", F.sqrt(F.col("n_docs").cast("double")).cast("decimal(28,12)"))
    denom = stats.agg(F.sum("_r").alias("_d"))
    q = F.col("_r").cast("double") / F.col("_d").cast("double")
    keep_rate = F.least(
        F.lit(1.0), F.lit(float(target_total)) * q / F.col("n_docs")
    )
    return (
        stats.crossJoin(F.broadcast(denom))
        .select(
            stratum_col,
            "n_docs",
            q.alias("q"),
            keep_rate.alias("keep_rate"),
        )
    )


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """CDC-style compaction: keep the latest row per key (max
    ``order_col``, ties broken by ``tiebreak`` descending).

    One shuffle on the keys; at scale this is the standard
    upsert-materialization pass over an append-only changelog.
    """
    order = [F.col(order_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_history(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from an append-only
    changelog: every row gets a validity interval
    ``[valid_from, valid_to)`` where ``valid_from`` is its own
    ``order_col`` and ``valid_to`` the next version's (NULL = current,
    flagged ``is_current``). The interval-building complement of
    :func:`latest_by_key` (which keeps only the current row). One
    shuffle on the keys; state per row is O(1).
    """
    order = [F.col(order_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.lead(order_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def pack_sequences(
    docs: DataFrame,
    token_budget: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Offset-based sequence packing: concatenate documents in stable
    (shard, id) order and cut packs every ``token_budget`` tokens.

    Emits (id, shard, n_tokens, seq_offset, pack_id) where
    ``seq_offset`` is the document's start position in the shard's
    token stream and ``pack_id = seq_offset div budget``. The running
    total comes from operators/rank.grouped_cumsum (range repartition +
    broadcast per-(partition, shard) offsets): a per-shard window would
    push 1/n_shards of the corpus through one task. Documents longer
    than the budget simply span packs — the trainer-side splitter
    handles the carry.
    """
    from .rank import grouped_cumsum

    n_tok = token_count_ws(text_col).cast("long")
    summed = grouped_cumsum(
        docs.withColumn("n_tokens", n_tok),
        shard_col,
        [id_col],
        "n_tokens",
        out_col="_cum",
    )
    return (
        summed.withColumn("seq_offset", F.col("_cum") - F.col("n_tokens"))
        # integer div: a double quotient loses exactness past 2^53 tokens
        .withColumn("pack_id", F.expr(f"seq_offset div {int(token_budget)}"))
        .select(id_col, shard_col, "n_tokens", "seq_offset", "pack_id")
    )
