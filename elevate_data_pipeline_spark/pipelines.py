"""End-to-end corpus curation: the operator families composed the way a
training-data build actually runs them.

language gate → quality gate → near-dup clustering → canonical-survivor
selection → token accounting. Each stage is one of the already-tested
operators (curation.quality_filter, dedup.minhash_lsh_pairs,
cluster.label_components); this module only sequences them, so the
composed plan inherits their scale properties: the gates are scan-level
filters (pushed down), pair generation shuffles on band keys over the
ALREADY-FILTERED corpus (ordering the gates before dedup is the big
cost lever — quality typically drops 30-50% of a crawl before the
quadratic-ish stage), and the final label join broadcasts the component
map. The reference has no multi-stage data-prep pipeline (SURVEY.md §0
— it's a report ETL); this is north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.text import token_count_ws
from .operators import cluster, curation, dedup

# Test hook, same contract as operators.rank.PIN_PARTITIONS: plan-shape
# tests flip this off to inspect the pre-checkpoint plan (localCheckpoint
# truncates lineage, hiding the scans the pushdown pins assert on).
# Production paths never touch it.
PIN_STAGES = True


def _pin_stage(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True) if PIN_STAGES else df


def curate_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    est_threshold: float = 0.25,
) -> DataFrame:
    """Curate a documents frame down to unique, in-language,
    above-quality docs.

    Returns (doc_id, lang, quality, n_tokens) for every surviving doc:
    the minimum-id member of each near-dup cluster (isolated docs
    survive as their own cluster). Deterministic end to end — every
    stage is hash- or id-based, no sampling randomness.
    """
    f = docs.filter(F.col("lang").isin(*langs))
    f = curation.quality_filter(f, min_quality=min_quality)
    # Same stage boundary as pretraining_corpus: the gated slice feeds
    # the pair, labeling, and survivor subtrees — pin one
    # materialization instead of re-running the gates per consumer.
    f = _pin_stage(f)
    pairs = dedup.minhash_lsh_pairs(f, est_threshold=est_threshold).select(
        "id_a", "id_b"
    )
    labeled = cluster.label_components(f, "doc_id", pairs, src="id_a", dst="id_b")
    return labeled.filter(F.col("component") == F.col("doc_id")).select(
        "doc_id",
        "lang",
        "quality",
        token_count_ws("text").cast("long").alias("n_tokens"),
    )


def pretraining_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    est_threshold: float = 0.25,
    block_words: int = 10,
    min_docs: int = 2,
    docs_per_shard: int = 256,
) -> DataFrame:
    """The full pretraining-data build, every stage an already-tested
    operator:

    1. corpus-level boilerplate removal (``dedup.block_dedup`` — C4-style
       repeated-segment strip, so downstream stages see CLEANED text);
    2. language + quality gates on the cleaned text;
    3. near-dup canonicalization (minhash/LSH pairs → connected
       components → keep each cluster's min id);
    4. deterministic training-order shuffle + shard assignment
       (engine-portable Knuth hash ranked through the scale-safe global
       row number).

    Returns (doc_id, lang, quality, n_tokens, pos, shard). Stage order
    is the cost story at 100 TB: boilerplate removal and the gates run
    BEFORE the pair stage, so the band-key shuffle sees only the kept
    in-language slice; the shuffle/shard rank runs last over survivors
    only. Deterministic end to end — no sampling randomness anywhere.
    """
    from .operators.rank import global_row_number

    cleaned = dedup.block_dedup(
        docs, block_words=block_words, min_docs=min_docs
    ).select("doc_id", F.col("cleaned_text").alias("text"))
    base = cleaned.join(docs.select("doc_id", "lang"), "doc_id")
    f = base.filter(F.col("lang").isin(*langs) & (F.length("text") > 0))
    f = curation.quality_filter(f, min_quality=min_quality)
    # Stage boundary: the gated slice feeds THREE downstream subtrees
    # (minhash pair generation, component labeling, survivor projection).
    # Left as lineage, each one re-runs boilerplate strip + gates — the
    # exchanges differ per consumer (different pruned columns), so
    # ReusedExchange cannot merge them. Pinning one materialization here
    # is exactly what a production 100 TB build does between the cheap
    # filter phase and the quadratic-ish dedup phase (write the gated
    # corpus, then dedup it); measured 5.8s -> ~3s at sf0.1.
    f = _pin_stage(f)
    pairs = dedup.minhash_lsh_pairs(f, est_threshold=est_threshold).select(
        "id_a", "id_b"
    )
    labeled = cluster.label_components(f, "doc_id", pairs, src="id_a", dst="id_b")
    surv = labeled.filter(F.col("component") == F.col("doc_id")).select(
        "doc_id",
        "lang",
        "quality",
        token_count_ws("text").cast("long").alias("n_tokens"),
    )
    ranked = global_row_number(
        surv.withColumn("_h", curation._hash32("doc_id")), ["_h", "doc_id"],
        out_col="pos",
    )
    return ranked.select(
        "doc_id",
        "lang",
        "quality",
        "n_tokens",
        F.col("pos").cast("long").alias("pos"),
        F.expr(f"(pos - 1) div {docs_per_shard}").cast("long").alias("shard"),
    )
