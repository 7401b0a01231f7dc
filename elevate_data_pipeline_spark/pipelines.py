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
