"""Benchmark decontamination: n-gram overlap against a held-out set.

Before training, every serious LLM corpus is checked for contamination —
documents that contain verbatim n-grams from evaluation benchmarks. The
standard method (GPT-3 appendix C, PaLM §7) flags a training document by
the fraction of its word n-grams that appear anywhere in the benchmark
set. The reference has no comparable operator (SURVEY.md §2).

Shape at 100 TB: the benchmark gram set is tiny relative to the corpus
(benchmarks are MBs, corpora are TBs), so the join broadcasts; corpus
grams never materialize beyond the exploded stream feeding a partial
aggregate. If the benchmark side ever outgrows broadcast, the same plan
degrades gracefully to a shuffle join on the gram — hash the gram to a
64-bit key (``xxhash64``) to cut shuffle width; the count semantics are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _distinct_word_ngrams(
    df: DataFrame, n: int, id_cols: list[str], text_col: str
) -> DataFrame:
    """Explode each row into its DISTINCT word n-grams (space-joined).

    Rows with fewer than ``n`` words produce no grams and drop out —
    ``sequence(1, k)`` would generate a DESCENDING range for k < 1, so
    short rows are filtered before the sequence is built.
    """
    ws = F.split(F.col(text_col), " ")
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
            f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
        )
    )
    return (
        df.filter(F.size(ws) >= n)
        .select(*id_cols, F.explode(grams).alias("gram"))
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination against ``benchmark``.

    Returns ``(id_col, n_grams, n_contaminated, contamination_frac)``
    where ``n_grams`` counts the document's distinct word n-grams and
    ``n_contaminated`` how many of them occur in ANY benchmark row.
    Documents with fewer than ``n`` words emit no row.
    """
    doc_grams = _distinct_word_ngrams(docs, n, [id_col], text_col)
    bench_grams = (
        _distinct_word_ngrams(benchmark, n, [], text_col)
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = doc_grams.join(F.broadcast(bench_grams), "gram", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("_hit").alias("n_contaminated"),
        (F.count("_hit").cast("double") / F.count(F.lit(1))).alias(
            "contamination_frac"
        ),
    )
