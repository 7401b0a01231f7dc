"""End-to-end curation pipeline: survivors unique per cluster, gates
monotone, deterministic across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from elevate_data_pipeline_spark.pipelines import curate_corpus
from elevate_data_pipeline_spark.sources.catalog import Catalog

from conftest import SF_DIR


def test_pipeline_gates_and_survivors(spark):
    docs = Catalog(spark, SF_DIR).table("documents")
    out = curate_corpus(docs).cache()
    n_docs = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    n_out = out.count()
    assert 0 < n_out <= n_en <= n_docs
    rows = out.collect()
    assert all(r["quality"] >= 0.5 for r in rows)
    assert all(r["lang"] == "en" for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)
    assert len({r["doc_id"] for r in rows}) == n_out  # unique survivors


def test_pipeline_deterministic(spark):
    docs = Catalog(spark, SF_DIR).table("documents")
    a = sorted(r["doc_id"] for r in curate_corpus(docs).collect())
    b = sorted(r["doc_id"] for r in curate_corpus(docs).collect())
    assert a == b


def test_pipeline_drops_known_near_dups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs far away home", "en", "a"),
        (2, "the quick brown fox jumps over the lazy dog and runs far away home", "en", "a"),
        (3, "it was the best of times it was the worst of times in the city", "en", "a"),
        (4, "texto corto en otro idioma que no pasa la puerta", "es", "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = sorted(r["doc_id"] for r in curate_corpus(docs, min_quality=0.0).collect())
    assert 2 not in got      # dup of 1 dropped, canonical kept
    assert 1 in got and 3 in got
    assert 4 not in got      # language gate
