"""Round-6 ADVICE: the size-gated driver-local fast paths (Lloyd
k-means <=100k rows, PageRank <=1M edges, PQ train <=100k rows) mean the
regular suite only ever exercises the local replays — the distributed
chains they claim to be bit-identical to would otherwise be dead code at
CI scale. These tests force each gate OFF (monkeypatched to -1) and
assert the distributed result equals the local result row-for-row,
bit-for-bit, so a future edit to either side cannot silently diverge for
large corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elevate_data_pipeline_spark.operators import cluster, graph, similarity


def _vectors(spark, n=40, dim=8):
    """Deterministic float32-ish embedding corpus, including half-ulp
    decimal-tie components (2.5e-12 …) that distinguish repr-based from
    exact-binary DECIMAL(28,12) quantization."""
    ties = [5e-13, 2.5e-12, 4.5e-12, 7.5e-12]
    rows = []
    for i in range(n):
        v = [((i * 31 + d * 7) % 19) / 4.0 - 2.0 for d in range(dim)]
        v[i % dim] += ties[i % len(ties)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


def test_quantize_matches_spark_decimal_cast(spark):
    """util.lloyd_local's per-component DECIMAL(28,12) quantization must
    match Spark's cast(double as decimal(28,12)) exactly — including on
    half-ulp ties where the exact binary expansion and the shortest repr
    round to DIFFERENT decimals under HALF_UP."""
    import decimal

    ctx = decimal.Context(prec=50)
    q12 = decimal.Decimal(1).scaleb(-12)

    def dec(x):  # mirror of util.lloyd_local's quantizer
        return decimal.Decimal(repr(x)).quantize(
            q12, rounding=decimal.ROUND_HALF_UP, context=ctx
        )

    vals = [5e-13, 2.5e-12, 4.5e-12, 7.5e-12, 8.5e-12, 1.25, -2.5e-12, 3.141592653589793]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        F.col("x"), F.col("x").cast("decimal(28,12)").alias("d")
    )
    for r in df.collect():
        assert dec(r["x"]) == decimal.Decimal(r["d"]).quantize(q12), r["x"]


def test_kmeans_local_equals_distributed(spark, monkeypatch):
    df = _vectors(spark)
    local = cluster.kmeans(df, k=4, n_iter=2)
    got_local = _rows(local)
    monkeypatch.setattr(cluster, "_LLOYD_LOCAL_MAX_ROWS", -1)
    dist = cluster.kmeans(df, k=4, n_iter=2)
    got_dist = _rows(dist)
    assert got_local == got_dist


def test_pagerank_local_equals_distributed(spark, monkeypatch):
    edges = spark.createDataFrame(
        [(i % 7, (i * 3 + 1) % 7, (i % 4) + 1) for i in range(30)]
        + [(7, 0, 2)],  # node 8 (id 7) never a dst from others; 0 high in-degree
        "src bigint, dst bigint, w bigint",
    )
    for redistribute in (False, True):
        local = graph.pagerank_fixed_point(edges, n_iter=3, redistribute_dangling=redistribute)
        got_local = _rows(local)
        monkeypatch.setattr(graph, "_PAGERANK_LOCAL_MAX_EDGES", -1)
        dist = graph.pagerank_fixed_point(edges, n_iter=3, redistribute_dangling=redistribute)
        got_dist = _rows(dist)
        monkeypatch.setattr(graph, "_PAGERANK_LOCAL_MAX_EDGES", 1_000_000)
        assert got_local == got_dist, f"redistribute={redistribute}"


def test_pagerank_zero_weight_source_matches_distributed(spark, monkeypatch):
    """A source whose weights sum to 0 divides by zero: the distributed
    chain yields NULL q -> contribution coalesced to 0. The local replay
    must not crash and must produce the identical ranks."""
    edges = spark.createDataFrame(
        [(0, 1, 3), (1, 2, 2), (2, 0, 1), (3, 1, 0)],  # node 3: out_w == 0
        "src bigint, dst bigint, w bigint",
    )
    local = graph.pagerank_fixed_point(edges, n_iter=3)
    got_local = _rows(local)
    monkeypatch.setattr(graph, "_PAGERANK_LOCAL_MAX_EDGES", -1)
    dist = graph.pagerank_fixed_point(edges, n_iter=3)
    assert got_local == _rows(dist)


def test_minhash_signatures_local_equals_distributed(spark, monkeypatch, catalog):
    """The driver-local signature tier (tagged small Catalog scan ->
    numpy kernel on the driver) must be bit-identical to the distributed
    Arrow path over the same scan — and both to the pure-JVM expression
    path, which is the semantics of record."""
    from elevate_data_pipeline_spark.operators import dedup

    docs = catalog.table("documents")
    local = dedup._signature_frame(docs, "text", "doc_id", "arrow")
    got_local = _rows(local)
    monkeypatch.setattr(dedup, "_MINHASH_LOCAL_MAX_ROWS", -1)
    dist = dedup._signature_frame(docs, "text", "doc_id", "arrow")
    assert got_local == _rows(dist)
    jvm = dedup._signature_frame(docs, "text", "doc_id", "expr")
    assert got_local == _rows(jvm)


def test_pretraining_corpus_local_equals_distributed(spark, monkeypatch, catalog):
    """The driver-local pipeline replay (block dedup -> gates -> LSH
    components -> survivor rank) must equal the distributed chain
    bit-for-bit — including the IEEE-double quality scores."""
    from elevate_data_pipeline_spark import pipelines

    docs = catalog.table("documents")
    got_local = _rows(pipelines.pretraining_corpus(docs))
    assert len(got_local) > 0
    monkeypatch.setattr(pipelines, "_PIPELINE_LOCAL_MAX_ROWS", -1)
    assert got_local == _rows(pipelines.pretraining_corpus(docs))


def test_curate_corpus_local_equals_distributed(spark, monkeypatch, catalog):
    from elevate_data_pipeline_spark import pipelines

    docs = catalog.table("documents")
    got_local = _rows(pipelines.curate_corpus(docs))
    assert len(got_local) > 0
    monkeypatch.setattr(pipelines, "_PIPELINE_LOCAL_MAX_ROWS", -1)
    assert got_local == _rows(pipelines.curate_corpus(docs))


def test_substring_spans_local_equals_distributed(spark, monkeypatch, catalog):
    from elevate_data_pipeline_spark.operators import dedup

    docs = catalog.table("documents")
    got_local = _rows(dedup.substring_dup_spans(docs))
    assert len(got_local) > 0
    monkeypatch.setattr(dedup, "_SPANS_LOCAL_MAX_ROWS", -1)
    assert got_local == _rows(dedup.substring_dup_spans(docs))


def test_bloom_decontaminate_local_equals_distributed(spark, monkeypatch, catalog):
    from elevate_data_pipeline_spark.operators import decontam

    docs = catalog.table("documents")
    got_local = _rows(decontam.bloom_decontaminate(docs))
    # non-default depth: the local tier must honor depth too (it once
    # iterated all CMS_SALTS regardless, diverging from the distributed
    # tier's CMS_SALTS[:depth] — advisor finding)
    got_local_d2 = _rows(decontam.bloom_decontaminate(docs, depth=2))
    assert len(got_local) > 0
    monkeypatch.setattr(decontam, "_BLOOM_LOCAL_MAX_ROWS", -1)
    assert got_local == _rows(decontam.bloom_decontaminate(docs))
    assert got_local_d2 == _rows(decontam.bloom_decontaminate(docs, depth=2))


def test_snm_local_equals_distributed(spark, monkeypatch, catalog):
    from elevate_data_pipeline_spark.operators import dedup

    docs = catalog.table("documents")
    got_local = _rows(dedup.sorted_neighborhood_pairs(docs, window=5, n=3, threshold=0.5))
    assert len(got_local) > 0
    monkeypatch.setattr(dedup, "_SNM_LOCAL_MAX_ROWS", -1)
    assert got_local == _rows(
        dedup.sorted_neighborhood_pairs(docs, window=5, n=3, threshold=0.5)
    )


def test_suffix_array_local_equals_distributed(spark, monkeypatch, catalog):
    """The numpy doubling replay must equal the distributed prefix-
    doubling chain rank-for-rank."""
    from elevate_data_pipeline_spark.operators import suffix

    docs = catalog.table("documents")
    got_local = _rows(suffix.suffix_array(docs))
    assert len(got_local) > 0
    monkeypatch.setattr(suffix, "_SA_LOCAL_MAX_ROWS", -1)
    assert got_local == _rows(suffix.suffix_array(docs))


def test_pq_index_local_equals_distributed(spark, monkeypatch):
    df = _vectors(spark, n=48, dim=8)
    cents_l, codes_l = similarity.pq_index(df, m=2, k=3, n_iter=1, dim=8)
    got_cents_l = _rows(cents_l, ["_s", "_cl", "_c"])
    got_codes_l = _rows(codes_l, ["_id", "_s", "_code"])
    monkeypatch.setattr(similarity, "_PQ_LOCAL_MAX_ROWS", -1)
    similarity._PQ_CACHE.clear()
    cents_d, codes_d = similarity.pq_index(df, m=2, k=3, n_iter=1, dim=8)
    assert got_cents_l == _rows(cents_d, ["_s", "_cl", "_c"])
    assert got_codes_l == _rows(codes_d, ["_id", "_s", "_code"])
    similarity._PQ_CACHE.clear()
