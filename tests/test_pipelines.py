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


def test_ingest_wire_hash_tracks_record_builder(monkeypatch):
    """The crawl_ingest_files fixture dirname derives from a content
    hash of the wire format (probe record through the real builder +
    WARC writer): stable across calls, and any byte change in the
    record builder's output changes it — no hand-bumped version
    suffix can go stale."""
    import re

    from elevate_data_pipeline_spark import queries_llm as qll

    h1 = qll._ingest_wire_hash()
    assert re.fullmatch(r"[0-9a-f]{12}", h1)
    assert qll._ingest_wire_hash() == h1  # cached, deterministic

    orig = qll._ingest_wire_record
    monkeypatch.setattr(qll, "_INGEST_WIRE_HASH", None)
    monkeypatch.setattr(
        qll,
        "_ingest_wire_record",
        lambda d, t: {**orig(d, t), "uri": "http://changed.test/doc/0"},
    )
    assert qll._ingest_wire_hash() != h1


def test_ingest_files_manifest_read_ignores_stale_shards(spark):
    """A foreign .warc.gz dropped into the shared fixture dir must not
    leak rows into crawl_ingest_files (the read lists explicit shard
    paths, not the dir), and a re-run over unchanged data skips the
    distributed write entirely (shard mtimes unchanged)."""
    import glob
    import os

    from elevate_data_pipeline_spark.queries import QUERIES as _Q
    from elevate_data_pipeline_spark.sources.warc import encode_warc

    q = _Q["crawl_ingest_files"]
    n1 = q(spark, SF_DIR).count()
    dirs = sorted(glob.glob("/tmp/edp_warc_ingest_sf0.001_*_*"))
    assert dirs, "content-hashed fixture dir not created"
    fix_dir = dirs[-1]
    shards = sorted(glob.glob(os.path.join(fix_dir, "shard-*.warc.gz")))
    assert shards
    mtimes = {p: os.path.getmtime(p) for p in shards}

    stale = os.path.join(fix_dir, "shard-99.warc.gz")
    with open(stale, "wb") as fh:
        fh.write(
            encode_warc(
                [
                    {
                        "rec_type": "response",
                        "record_id": "<urn:uuid:stale>",
                        "date": "2026-01-01T00:00:00Z",
                        "uri": "http://stale.test/doc/7",
                        "payload": b"HTTP/1.1 200 OK\r\n\r\nstale",
                    }
                ]
            )
        )
    try:
        n2 = q(spark, SF_DIR).count()
    finally:
        os.remove(stale)
    assert n2 == n1  # stale shard invisible to the manifest read
    assert {p: os.path.getmtime(p) for p in shards} == mtimes  # write skipped
