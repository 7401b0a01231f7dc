"""Warehouse layout: bucketed joins must run without an Exchange, and
partitioned sinks must partition-prune on read."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from elevate_data_pipeline_spark.sources.catalog import Catalog
from elevate_data_pipeline_spark.sources.sink import write_parquet
from elevate_data_pipeline_spark.sources.warehouse import bucketize, read_table

from conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse.dir is a static conf; use the session default (cwd/spark-warehouse)
    cat = Catalog(spark, SF_DIR)
    bucketize(cat.table("orders"), "orders_b", "o_custkey", 8, sort_by="o_custkey")
    bucketize(cat.table("customer"), "customer_b", "c_custkey", 8, sort_by="c_custkey")
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    o = read_table(spark, "orders_b")
    c = read_table(spark, "customer_b").withColumnRenamed("c_custkey", "o_custkey")
    joined = o.join(c, "o_custkey").groupBy("o_custkey").agg(F.count("*").alias("n"))
    # force the non-broadcast path: co-located buckets must merge-join
    # with neither a shuffle Exchange nor a Sort step (sortBy at write)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(bucketed):
    spark = bucketed
    o = read_table(spark, "orders_b")
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(agg)


def test_partitioned_sink_prunes_on_read(spark, tmp_path):
    cat = Catalog(spark, SF_DIR)
    out = str(tmp_path / "orders_by_status")
    write_parquet(
        cat.table("orders"), out, mode="overwrite", partition_by=["o_orderstatus"]
    )
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(o_orderstatus#" in plan
    assert df.count() > 0


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    from elevate_data_pipeline_spark.sources.files import read_jsonl, write_jsonl

    docs = Catalog(spark, SF_DIR).table("documents").limit(50)
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, schema=docs.schema)
    assert {r.doc_id for r in back.collect()} == {r.doc_id for r in docs.collect()}

    # malformed rows land in _corrupt_record instead of failing the read
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "x.jsonl").write_text('{"doc_id": 1, "text": "ok"}\n{broken json\n')
    q = read_jsonl(
        spark, str(bad),
        schema="doc_id long, text string, _corrupt_record string",
    ).cache()
    rows = q.collect()
    assert len(rows) == 2
    assert sum(r._corrupt_record is not None for r in rows) == 1


def test_csv_roundtrip(spark, tmp_path):
    from elevate_data_pipeline_spark.sources.files import read_csv, write_csv

    nat = Catalog(spark, SF_DIR).table("nation")
    out = str(tmp_path / "nation_csv")
    write_csv(nat, out)
    back = read_csv(spark, out, schema=nat.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nat.collect()))


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from elevate_data_pipeline_spark.sources.files import read_orc, write_orc

    orders = Catalog(spark, SF_DIR).table("orders")
    out = str(tmp_path / "orders_orc")
    write_orc(orders, out)
    back = read_orc(spark, out, schema=orders.schema).filter(
        F.col("o_orderstatus") == "O"
    )
    # ORC scan must push the predicate and prune to the selected columns
    plan = _plan(back.select("o_orderkey", "o_orderstatus"))
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan
    assert back.count() == orders.filter(F.col("o_orderstatus") == "O").count()


def test_text_source_line_and_wholefile(spark, tmp_path):
    from elevate_data_pipeline_spark.sources.files import read_text

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("line1\nline2\n")
    (d / "b.txt").write_text("only\n")
    assert read_text(spark, str(d)).count() == 3
    whole = read_text(spark, str(d), whole_file=True)
    assert sorted(r.value.strip() for r in whole.collect()) == ["line1\nline2", "only"]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Files written before a column existed read back with typed NULLs;
    the merged schema is the union by name."""
    from elevate_data_pipeline_spark.sources.files import read_parquet_evolving

    p1, p2 = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    spark.createDataFrame([(1, "a")], "id long, a string").write.parquet(p1)
    spark.createDataFrame([(2, "b", 9.5)], "id long, a string, score double").write.parquet(p2)

    df = read_parquet_evolving(spark, p1, p2)
    assert set(df.columns) == {"id", "a", "score"}
    rows = {r.id: (r.a, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
