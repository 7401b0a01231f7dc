"""Live JDBC round-trip over embedded Derby (ships in Spark's jars/).

Closes the round-1 gap: S1 (``readFromPostgres``-style pushed-down
sub-query read, reference mentoringFunction2.scala:20-28) and S5 (append
sink, ibid:269-278) were option-wiring-tested only. Derby's embedded
driver gives a real in-JVM database, so the same wrappers are exercised
end-to-end: append -> sub-query read with a pushed predicate -> append
again -> re-read.
"""

from __future__ import annotations

from elevate_data_pipeline_spark.sources import jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path):
    return f"jdbc:derby:{tmp_path}/edp_jdbc_db;create=true"


def test_jdbc_roundtrip_derby(spark, tmp_path):
    url = _url(tmp_path)
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id int, name string"
    )
    jdbc.write_jdbc_append(df, url, "t_round", "u", "p", driver=DRIVER).save()

    got = jdbc.read_jdbc_query(
        spark, url, 'SELECT "id", "name" FROM t_round WHERE "id" >= 2', "u", "p",
        driver=DRIVER,
    ).load()
    assert sorted(map(tuple, got.collect())) == [(2, "beta"), (3, "gamma")]

    # S5 is append-mode: a second write adds rows instead of replacing
    jdbc.write_jdbc_append(df, url, "t_round", "u", "p", driver=DRIVER).save()
    all_rows = jdbc.read_jdbc_query(
        spark, url, 'SELECT "id" FROM t_round', "u", "p", driver=DRIVER
    ).load()
    assert all_rows.count() == 6


def test_jdbc_append_schema_drift_strict_raises(spark, tmp_path):
    """Strict mode refuses a drifted frame BEFORE any row lands (the
    reference appends blind, mentoringFunction2.scala:269-278)."""
    import pytest

    url = _url(tmp_path)
    base = spark.createDataFrame([(1, "a")], "id int, name string")
    jdbc.write_jdbc_append(base, url, "t_drift", "u", "p", driver=DRIVER).save()

    drifted = spark.createDataFrame([(2, 3.5)], "id int, score double")
    with pytest.raises(ValueError, match="schema drift"):
        jdbc.write_jdbc_append(
            drifted, url, "t_drift", "u", "p", driver=DRIVER, schema_mode="strict"
        ).save()
    # nothing was written
    n = jdbc.read_jdbc_query(
        spark, url, 'SELECT "id" FROM t_drift', "u", "p", driver=DRIVER
    ).load().count()
    assert n == 1

    # a matching frame passes strict
    jdbc.write_jdbc_append(
        spark.createDataFrame([(9, "z")], "id int, name string"),
        url, "t_drift", "u", "p", driver=DRIVER, schema_mode="strict",
    ).save()


def test_jdbc_append_schema_drift_lenient_projects(spark, tmp_path):
    """Lenient mode projects onto the sink's schema: extra frame columns
    drop, missing sink columns fill with NULL."""
    url = _url(tmp_path)
    base = spark.createDataFrame([(1, "a")], "id int, name string")
    jdbc.write_jdbc_append(base, url, "t_lenient", "u", "p", driver=DRIVER).save()

    drifted = spark.createDataFrame([(2, 3.5)], "id int, score double")
    jdbc.write_jdbc_append(
        drifted, url, "t_lenient", "u", "p", driver=DRIVER, schema_mode="lenient"
    ).save()

    rows = sorted(
        map(tuple, jdbc.read_jdbc_query(
            spark, url, 'SELECT "id", "name" FROM t_lenient', "u", "p", driver=DRIVER
        ).load().collect())
    )
    assert rows == [(1, "a"), (2, None)]


def test_jdbc_partitioned_read(spark, tmp_path):
    url = _url(tmp_path)
    df = spark.createDataFrame([(i, i * 10) for i in range(100)], "id int, v int")
    jdbc.write_jdbc_append(df, url, "t_part", "u", "p", driver=DRIVER).save()

    got = jdbc.read_jdbc_query(
        spark, url, 'SELECT "id", "v" FROM t_part', "u", "p", driver=DRIVER,
        partition_column='"id"', lower_bound=0, upper_bound=100, num_partitions=4,
    ).load()
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 100
