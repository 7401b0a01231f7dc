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


def test_jdbc_upsert_idempotent_merge(spark, tmp_path):
    """write_jdbc_upsert: insert + update via SQL MERGE; replaying the
    same batch is a no-op (the streaming foreachBatch contract)."""
    url = _url(tmp_path)
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id int, score double"
    )
    jdbc.write_jdbc_upsert(base, url, "t_ups", ["id"], "u", "p", driver=DRIVER)

    def read_all():
        got = jdbc.read_jdbc_query(
            spark, url, 'SELECT "id", "score" FROM t_ups', "u", "p", driver=DRIVER
        ).load()
        return sorted(map(tuple, got.collect()))

    assert read_all() == [(1, 10.0), (2, 20.0)]

    # update id=2, insert id=3; duplicate key rows in the batch resolve
    # deterministically to the greatest non-key tuple
    nxt = spark.createDataFrame(
        [(2, 25.0), (2, 24.0), (3, 30.0)], "id int, score double"
    )
    jdbc.write_jdbc_upsert(nxt, url, "t_ups", ["id"], "u", "p", driver=DRIVER)
    assert read_all() == [(1, 10.0), (2, 25.0), (3, 30.0)]

    # replay: same staging content, MERGE converges to the same state
    jdbc.write_jdbc_upsert(nxt, url, "t_ups", ["id"], "u", "p", driver=DRIVER)
    assert read_all() == [(1, 10.0), (2, 25.0), (3, 30.0)]


def test_jdbc_upsert_streaming_sink_replay_safe(spark, tmp_path):
    """foreachBatch + write_jdbc_upsert: running the SAME file stream
    twice (fresh checkpoint = full replay) leaves the sink unchanged,
    where the plain append sink would double every row."""
    import os as _os
    import shutil as _shutil

    from conftest import SF_DIR

    url = _url(tmp_path)
    src = tmp_path / "stream_src"
    src.mkdir()
    _shutil.copy(_os.path.join(SF_DIR, "events.parquet"), src / "part-0.parquet")

    from elevate_data_pipeline_spark.streaming import latest_state, read_events_stream

    def run_once(tag):
        stream = read_events_stream(spark, str(src))
        q = (
            latest_state(stream)
            .writeStream.outputMode("complete")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .foreachBatch(
                lambda df, bid: jdbc.write_jdbc_upsert(
                    df, url, "t_state", ["user_id", "event_type"], "u", "p",
                    driver=DRIVER,
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once("a")
    first = jdbc.read_jdbc_query(
        spark, url, 'SELECT COUNT(*) AS "n" FROM t_state', "u", "p", driver=DRIVER
    ).load().collect()[0]["n"]
    assert first > 0

    run_once("b")  # full replay from scratch
    second = jdbc.read_jdbc_query(
        spark, url, 'SELECT COUNT(*) AS "n" FROM t_state', "u", "p", driver=DRIVER
    ).load().collect()[0]["n"]
    assert second == first


def test_jdbc_upsert_mid_batch_crash_exactly_once(spark, tmp_path):
    """Exactly-once across a simulated MID-BATCH crash: the batch dies
    BETWEEN the durable staging write and the MERGE (the most dangerous
    point — data landed, transaction didn't), the query is restarted
    from the SAME checkpoint, and the replayed batch converges the
    target to exactly the batch-oracle state. A further replay of the
    already-committed batch (crash after MERGE, before the checkpoint
    commit) is then a MERGE no-op."""
    import os as _os
    import shutil as _shutil

    import pytest
    from conftest import SF_DIR

    url = _url(tmp_path)
    src = tmp_path / "crash_src"
    src.mkdir()
    _shutil.copy(_os.path.join(SF_DIR, "events.parquet"), src / "part-0.parquet")

    from elevate_data_pipeline_spark.streaming import latest_state, read_events_stream

    ckpt = str(tmp_path / "ckpt_crash")

    def body(df, bid):
        jdbc.write_jdbc_upsert(
            df, url, "t_crash", ["user_id", "event_type"], "u", "p", driver=DRIVER
        )

    def run():
        q = (
            latest_state(read_events_stream(spark, str(src)))
            .writeStream.outputMode("complete")
            .option("checkpointLocation", ckpt)
            .foreachBatch(body)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    class Boom(Exception):
        pass

    def crash(stage):
        raise Boom(f"simulated crash after staging {stage}")

    jdbc._between_stage_and_merge = crash
    try:
        with pytest.raises(Exception):  # StreamingQueryException wraps Boom
            run()
    finally:
        jdbc._between_stage_and_merge = None

    # the crash killed the batch before the MERGE: no committed target
    conn_rows = jdbc.read_jdbc_query(
        spark, url,
        "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLENAME = 'T_CRASH'",
        "u", "p", driver=DRIVER,
    ).load().collect()
    assert conn_rows == []  # target table never created

    # restart from the SAME checkpoint: the batch replays end to end
    run()
    got = sorted(
        map(tuple,
            jdbc.read_jdbc_query(
                spark, url,
                'SELECT "user_id", "event_type", "last_value" FROM t_crash',
                "u", "p", driver=DRIVER,
            ).load().collect())
    )
    want_df = latest_state(spark.read.parquet(str(src)))
    want = sorted((r["user_id"], r["event_type"], r["last_value"])
                  for r in want_df.collect())
    assert got == want and len(got) > 0

    # crash-after-MERGE recovery = replaying a committed batch: no-op
    body(want_df, 0)
    again = sorted(
        map(tuple,
            jdbc.read_jdbc_query(
                spark, url,
                'SELECT "user_id", "event_type", "last_value" FROM t_crash',
                "u", "p", driver=DRIVER,
            ).load().collect())
    )
    assert again == want


def test_jdbc_upsert_rejects_unsafe_identifiers(spark, tmp_path):
    """Identifier validation fires before any connection is opened."""
    import pytest

    df = spark.createDataFrame([(1, 1.0)], "id int, score double")
    with pytest.raises(ValueError, match="unsafe SQL table name"):
        jdbc.write_jdbc_upsert(df, "jdbc:x", 'T; DROP TABLE x', ["id"], "u", "p")
    with pytest.raises(ValueError, match="not in frame columns"):
        jdbc.write_jdbc_upsert(df, "jdbc:x", "t_ok", ["nope"], "u", "p")


def test_jdbc_upsert_leaves_no_staging_table(spark, tmp_path):
    """The per-invocation staging table is dropped after the MERGE."""
    url = _url(tmp_path)
    df = spark.createDataFrame([(1, 1.0)], "id int, score double")
    jdbc.write_jdbc_upsert(df, url, "t_clean", ["id"], "u", "p", driver=DRIVER)
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url, "u", "p")
    try:
        rs = conn.getMetaData().getTables(None, None, "T_CLEAN%", None)
        names = []
        while rs.next():
            names.append(rs.getString(3))
        rs.close()
    finally:
        conn.close()
    assert names == ["T_CLEAN"]
