

def test_read_parquet_resilient_skips_and_quarantines(spark, tmp_path):
    from elevate_data_pipeline_spark.sources.files import read_parquet_resilient

    d = tmp_path / "ds"
    spark.range(10).coalesce(1).write.parquet(str(d))
    # drop a truncated/garbage file into the dataset
    bad = d / "part-corrupt.parquet"
    bad.write_bytes(b"PAR1 this is not a parquet file")

    # without quarantine: scan-level skip
    got = read_parquet_resilient(spark, str(d))
    assert got.count() == 10

    # with quarantine: the bad file is moved aside, preserved
    q = tmp_path / "quarantine"
    got2 = read_parquet_resilient(spark, str(d), quarantine=str(q))
    assert got2.count() == 10
    assert not bad.exists()
    assert (q / "part-corrupt.parquet").exists()


def test_quarantine_preserves_relative_paths(spark, tmp_path):
    """Two corrupt files with the SAME basename under different
    partition dirs must both survive quarantine (no overwrite)."""
    from elevate_data_pipeline_spark.sources.files import read_parquet_resilient

    d = tmp_path / "ds2"
    base = spark.range(10)
    base.withColumn("p", (base["id"] % 2).cast("int")) \
        .write.partitionBy("p").parquet(str(d))
    (d / "p=0" / "part-corrupt.parquet").write_bytes(b"PAR1 garbage A")
    (d / "p=1" / "part-corrupt.parquet").write_bytes(b"PAR1 garbage BB")

    q = tmp_path / "quarantine2"
    got = read_parquet_resilient(spark, str(d), quarantine=str(q))
    assert got.count() == 10
    assert (q / "p=0" / "part-corrupt.parquet").read_bytes() == b"PAR1 garbage A"
    assert (q / "p=1" / "part-corrupt.parquet").read_bytes() == b"PAR1 garbage BB"


def test_shared_scan_cache_reuses_persisted_table(spark, monkeypatch):
    """SPARK_GRAFT_SHARED_SCANS=1: two Catalog instances share ONE
    persisted DataFrame per table; off (default) they build fresh
    scans."""
    from conftest import SF_DIR

    from elevate_data_pipeline_spark.sources import catalog as cat
    from elevate_data_pipeline_spark.sources.catalog import Catalog

    a = Catalog(spark, SF_DIR).table("region")
    b = Catalog(spark, SF_DIR).table("region")
    assert a is not b  # plain mode: independent frames

    monkeypatch.setenv("SPARK_GRAFT_SHARED_SCANS", "1")
    cat._SHARED_CACHE.clear()
    try:
        c = Catalog(spark, SF_DIR).table("region")
        d = Catalog(spark, SF_DIR).table("region")
        assert c is d  # one shared persisted frame
        assert c.storageLevel.useMemory
        assert c.count() == a.count()
    finally:
        for df in set(cat._SHARED_CACHE.values()):
            df.unpersist()
        cat._SHARED_CACHE.clear()
