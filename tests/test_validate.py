

def test_observed_write_passes_and_returns_metrics(spark, tmp_path):
    from elevate_data_pipeline_spark.operators.validate import observed_write
    from pyspark.sql import functions as F

    df = spark.range(100).select(F.col("id"), (F.col("id") % 10).alias("bucket"))
    out = str(tmp_path / "ok")
    got = observed_write(df, out, {"id_nonneg": F.col("id") >= 0})
    assert got["n"] == 100 and got["id_nonneg__viol"] == 0
    assert spark.read.parquet(out).count() == 100


def test_observed_write_gates_on_violations(spark, tmp_path):
    import pytest as _pytest

    from elevate_data_pipeline_spark.operators.validate import observed_write
    from pyspark.sql import functions as F

    df = spark.range(100)
    out = str(tmp_path / "bad")
    with _pytest.raises(ValueError, match="observed_write gate failed"):
        observed_write(df, out, {"id_small": F.col("id") < 90})
    # the data still landed for forensics
    assert spark.read.parquet(out).count() == 100
