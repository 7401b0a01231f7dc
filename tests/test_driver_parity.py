"""Driver-parity insurance: every registry query must run on a VANILLA
SparkSession.

The driver's correctness gate builds its own ``SparkSession`` with none of
the engine confs from ``session.py`` (round-1 post-mortem: 19/20 errors
were ``PARQUET_TYPE_ILLEGAL`` because ``nanosAsLong`` was only set in our
builder). Sessions are per-JVM, so we simulate "vanilla" by UNSETTING the
engine's session-level confs before each query — ``load_table`` must
re-establish what it needs at runtime.

Also enforces the driver's canonicalizer contract: output columns must be
scalar (its pandas order-insensitive hash cannot factorize array/map/struct
cells — round-1 ``orders_priority_sets`` failure).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from elevate_data_pipeline_spark import queries as _q

from conftest import SF_DIR

# Confs session.py sets that a vanilla driver session would NOT have.
# (Master/memory/UI aren't semantics; runtime-settable SQL confs are.)
_ENGINE_CONFS = (
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.session.timeZone",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.execution.arrow.pyspark.enabled",
)

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _make_vanilla(spark):
    saved = {}
    for key in _ENGINE_CONFS:
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        try:
            spark.conf.unset(key)
        except Exception:
            pass
    return saved


def _restore(spark, saved):
    for key, val in saved.items():
        if val is not None:
            spark.conf.set(key, val)


@pytest.mark.parametrize("name", sorted(_q.QUERIES))
def test_query_runs_on_vanilla_session(spark, name):
    import contextlib
    import io

    saved = _make_vanilla(spark)
    try:
        df = _q.QUERIES[name](spark, SF_DIR)
        # schema resolution + a real (limited) execution pass
        schema = df.schema
        df.limit(5).collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    finally:
        _restore(spark, saved)
    for field in schema.fields:
        assert not isinstance(field.dataType, _COMPLEX), (
            f"{name}.{field.name} is {field.dataType.simpleString()}: the "
            "driver's pandas canonicalizer cannot hash non-scalar cells"
        )
    # scale smell: an unkeyed join degenerating to a cartesian product
    # (1-row scalar broadcasts plan as BroadcastNestedLoopJoin — fine)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
