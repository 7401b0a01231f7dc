"""Every registry query must match its DuckDB oracle EXACTLY (float_tol=0)
— this mimics the driver's hash gate, so a pass here predicts a pass there."""

from __future__ import annotations

import pytest

from elevate_data_pipeline_spark.queries import ORACLES, QUERIES

from conftest import SF_DIR
from oracle_util import compare, duckdb_con


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, con):
    df = QUERIES[name](spark, SF_DIR)
    compare(df, con, ORACLES[name], float_tol=0.0)


def test_every_query_has_entry_or_rowsonly():
    # queries without oracles are allowed (rows-only check) but must exist
    assert set(ORACLES) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
