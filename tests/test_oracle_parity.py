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


# ---------------------------------------------------------------------------
# plan-shape guards: these queries must keep their scale-critical plan
# properties (pushdown reaching the scan, dimensions broadcast, pruned reads)
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q5_broadcasts_dims_and_prunes(spark):
    plan = _plan(QUERIES["q5_local_supplier_volume"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan
    # lineitem scan must not read all 16 columns
    import re

    m = re.search(r"ReadSchema: struct<(l_[^>]+)>", plan)
    assert m and len(m.group(1).split(",")) <= 4


def test_q6_filters_reach_scan(spark):
    plan = _plan(QUERIES["q6_forecast_revenue"](spark, SF_DIR))
    assert "PushedFilters" in plan and "GreaterThanOrEqual(l_shipdate" in plan


def test_spec_fetchid_single_scan_per_table(spark):
    plan = _plan(QUERIES["spec_fetchid_order_count"](spark, SF_DIR))
    assert plan.count("customer.parquet]") == 1
    assert plan.count("orders.parquet]") == 1
