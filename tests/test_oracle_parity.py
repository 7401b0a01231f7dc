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


def test_q7_broadcasts_nation_sides_and_prunes_dates(spark):
    plan = _plan(QUERIES["q7_volume_shipping"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # ship-date range must reach the lineitem scan, nation filter its scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "In(n_name" in plan or "EqualTo(n_name" in plan


def test_q17_semi_reduces_before_aggregate(spark):
    """The per-part avg must run on the brand-filtered lineitem (two
    lineitem scans, both joined against the broadcast part filter), and
    the brand predicate must reach the part scan."""
    plan = _plan(QUERIES["q17_small_quantity_revenue"](spark, SF_DIR))
    assert "EqualTo(p_brand,Brand#3)" in plan
    assert "BroadcastHashJoin" in plan
    # lineitem scans read only the 3 needed columns
    import re

    for m in re.finditer(r"ReadSchema: struct<(l_[^>]+)>", plan):
        assert len(m.group(1).split(",")) <= 3


def test_q13_left_join_keeps_zero_order_customers(spark):
    df = QUERIES["q13_customer_distribution"](spark, SF_DIR)
    n_customers = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r["custdist"] for r in df.collect()) == n_customers
