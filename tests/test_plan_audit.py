"""Wire the registry-wide plan audit into CI (round-6 VERDICT task #1).

The round-5 audit's `Exchange SinglePartition` regex could never match
explain("formatted") output, so its "0 findings" was vacuous and nothing
ran it from the suite despite PLAN_AUDIT.md's claim. These tests (a) run
the corrected sweep over EVERY registry query in-process and fail on any
unwaived/unbounded single-partition exchange, CartesianProduct, or
row-at-a-time Python UDF, and (b) unit-test the classifier so the check
provably fires on plans that should trip it.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import plan_audit  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan_lines(df):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue().splitlines()


def test_regex_fires_on_global_scalar_aggregate(spark):
    """A plain global aggregate must be detected as a bounded single-
    partition exchange — proves the simple-mode scan sees the node the
    formatted-mode scan missed."""
    df = spark.range(100).agg(F.sum("id").alias("s"))
    lines = _plan_lines(df)
    idx = [i for i, ln in enumerate(lines) if plan_audit._RX_SINGLE.search(ln)]
    assert idx, "Exchange SinglePartition not found in simple-mode plan"
    assert plan_audit.classify_single_partition(lines, idx[0]) == "global-scalar"


def test_unbounded_single_partition_is_a_finding(spark):
    """A global sort/window funnel (no partial-agg feeder) must be
    UNBOUNDED, and audit_query must flag it even if a waiver existed."""
    from pyspark.sql import Window

    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    lines = _plan_lines(df)
    idx = [i for i, ln in enumerate(lines) if plan_audit._RX_SINGLE.search(ln)]
    assert idx, "expected a single-partition exchange under the global window"
    assert plan_audit.classify_single_partition(lines, idx[0]) == "UNBOUNDED"
    waived, findings = plan_audit.audit_query("_synthetic_global_window", df)
    assert not waived
    assert findings and "UNBOUNDED" in findings[0][1]


def test_bounded_but_unwaived_is_a_finding(spark):
    """A bounded feeder without a WAIVERS entry still fails — the waiver
    list is the documentation the audit enforces."""
    df = spark.range(100).agg(F.count("*").alias("n"))
    waived, findings = plan_audit.audit_query("_synthetic_not_in_waivers", df)
    assert not waived
    assert findings and "NOT waived" in findings[0][1]


def test_cartesian_product_is_a_finding(spark):
    # hint forces CartesianProductExec; a bare crossJoin of tiny ranges
    # would plan as BroadcastNestedLoopJoin and not exercise the check
    a = spark.range(10).hint("shuffle_replicate_nl").alias("a")
    b = spark.range(10).alias("b")
    df = a.crossJoin(b)
    _, findings = plan_audit.audit_query("_synthetic_cross", df)
    assert any("CartesianProduct" in w for _, w in findings)


@pytest.mark.slow
def test_full_registry_audit_clean(spark):
    """The committed claim: every registry query is either clean or
    carries a structurally-verified bounded waiver. Fails on any new
    unwaived single-partition stage, cartesian product, Python UDF, or
    planning error."""
    lines, findings = plan_audit.run_audit(spark, SF_DIR)
    assert findings == [], "plan audit findings:\n" + "\n".join(
        f"{n}: {w}" for n, w in findings
    )
    # the summary line should account for every registry query
    from elevate_data_pipeline_spark.queries import QUERIES

    assert f"of {len(QUERIES)} queries" in lines[-1]


@pytest.mark.slow
def test_full_registry_audit_clean_gates_off(spark):
    """Same sweep with every driver-local tier gate forced to -1 so the
    DISTRIBUTED chains of the 9 locally-tiered operators (the 100 TB
    path — invisible to the gates-on sweep at audit scale, round-6
    VERDICT task #1) pass the CartesianProduct / SinglePartition /
    BatchEvalPython scan too."""
    lines, findings = plan_audit.run_audit(spark, SF_DIR, gates_off=True)
    assert findings == [], "gates-off plan audit findings:\n" + "\n".join(
        f"{n}: {w}" for n, w in findings
    )


def test_tier_gates_off_covers_every_gate():
    """The forced-off gate list must stay in sync with the gates that
    actually exist in the package — a new tier whose gate is missing
    here would silently escape the gates-off sweep."""
    import importlib
    import pkgutil

    import elevate_data_pipeline_spark as pkg

    found = set()
    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        if m.name.endswith("__main__"):
            continue
        try:
            mod = importlib.import_module(m.name)
        except Exception:
            continue
        for attr in vars(mod):
            if "_LOCAL_MAX_" in attr and attr.startswith("_") and attr.isupper():
                found.add((m.name, attr))
    assert found == set(plan_audit._TIER_GATES), (
        f"missing from _TIER_GATES: {sorted(found - set(plan_audit._TIER_GATES))}; "
        f"stale: {sorted(set(plan_audit._TIER_GATES) - found)}"
    )


def test_pid_feed_regex_accepts_sort_aggregate():
    """SortAggregate prints key= (singular); Spark picks it for
    struct-typed min/max — the suffix._dense_rank stats feeder."""
    assert plan_audit._RX_PID_FEED.search(
        "+- SortAggregate(key=[_pid#396], functions=[min(struct(...))])"
    )
    assert plan_audit._RX_PID_FEED.search(
        "+- HashAggregate(keys=[_pid#502], functions=[count(1)])"
    )
    assert not plan_audit._RX_PID_FEED.search(
        "+- SortAggregate(key=[user_id#3], functions=[min(x)])"
    )


def test_waivers_reference_only_registry_queries():
    from elevate_data_pipeline_spark.queries import QUERIES

    unknown = set(plan_audit.WAIVERS) - set(QUERIES)
    assert not unknown, f"WAIVERS entries for unknown queries: {sorted(unknown)}"
