"""Property test (SURVEY.md §5.4): for randomized specs, the decorrelated
plan must equal the reference per-ID loop row-for-row — including empty
per-ID subsets (S4 defaults), duplicate IDs, and every join type."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elevate_data_pipeline_spark.plans import compile_pipeline
from elevate_data_pipeline_spark.plans.compat import run_per_id
from elevate_data_pipeline_spark.spec import parse_spec

# fetch variants: plain, duplicated IDs (loop parity: rows replicate),
# and IDs whose order subset is empty at the low end of the key space
FETCH_QUERIES = [
    "SELECT c_custkey FROM customer WHERE c_custkey <= 6",
    "SELECT c_custkey FROM customer WHERE c_custkey <= 3 "
    "UNION ALL SELECT c_custkey FROM customer WHERE c_custkey <= 2",
    "SELECT c_custkey FROM customer WHERE c_custkey BETWEEN 4 AND 9",
]

task_strategy = st.fixed_dictionaries(
    {
        "agg": st.sampled_from(["count", "sum", "min", "max"]),
        "join_type": st.sampled_from(["left", "inner", "right", "full"]),
        "filter_status": st.sampled_from(["", "O", "F"]),
    }
)


def _mk_task(i: int, t: dict) -> dict:
    where = f" WHERE o_orderstatus = '{t['filter_status']}'" if t["filter_status"] else ""
    return {
        "single_process": {
            "input": f"t{i}",
            "query": f"SELECT o_custkey, o_orderkey FROM orders{where}",
            "correlate_on": "o_custkey",
            "agg": t["agg"],
            "agg_on": "o_orderkey",
            "join_on": "c_custkey",
            "join_type": t["join_type"],
            "rename": f"v{i}",
        }
    }


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fetch_q=st.sampled_from(FETCH_QUERIES),
    tasks=st.lists(task_strategy, min_size=1, max_size=2),
)
def test_decorrelated_equals_per_id_loop(catalog, fetch_q, tasks):
    spec = parse_spec(
        json.dumps(
            [
                {
                    "fetchId": {"query": fetch_q, "id": "c_custkey"},
                    "tasks": [_mk_task(i, t) for i, t in enumerate(tasks)],
                }
            ]
        )
    )
    (decorr,) = compile_pipeline(catalog, spec)
    (loop,) = run_per_id(catalog, spec)

    cols = sorted(decorr.columns)
    assert cols == sorted(loop.columns)
    a = sorted([tuple(r[c] for c in cols) for r in decorr.collect()])
    b = sorted([tuple(r[c] for c in cols) for r in loop.collect()])
    assert a == b
