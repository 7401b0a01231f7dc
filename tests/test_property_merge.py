"""Property tests for merge_upsert: against a brute-force Python model
of MERGE semantics, plus idempotency (re-applying the same source is a
no-op on the surviving state)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from elevate_data_pipeline_spark.operators.diff import merge_upsert

rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-5, 5)), min_size=0, max_size=12
)


def _model(target, source, delete_above):
    """Reference MERGE: dict state keyed by k."""
    state = {k: v for k, v in target}
    for k, v in source:
        if k in state:
            if v > delete_above:
                del state[k]
            else:
                state[k] = v
        else:
            state[k] = v
    return state


def _dedup(pairs):
    return list({k: (k, v) for k, v in pairs}.values())


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(target=rows, source=rows, delete_above=st.integers(-2, 6))
def test_merge_upsert_matches_model(spark, target, source, delete_above):
    target, source = _dedup(target), _dedup(source)
    t = spark.createDataFrame(target or [(99, 0)], "k long, v long")
    s = spark.createDataFrame(source or [(98, 0)], "k long, v long")
    if not target:
        t = t.filter(F.col("k") < 0)
    if not source:
        s = s.filter(F.col("k") < 0)
    out = merge_upsert(
        t, s, ["k"], ["v"],
        delete_condition=F.col("v") > delete_above, tag_col=None,
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    want = _model(target, source, delete_above)
    assert got == want

    # idempotency: inserted rows that exceed delete_above get deleted by a
    # re-merge, so restrict to sources where insert implies survive
    surviving_src = [(k, v) for k, v in source if v <= delete_above]
    s2 = spark.createDataFrame(surviving_src or [(98, 0)], "k long, v long")
    if not surviving_src:
        s2 = s2.filter(F.col("k") < 0)
    once = merge_upsert(t, s2, ["k"], ["v"],
                        delete_condition=F.col("v") > delete_above, tag_col=None)
    twice = merge_upsert(once, s2, ["k"], ["v"],
                         delete_condition=F.col("v") > delete_above, tag_col=None)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
