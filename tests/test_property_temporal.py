"""Property tests for the temporal joins: asof_join must equal
pandas.merge_asof (the reference backward-asof implementation), and
range_join must equal the naive BETWEEN join, on randomized inputs."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from elevate_data_pipeline_spark.operators.asof import asof_join, range_join

US = 1_000_000


def _ts_col(df, src, dst):
    return df.withColumn(dst, F.timestamp_micros(F.col(src))).drop(src)


@pytest.mark.slow
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
)
def test_asof_join_matches_pandas(spark, left, right):
    # unique (key, ts) on the right (documented operator precondition)
    right = list({(k, t): None for k, t in right})
    lrows = [(i, k, t * US) for i, (k, t) in enumerate(left)]
    rrows = [(k, t * US, float(k * 1000 + t)) for k, t in right]
    l = _ts_col(spark.createDataFrame(lrows, "lid long, k long, t long"), "t", "ts")
    r = _ts_col(spark.createDataFrame(rrows, "k long, t long, payload double"), "t", "ts")

    got = {
        r_.lid: (r_.matched_ts, r_.payload)
        for r_ in asof_join(l, r, on="k", ts="ts").collect()
    }

    lp = pd.DataFrame(lrows, columns=["lid", "k", "t"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "t", "payload"]).sort_values("t", kind="stable")
    m = pd.merge_asof(lp, rp, on="t", by="k", direction="backward",
                      allow_exact_matches=True, suffixes=("", "_r"))
    for row in m.itertuples():
        got_ts, got_payload = got[row.lid]
        if pd.isna(row.payload):
            assert got_payload is None, row
        else:
            assert got_payload == row.payload, row


@pytest.mark.slow
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)),
                 min_size=1, max_size=20),
    ivs=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 60)),
                 min_size=1, max_size=10),
)
def test_range_join_matches_between(spark, pts, ivs):
    prows = [(i, k, t * US) for i, (k, t) in enumerate(pts)]
    irows = [(j, k, s * US, (s + d) * US) for j, (k, s, d) in enumerate(ivs)]
    p = _ts_col(spark.createDataFrame(prows, "pid long, k long, t long"), "t", "ts")
    iv = spark.createDataFrame(irows, "iid long, k long, s long, e long")
    iv = _ts_col(_ts_col(iv, "s", "start"), "e", "end")

    fast = {(r.pid, r.iid) for r in
            range_join(p, iv, on="k", ts="ts", bucket_seconds=7).collect()}
    naive = {(r.pid, r.iid) for r in
             p.join(iv, "k")
             .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
             .collect()}
    assert fast == naive


@pytest.mark.slow
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),  # ts (hours scale)
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=0,
        max_size=60,
    ),
    cut=st.integers(min_value=-10, max_value=510),
)
def test_incremental_rollup_merge_equals_full(spark, events, cut):
    """Base+delta partial rollups merged full-outer must equal the
    single-pass rollup for ANY event set and ANY cutover — including an
    empty base (cut before all data) and an empty delta (cut after)."""
    df = spark.createDataFrame(
        events or [(0, "a", 0)], "h long, k string, v long"
    )
    if not events:
        df = df.limit(0)

    def rollup(d):
        return d.groupBy("h", "k").agg(
            F.count("*").alias("n"), F.sum("v").alias("tv")
        )

    full = {(r.h, r.k): (r.n, r.tv) for r in rollup(df).collect()}
    base, delta = rollup(df.filter(F.col("h") < cut)), rollup(
        df.filter(F.col("h") >= cut)
    )
    merged_df = (
        base.withColumnRenamed("n", "nb").withColumnRenamed("tv", "tvb")
        .join(
            delta.withColumnRenamed("n", "nd").withColumnRenamed("tv", "tvd"),
            ["h", "k"],
            "full_outer",
        )
        .select(
            "h", "k",
            (F.coalesce("nb", F.lit(0)) + F.coalesce("nd", F.lit(0))).alias("n"),
            (F.coalesce("tvb", F.lit(0)) + F.coalesce("tvd", F.lit(0))).alias("tv"),
        )
    )
    merged = {(r.h, r.k): (r.n, r.tv) for r in merged_df.collect()}
    assert merged == full
