"""Incremental materialization: write-once / skip-on-match /
rematerialize on input OR plan change, atomic output swap."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from elevate_data_pipeline_spark.materialize import (
    input_fingerprint,
    materialize,
    plan_fingerprint,
)

from conftest import SF_DIR


@pytest.fixture()
def data_copy(tmp_path):
    d = tmp_path / "data"
    shutil.copytree(SF_DIR, d)
    return str(d)


def test_materialize_write_then_skip(spark, data_copy, tmp_path):
    out = str(tmp_path / "out")
    names = ["union_fold", "events_hourly"]
    first = materialize(spark, data_copy, out, names)
    assert [r["status"] for r in first] == ["written", "written"]
    assert all(r["rows"] > 0 for r in first)
    # parquet datasets actually readable
    for n, rec in zip(names, first):
        df = spark.read.parquet(os.path.join(out, n))
        assert df.count() == rec["rows"]

    second = materialize(spark, data_copy, out, names)
    assert [r["status"] for r in second] == ["skipped", "skipped"]
    assert [r["rows"] for r in second] == [r["rows"] for r in first]


def test_materialize_rematerializes_on_input_change(spark, data_copy, tmp_path):
    out = str(tmp_path / "out")
    assert materialize(spark, data_copy, out, ["union_fold"])[0]["status"] == "written"
    # touch one input file: mtime changes, fingerprint changes
    target = os.path.join(data_copy, "orders.parquet")
    os.utime(target, (os.stat(target).st_atime, os.stat(target).st_mtime + 10))
    rec = materialize(spark, data_copy, out, ["union_fold"])[0]
    assert rec["status"] == "written"


def test_materialize_force_and_manifest(spark, data_copy, tmp_path):
    out = str(tmp_path / "out")
    materialize(spark, data_copy, out, ["union_fold"])
    rec = materialize(spark, data_copy, out, ["union_fold"], force=True)[0]
    assert rec["status"] == "written"
    man = json.load(open(os.path.join(out, "union_fold", "_MANIFEST.json")))
    assert man["query"] == "union_fold"
    assert man["input_fingerprint"] == input_fingerprint(data_copy)
    assert man["rows"] == rec["rows"]


def test_plan_fingerprint_stable_and_distinct(spark, data_copy):
    from elevate_data_pipeline_spark.queries import QUERIES

    a1 = plan_fingerprint(QUERIES["union_fold"](spark, data_copy))
    a2 = plan_fingerprint(QUERIES["union_fold"](spark, data_copy))
    b = plan_fingerprint(QUERIES["events_hourly"](spark, data_copy))
    assert a1 == a2  # attr-id churn normalized out
    assert a1 != b


def test_materialize_unknown_query_raises(spark, data_copy, tmp_path):
    with pytest.raises(KeyError, match="unknown registry queries"):
        materialize(spark, data_copy, str(tmp_path / "o"), ["nope"])


def test_materialize_cleans_stale_tmp_from_crashed_run(spark, data_copy, tmp_path):
    """A killed run leaves <name>.tmp behind; the next run must ignore
    the orphan, rebuild cleanly, and leave only the final dataset."""
    out = str(tmp_path / "out")
    stale = os.path.join(out, "union_fold.tmp")
    os.makedirs(stale)
    with open(os.path.join(stale, "garbage"), "w") as fh:
        fh.write("partial write from a crashed driver")
    rec = materialize(spark, data_copy, out, ["union_fold"])[0]
    assert rec["status"] == "written"
    assert not os.path.exists(stale)
    assert spark.read.parquet(os.path.join(out, "union_fold")).count() == rec["rows"]
