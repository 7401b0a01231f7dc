"""CLI runner: spec file in, parquet out; compat loop and decorrelated
plans must write identical results."""

from __future__ import annotations

import json
import os

from elevate_data_pipeline_spark.cli import main

from conftest import SF_DIR

SPEC = {
    "input_data_schema": [
        {
            "fetchId": {
                "query": "SELECT c_custkey FROM customer WHERE c_custkey <= 40",
                "id": "c_custkey",
            },
            "tasks": [
                {
                    "single_process": {
                        "input": "order_count",
                        "query": "SELECT o_custkey, o_orderkey FROM orders",
                        "correlate_on": "o_custkey",
                        "agg": "count",
                        "agg_on": "o_orderkey",
                        "join_on": "c_custkey",
                        "join_type": "left",
                        "rename": "total_orders",
                    }
                }
            ],
        }
    ],
    "output_data_schema": {
        "c_custkey": {"Input_data_type": "LongType", "rename": "customer_id"},
        "total_orders": {"Input_data_type": "LongType", "rename": "n_orders"},
    },
}


def _read(spark, path):
    return {
        (r.customer_id, r.n_orders) for r in spark.read.parquet(path).collect()
    }


def test_cli_run_writes_parquet(spark, tmp_path):
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(SPEC))
    out = str(tmp_path / "out")
    assert main(["run", "--spec", str(spec_file), "--data", SF_DIR, "--out", out]) == 0
    rows = _read(spark, out)
    assert len(rows) == 41  # c_custkey 0..40 inclusive
    assert all(isinstance(n, int) for _, n in rows)


def test_cli_compat_loop_matches(spark, tmp_path):
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(SPEC))
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    assert main(["run", "--spec", str(spec_file), "--data", SF_DIR, "--out", out_a]) == 0
    assert main(
        ["run", "--spec", str(spec_file), "--data", SF_DIR, "--out", out_b, "--compat-loop"]
    ) == 0
    assert _read(spark, out_a) == _read(spark, out_b)


def test_cli_show_and_explain(tmp_path, capsys):
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(SPEC))
    assert main(["run", "--spec", str(spec_file), "--data", SF_DIR, "--show", "3"]) == 0
    assert main(["run", "--spec", str(spec_file), "--data", SF_DIR, "--explain"]) == 0
    assert "AdaptiveSparkPlan" in capsys.readouterr().out


def test_example_specs_run(spark, tmp_path):
    """The shipped example specs must run end-to-end through the CLI."""
    import glob

    for spec_file in sorted(glob.glob("examples/*.json")):
        out = str(tmp_path / os.path.basename(spec_file).replace(".json", ""))
        assert main(["run", "--spec", spec_file, "--data", SF_DIR, "--out", out]) == 0
        assert spark.read.parquet(out).count() > 0


def test_cli_query_show_and_list(capsys):
    from elevate_data_pipeline_spark.cli import main

    assert main(["query", "list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "dedup_minhash_lsh" in out

    assert main(["query", "q6_forecast_revenue",
                 "--data", "/root/testdata/sf0.001", "--show", "3"]) == 0
    assert "revenue" in capsys.readouterr().out

    assert main(["query", "no_such_query", "--show", "1"]) == 2


def test_cli_query_writes_parquet(spark, tmp_path):
    from elevate_data_pipeline_spark.cli import main

    out = str(tmp_path / "q_out")
    assert main(["query", "orders_priority_sets",
                 "--data", "/root/testdata/sf0.001", "--out", out]) == 0
    assert spark.read.parquet(out).count() > 0
