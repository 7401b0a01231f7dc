"""Round-12 optimization measurement: per-query build-time vs execute-time
split, Exchange/ArrowEval node counts, and output row counts.

Usage: python scripts/opt_measure.py [out.json] [name_filter...]

Methodology mirrors bench.py (same session factory, same warm laps, same
median-of-3 collect timing) but additionally times DataFrame *construction*
(driver-side py4j + analysis cost) separately from execution, and scrapes
the formatted plan for shuffle/Python-boundary node counts — the two
numbers that tell us where a sub-second query's time actually goes.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elevate_data_pipeline_spark.session import get_spark  # noqa: E402
from elevate_data_pipeline_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_measure.json"
    filters = sys.argv[2:]
    names = sorted(QUERIES)
    if filters:
        names = [n for n in names if any(f in n for f in filters)]

    spark = get_spark("opt-measure")
    # Same steady-state warmup discipline as bench.py.
    for name in names:
        try:
            QUERIES[name](spark, WARM_DIR).collect()
        except Exception:
            pass
    from pyspark.sql import functions as F

    for fname in sorted(os.listdir(SF_DIR)):
        if fname.endswith(".parquet"):
            t = spark.read.parquet(os.path.join(SF_DIR, fname))
            t.select([F.count(c) for c in t.columns]).collect()

    results = {}
    for name in names:
        try:
            # build time: median of 3 plan constructions
            bts = []
            for _ in range(3):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, SF_DIR)
                bts.append(time.perf_counter() - t0)
            bts.sort()
            plan = plan_text(df)
            nrows = None
            ets = []
            for i in range(3):
                t0 = time.perf_counter()
                rows = QUERIES[name](spark, SF_DIR).collect()
                ets.append(time.perf_counter() - t0)
                if nrows is None:
                    nrows = len(rows)
                del rows
            ets.sort()
            results[name] = {
                "build_s": round(bts[1], 3),
                "exec_s": round(ets[1], 3),
                "total_s": round(bts[1] + ets[1], 3),
                "rows_out": nrows,
                "exchanges": plan.count("Exchange"),
                "aqe_reads": plan.count("AQEShuffleRead"),
                "py_nodes": plan.count("ArrowEvalPython")
                + plan.count("BatchEvalPython")
                + plan.count("MapInPandas")
                + plan.count("MapInArrow")
                + plan.count("FlatMapGroupsInPandas"),
                "sort_merge_joins": plan.count("SortMergeJoin"),
                "bcast_joins": plan.count("BroadcastHashJoin"),
            }
        except Exception as e:  # keep sweeping
            results[name] = {"err": repr(e)[:200]}
        sys.stderr.write(
            f"{name}: {results[name].get('total_s', 'ERR')}\n"
        )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    tot = sum(r.get("exec_s", 0) for r in results.values())
    bld = sum(r.get("build_s", 0) for r in results.values())
    print(json.dumps({"n": len(results), "exec_total": round(tot, 2),
                      "build_total": round(bld, 2), "out": out_path}))


if __name__ == "__main__":
    main()
