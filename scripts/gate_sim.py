"""Full driver-gate simulation: run EVERY registry query on a vanilla
SparkSession at sf0.01 and compare against its DuckDB oracle with the
driver's canonicalization (order-insensitive, columns sorted by name).

Usage:  python scripts/gate_sim.py [sf_dir] [name_filter...]

Prints one line per query (ok/FAIL/ERR) and a summary; exit code 1 on any
failure. This is the strongest local predictor of CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from pyspark.sql import SparkSession

from oracle_util import compare, duckdb_con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    # Vanilla session: NO engine confs — exactly what the driver hands us.
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("gate-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb_con(sf_dir)

    names = [n for n in sorted(qs) if not only or any(f in n for f in only)]
    n_ok = n_fail = n_err = 0
    failures: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                compare(df, con, oracles[name], float_tol=0.0)
                status = "ok"
            else:
                assert df.count() >= 0
                status = "ok(rows-only)"
            n_ok += 1
        except AssertionError as e:
            status = f"FAIL {str(e)[:200]}"
            n_fail += 1
            failures.append(name)
        except Exception:
            status = f"ERR {traceback.format_exc(limit=3).splitlines()[-1][:200]}"
            n_err += 1
            failures.append(name)
        print(f"{name:40s} {time.time() - t0:6.2f}s  {status}", flush=True)

    print(f"\n{n_ok} ok / {n_fail} fail / {n_err} err of {len(names)}")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
