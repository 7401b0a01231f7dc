"""Incremental materialization of registry queries — the engine's
"build system" layer.

A recurring 100 TB pipeline does not re-run every query every night; it
re-runs the ones whose INPUTS or whose PLAN changed. ``materialize``
writes each named registry query to ``<out_root>/<name>/`` as parquet
and records a manifest with two fingerprints:

- **input fingerprint**: hash over the (relative path, size, mtime) of
  every file under the data directory — a driver-side listing, no data
  scan. Any ingest, compaction, or backfill perturbs it.
- **plan fingerprint**: hash of the query's formatted physical plan
  (driver-side ``explain``, nothing executes) with auto-generated ids
  normalized out. Changing the operator's implementation — a new join
  strategy, an added filter — perturbs it even when inputs didn't move.

On the next run, a query whose both fingerprints match is SKIPPED; the
rest re-materialize safely: write to ``<dir>.tmp``, rename the live dir
to ``<dir>.old``, rename the tmp in, delete the old. A crash between
any two steps leaves a complete dataset on disk (old or new — never a
destroyed-but-unreplaced gap), and stale ``.tmp``/``.old`` dirs are
reclaimed by the next run. This is deliberately dependency-free (no Delta/Iceberg in the
container); with a table format available the same fingerprints become
the snapshot predicate of a ``REPLACE TABLE AS SELECT``.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import time
from contextlib import redirect_stdout
from io import StringIO

from pyspark.sql import SparkSession

MANIFEST = "_MANIFEST.json"


def input_fingerprint(sf_dir: str) -> str:
    """Hash of (relative path, size, mtime_ns) for every file under
    ``sf_dir``. Driver-side ``os.walk`` only — no Spark job. At cluster
    scale the same contract is served by the object store's listing
    (ETags) or a table format's snapshot id."""
    h = hashlib.sha256()
    for root, dirs, files in sorted(os.walk(sf_dir)):
        dirs.sort()
        for f in sorted(files):
            p = os.path.join(root, f)
            st = os.stat(p)
            rel = os.path.relpath(p, sf_dir)
            h.update(f"{rel}\x00{st.st_size}\x00{st.st_mtime_ns}\x01".encode())
    return h.hexdigest()


def plan_fingerprint(df) -> str:
    """Hash of the formatted physical plan with volatile tokens (attr
    ids ``#123``, plan ids, checkpoint RDD ids, temp paths) normalized,
    so the fingerprint is stable across sessions but changes whenever
    the plan's real shape changes."""
    buf = StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    plan = re.sub(r"#\d+", "#", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=", plan)
    plan = re.sub(r"\[id=#\]", "", plan)
    plan = re.sub(r"ExistingRDD\[[^\]]*\]", "ExistingRDD[]", plan)
    return hashlib.sha256(plan.encode()).hexdigest()


def _rows_written(path: str) -> int:
    """Exact row count from parquet footers (driver-side pyarrow read of
    metadata only — no Spark job, no data pages)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def materialize(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    names: list[str],
    force: bool = False,
    partition_by: dict[str, list[str]] | None = None,
) -> list[dict]:
    """Materialize ``names`` (registry queries) under ``out_root``.

    Returns one status record per query:
    ``{"name", "status": written|skipped, "rows", "seconds"}``.
    ``partition_by`` optionally maps a query name to partition columns
    for its output dataset.
    """
    from .queries import QUERIES

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise KeyError(f"unknown registry queries: {unknown}")

    in_fp = input_fingerprint(sf_dir)
    results = []
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        p_fp = plan_fingerprint(df)
        out_dir = os.path.join(out_root, name)
        man_path = os.path.join(out_dir, MANIFEST)

        if not force and os.path.exists(man_path):
            with open(man_path) as fh:
                man = json.load(fh)
            if man.get("input_fingerprint") == in_fp and man.get("plan_fingerprint") == p_fp:
                results.append(
                    {
                        "name": name,
                        "status": "skipped",
                        "rows": man.get("rows"),
                        "seconds": round(time.perf_counter() - t0, 3),
                    }
                )
                continue

        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        writer = df.write.mode("overwrite")
        cols = (partition_by or {}).get(name)
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(tmp_dir)
        rows = _rows_written(tmp_dir)
        with open(os.path.join(tmp_dir, MANIFEST), "w") as fh:
            json.dump(
                {
                    "query": name,
                    "input_fingerprint": in_fp,
                    "plan_fingerprint": p_fp,
                    "rows": rows,
                    "written_at": time.time(),
                },
                fh,
            )
        # publish without a destroy-first window: rename the live dir
        # aside, swap the new one in, then delete the old — a crash
        # between any two steps leaves either the old or the new dataset
        # fully in place (plus at worst a stale .old/.tmp, which the
        # rmtree calls here reclaim on the next run)
        old_dir = out_dir + ".old"
        shutil.rmtree(old_dir, ignore_errors=True)
        if os.path.exists(out_dir):
            os.rename(out_dir, old_dir)
        os.rename(tmp_dir, out_dir)
        shutil.rmtree(old_dir, ignore_errors=True)
        results.append(
            {
                "name": name,
                "status": "written",
                "rows": rows,
                "seconds": round(time.perf_counter() - t0, 3),
            }
        )
    return results
