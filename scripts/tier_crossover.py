"""Tier-crossover bench: measure every driver-local tier against its
distributed chain at sizes bracketing the gate (round-6 VERDICT task #2).

The committed testdata tops out at 5,000 documents (sf0.1), so the
100k-gated tiers never engage their distributed chains in any committed
bench. This harness generates LARGER synthetic corpora with the same
generator distribution as `/root/testdata` documents (31-word vocab —
30 uniform + rare 'dup', doc length uniform 10..100 words, 20 sources,
lang en-weighted), plus gaussian-mixture embeddings and random edge
lists, then times each tiered operator BOTH ways (gate forced huge =
local tier; gate forced -1 = distributed chain) at 3+ sizes per gate.

Timing uses the noop sink (full computation, no driver collect), warm
session, median of N runs. Correctness on the big corpora: DuckDB
oracle compare for the dedup-family queries with collectable outputs,
Spark-side exceptAll bit-equality (local vs distributed) for the
tiers whose outputs are too large to collect twice.

Usage:
  python scripts/tier_crossover.py gen            # write corpora to /tmp
  python scripts/tier_crossover.py bench [family] # append results JSONL
  python scripts/tier_crossover.py verify         # oracle + bit-equality
  python scripts/tier_crossover.py render         # write docs/TIER_CROSSOVER.md
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

BASE = "/tmp/tier_crossover"
STATE = os.path.join(BASE, "results.jsonl")

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.40, 0.15, 0.15, 0.15, 0.15]

DOC_SIZES = [50_000, 100_000, 150_000]
SNM_SIZES = [5_000, 10_000, 20_000]
MINHASH_SIZES = [1_000, 2_000, 4_000]
EMB_SIZES = [5_000, 10_000, 20_000, 50_000, 100_000, 200_000]
EDGE_SIZES = [500_000, 1_000_000, 2_000_000]

# family -> (registry query, gate module path, gate attr, sizes, corpus kind)
FAMILIES = {
    "pipelines": ("pretraining_corpus", "elevate_data_pipeline_spark.pipelines",
                  "_PIPELINE_LOCAL_MAX_ROWS", DOC_SIZES, "docs"),
    "spans": ("dedup_substring_spans", "elevate_data_pipeline_spark.operators.dedup",
              "_SPANS_LOCAL_MAX_ROWS", DOC_SIZES, "docs"),
    "suffix": ("dedup_suffix_array", "elevate_data_pipeline_spark.operators.suffix",
               "_SA_LOCAL_MAX_ROWS", DOC_SIZES, "docs"),
    "bloom": ("decontam_bloom", "elevate_data_pipeline_spark.operators.decontam",
              "_BLOOM_LOCAL_MAX_ROWS", DOC_SIZES, "docs"),
    "snm": ("dedup_sorted_neighborhood", "elevate_data_pipeline_spark.operators.dedup",
            "_SNM_LOCAL_MAX_ROWS", SNM_SIZES, "docs"),
    "minhash": ("minhash_signature", "elevate_data_pipeline_spark.operators.dedup",
                "_MINHASH_LOCAL_MAX_ROWS", MINHASH_SIZES, "docs"),
    "pq": ("embedding_pq_codes", "elevate_data_pipeline_spark.operators.similarity",
           "_PQ_LOCAL_MAX_ROWS", EMB_SIZES, "emb"),
    "lloyd": ("embedding_cluster_purity", "elevate_data_pipeline_spark.operators.cluster",
              "_LLOYD_LOCAL_MAX_ROWS", EMB_SIZES, "emb"),
    "pagerank": (None, "elevate_data_pipeline_spark.operators.graph",
                 "_PAGERANK_LOCAL_MAX_EDGES", EDGE_SIZES, "edges"),
}


def docs_dir(n: int) -> str:
    return os.path.join(BASE, f"docs_{n}")


def emb_dir(n: int) -> str:
    return os.path.join(BASE, f"emb_{n}")


def gen() -> None:
    """Deterministic corpora, one parquet dir per size (the footer gate
    counts rows per directory)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(BASE, exist_ok=True)
    nmax = max(max(DOC_SIZES), max(SNM_SIZES), max(MINHASH_SIZES))
    rng = np.random.default_rng(4242)
    lens = rng.integers(10, 101, size=nmax)
    # 30 uniform words + rare 'dup' (~0.1% of tokens, as in testdata)
    texts = []
    for L in lens:
        idx = rng.integers(0, 30, size=L)
        words = [VOCAB[i] for i in idx]
        if rng.random() < 0.05:
            words[int(rng.integers(0, L))] = "dup"
        texts.append(" ".join(words))
    langs = rng.choice(LANGS, size=nmax, p=LANG_W)
    srcs = [f"src{int(i)}" for i in rng.integers(0, 20, size=nmax)]
    for n in sorted(set(DOC_SIZES + SNM_SIZES + MINHASH_SIZES)):
        d = docs_dir(n)
        if os.path.isdir(d) and os.listdir(d):
            continue
        os.makedirs(d, exist_ok=True)
        tbl = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": texts[:n],
            "lang": langs[:n].tolist(),
            "source": srcs[:n],
            "n_chars": pa.array([len(t) for t in texts[:n]], pa.int64()),
        })
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        print("wrote", d, n)

    # gaussian-mixture embeddings (8 centers, dim 64, float32 — the
    # testdata embeddings shape)
    dim, k = 64, 8
    centers = rng.normal(0, 1, size=(k, dim))
    nmax = max(EMB_SIZES)
    lbl = rng.integers(0, k, size=nmax)
    vecs = (centers[lbl] + rng.normal(0, 0.3, size=(nmax, dim))).astype(np.float32)
    for n in EMB_SIZES:
        d = emb_dir(n)
        if os.path.isdir(d) and os.listdir(d):
            continue
        os.makedirs(d, exist_ok=True)
        tbl = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs[:n]],
                                  pa.list_(pa.float32())),
            "label": pa.array(lbl[:n].tolist(), pa.int32()),
        })
        pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
        print("wrote", d, n)


def _gate(mod_path: str, attr: str, value: int):
    import importlib

    mod = importlib.import_module(mod_path)
    old = getattr(mod, attr)
    setattr(mod, attr, value)
    return mod, attr, old


def _noop_time(build) -> float:
    """Times query CONSTRUCTION + noop write: the local tiers do their
    Python work eagerly while building the frame, so the builder must
    run inside the timer."""
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _median_time(fn, runs: int | None = None) -> list[float]:
    runs = runs or int(os.environ.get("TIER_CROSSOVER_RUNS", "3"))
    xs = [fn() for _ in range(runs)]
    return sorted(round(x, 2) for x in xs)


def bench(families: list[str]) -> None:
    from elevate_data_pipeline_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("tier-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    os.makedirs(BASE, exist_ok=True)
    out = open(STATE, "a")

    for fam in families:
        sizes_override, tier_only = None, None
        if ":" in fam:  # e.g. bloom:10000,20000[:distributed]
            parts = fam.split(":")
            fam = parts[0]
            if parts[1]:
                sizes_override = [int(x) for x in parts[1].split(",")]
            if len(parts) > 2:
                tier_only = parts[2]
        qname, mod_path, attr, sizes, kind = FAMILIES[fam]
        sizes = sizes_override or sizes
        for n in sizes:
            if kind == "edges":
                rec = _bench_pagerank(spark, n, mod_path, attr)
                out.write(json.dumps(rec) + "\n")
                out.flush()
                print(rec, flush=True)
                continue
            sf_dir = docs_dir(n) if kind == "docs" else emb_dir(n)
            for tier, gate_val in (("local", 1 << 40), ("distributed", -1)):
                if tier_only and tier != tier_only:
                    continue
                mod, a, old = _gate(mod_path, attr, gate_val)
                try:
                    qs[qname](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()  # warm
                    ts = _median_time(
                        lambda: _noop_time(lambda: qs[qname](spark, sf_dir))
                    )
                except Exception as exc:  # record rather than die mid-sweep
                    ts = [-1.0]
                    print(f"{fam} {n} {tier} ERROR: {exc}", flush=True)
                finally:
                    setattr(mod, a, old)
                rec = {"family": fam, "query": qname, "n": n, "tier": tier,
                       "median": ts[len(ts) // 2], "runs": ts}
                out.write(json.dumps(rec) + "\n")
                out.flush()
                print(rec, flush=True)
    out.close()


def _edges(spark, n: int):
    """Random graph: n edges over n/10 vertices, weight 1..5."""
    from pyspark.sql import functions as F

    nv = max(2, n // 10)
    return (
        spark.range(n)
        .select(
            (F.xxhash64("id") % nv).alias("src"),
            (F.xxhash64("id", F.lit(1)) % nv).alias("dst"),
            (F.abs(F.xxhash64("id", F.lit(2))) % 5 + 1).cast("long").alias("w"),
        )
        .select(F.abs("src").alias("src"), F.abs("dst").alias("dst"), "w")
    )


def _bench_pagerank(spark, n: int, mod_path: str, attr: str) -> dict:
    """graph.pagerank on a synthetic edge list (the registry's type
    graph can never exceed ~100 edges, so the 1M-edge gate is benched
    at the operator level)."""
    from elevate_data_pipeline_spark.operators import graph

    edges = _edges(spark, n).localCheckpoint()  # materialized input
    rec = {"family": "pagerank", "query": "graph.pagerank_fixed_point", "n": n}
    # the gate drives a limit(); 1<<40 overflows int32 there
    for tier, gate_val in (("local", 100_000_000), ("distributed", -1)):
        mod, a, old = _gate(mod_path, attr, gate_val)
        try:
            graph.pagerank_fixed_point(edges, n_iter=5).write.format(
                "noop"
            ).mode("overwrite").save()
            ts = _median_time(
                lambda: _noop_time(
                    lambda: graph.pagerank_fixed_point(edges, n_iter=5)
                )
            )
        except Exception as exc:
            ts = [-1.0]
            print(f"pagerank {n} {tier} ERROR: {exc}", flush=True)
        finally:
            setattr(mod, a, old)
        rec[tier] = ts[len(ts) // 2]
        rec[f"{tier}_runs"] = ts
    return rec


def verify(only: list[str] | None = None) -> int:
    """Correctness on the LARGEST corpus per family: DuckDB oracle for
    collectable outputs, Spark exceptAll bit-equality local-vs-dist
    for the rest."""
    from pyspark.sql import functions as F  # noqa: F401

    from elevate_data_pipeline_spark.session import get_spark
    from oracle_util import compare, duckdb_con

    import __spark_entry__ as entry

    spark = get_spark("tier-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []

    # oracle-compare: modest outputs (one row per doc / per pair window)
    oracle_checks = [
        ("bloom", "decontam_bloom", docs_dir(max(DOC_SIZES))),
        # the block-dedup oracle is superlinear in DuckDB (32 s @ 20k,
        # ~30 min @ 150k) — oracle at 50k, exceptAll bit-equality at 150k
        ("pipelines", "pretraining_corpus", docs_dir(50_000)),
        ("snm", "dedup_sorted_neighborhood", docs_dir(max(SNM_SIZES))),
        ("minhash", "minhash_signature", docs_dir(max(MINHASH_SIZES))),
    ]
    if only:
        oracle_checks = [c for c in oracle_checks if c[0] in only]
    # duckdb_con registers every testdata table — symlink the ones the
    # corpus dirs don't carry from sf0.01
    for _, _, sf_dir in oracle_checks:
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            dst = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(dst):
                os.symlink(f"/root/testdata/sf0.01/{t}.parquet", dst)

    for fam, qname, sf_dir in oracle_checks:
        _, mod_path, attr, _, _ = FAMILIES[fam]
        for tier, gate_val in (("local", 1 << 40), ("distributed", -1)):
            mod, a, old = _gate(mod_path, attr, gate_val)
            try:
                con = duckdb_con(sf_dir)
                compare(qs[qname](spark, sf_dir), con, oracles[qname])
                print(f"oracle {qname} [{tier}] @ {sf_dir}: ok", flush=True)
            except Exception as exc:
                failures.append(f"{qname}[{tier}]: {exc}")
                print(f"oracle {qname} [{tier}]: FAIL {exc}", flush=True)
            finally:
                setattr(mod, a, old)

    # bit-equality local vs distributed for the big-output tiers
    eq_checks = [
        ("suffix", "dedup_suffix_array", docs_dir(max(DOC_SIZES))),
        ("spans", "dedup_substring_spans", docs_dir(max(DOC_SIZES))),
        ("pipelines", "pretraining_corpus", docs_dir(max(DOC_SIZES))),
    ]
    if only:
        eq_checks = [c for c in eq_checks if c[0] in only]
    for fam, qname, sf_dir in eq_checks:
        _, mod_path, attr, _, _ = FAMILIES[fam]
        mod, a, old = _gate(mod_path, attr, 1 << 40)
        try:
            loc = qs[qname](spark, sf_dir)
        finally:
            setattr(mod, a, old)
        mod, a, old = _gate(mod_path, attr, -1)
        try:
            dist = qs[qname](spark, sf_dir)
            d1 = loc.exceptAll(dist).count()
            d2 = dist.exceptAll(loc).count()
            ok = d1 == 0 and d2 == 0
            print(f"bit-equality {qname} @ {sf_dir}: "
                  f"{'ok' if ok else f'DIFF {d1}/{d2}'}", flush=True)
            if not ok:
                failures.append(f"{qname}: exceptAll {d1}/{d2}")
        finally:
            setattr(mod, a, old)
    print(f"\nverify: {len(failures)} failures")
    return 1 if failures else 0


def render() -> None:
    recs = [json.loads(ln) for ln in open(STATE)]
    # last record wins per (family, n, tier)
    tbl: dict = {}
    for r in recs:
        if r["family"] == "pagerank":
            tbl[("pagerank", r["n"], "local")] = r["local"]
            tbl[("pagerank", r["n"], "distributed")] = r["distributed"]
        else:
            tbl[(r["family"], r["n"], r["tier"])] = r["median"]
    lines = [
        "# Tier crossover — local tier vs distributed chain, measured",
        "",
        "Generated by `scripts/tier_crossover.py` (round-6 VERDICT task",
        "#2): synthetic corpora with the testdata generator distribution",
        "at sizes bracketing each gate in `docs/LOCAL_TIERS.md`, each",
        "tiered operator timed BOTH ways (gate forced huge vs forced -1),",
        "noop sink, warm session, median of 3 (single runs for the",
        "slowest above-gate points). `local` at sizes above a gate",
        "demonstrates the replay cost the gate avoids paying — in",
        "production only the distributed column exists there. The gate",
        "column is the LIVE module value: four gates were lowered to",
        "measured crossovers in round 7 (bloom 100k->5k, spans",
        "100k->50k, lloyd 100k->8k, pagerank 1M->500k), then round 8",
        "measured BELOW the spans/bloom gates (10k/20k/30k and",
        "2k/3k/4k, 3-run medians): spans moved 50k->10k (local wins",
        "at 10k, loses from 20k); bloom KEEPS 5k — the tie at its",
        "gate is proven noise both directions (synthetic corpus",
        "distributed +4%, REAL testdata local +5% in 5-run solo",
        "medians; full-sweep context local clearly cheaper — see",
        "docs/PERF_NOTES_r8.md).",
        "",
        "| family | gate | n | local s | distributed s | winner |",
        "|---|---|---|---|---|---|",
    ]
    import importlib

    for fam, (_, mod_path, attr, sizes, _) in FAMILIES.items():
        gate = getattr(importlib.import_module(mod_path), attr)
        fam_sizes = sorted({n for (f, n, _t) in tbl if f == fam})
        for n in fam_sizes:
            lo = tbl.get((fam, n, "local"))
            di = tbl.get((fam, n, "distributed"))
            if lo is None and di is None:
                continue
            if (lo is not None and lo < 0) or (di is not None and di < 0):
                continue
            win = "-"
            if lo is not None and di is not None and lo > 0 and di > 0:
                win = "local" if lo < di else "distributed"
            lines.append(
                f"| {fam} ({attr}) | {gate:,} | {n:,} | "
                f"{lo if lo is not None else '-'} | "
                f"{di if di is not None else '-'} | {win} |"
            )
    lines += [
        "",
        "## Correctness on the big corpora (`tier_crossover.py verify`)",
        "",
        "Both tiers of each family checked at the LARGEST corpus in its",
        "sweep — DuckDB oracle compare (driver canonicalization) where",
        "the output is collectable, Spark `exceptAll` bit-equality",
        "local-vs-distributed where it is not:",
        "",
        "- `decontam_bloom` @ 150k docs: oracle-exact, both tiers",
        "- `pretraining_corpus` @ 50k docs: oracle-exact, both tiers",
        "  (the block-dedup oracle is superlinear in DuckDB — 32 s at",
        "  20k, ~30 min at 150k); @ 150k docs: exceptAll bit-equality",
        "  local == distributed",
        "- `dedup_sorted_neighborhood` @ 20k docs: oracle-exact, both tiers",
        "- `minhash_signature` @ 4k docs: oracle-exact, both tiers",
        "- `dedup_suffix_array` @ 150k docs (8.1M positions): exceptAll",
        "  bit-equality local == distributed (outputs too large to",
        "  collect twice through the python oracle path)",
        "- `dedup_substring_spans` @ 150k docs: exceptAll bit-equality",
        "  local == distributed",
    ]
    out = os.path.join(ROOT, "docs", "TIER_CROSSOVER.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bench"
    if cmd in ("-h", "--help"):
        print(__doc__.strip())
        return 0
    if cmd == "gen":
        gen()
        return 0
    if cmd == "bench":
        fams = sys.argv[2:] or list(FAMILIES)
        bench(fams)
        return 0
    if cmd == "verify":
        return verify(sys.argv[2:] or None)
    if cmd == "render":
        render()
        return 0
    print(f"unknown command {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
