"""Skewed-data stress bench: Zipf-keyed events + hot-template documents.

The driver's TPC-H-ish data is uniform by construction, so AQE skew
handling and the engine's salting/sort-based shapes are never stressed
at bench scale. This script builds a SKEWED variant of the sf dir in
/tmp (events.user_id remapped through a Zipf(2) inverse-CDF so ~35% of
events land on a handful of users; 30% of documents replaced by three
hot near-duplicate templates, creating giant dedup clusters), then
times the shuffle-heavy queries on BOTH dirs and writes the ratio table
to docs/SKEW_BENCH.md.

Pass/fail intent: no query > 2x its uniform-data time — the sort-based
(SNM), salted (skew_salted_*), and watermarked shapes are skew-immune
by construction; ratios near 1 are the evidence.

Usage: python scripts/skew_bench.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BENCH = [
    "events_sessionize",
    "events_hourly",
    "events_rollup",
    "events_heavy_hitters",
    "events_user_gaps",
    "skew_salted_agg",
    "skew_salted_join",
    "dedup_minhash_lsh",
    "dedup_exact",
    "dedup_sorted_neighborhood",
    "dedup_simhash",
    "text_stats",
]


def build_skew_dir(spark, sf_dir: str, out_dir: str) -> None:
    """Deterministic skewed twin of ``sf_dir``: events + documents
    rewritten, every other table symlinked."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "embeddings"):
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)

    ev_dst = os.path.join(out_dir, "events.parquet")
    if not os.path.exists(ev_dst):
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # Zipf(s=2) via inverse CDF: k = ceil(1/u) has P(K >= x) = 1/x,
        # so user 1 absorbs ~ half the remapped mass. rand(42) keeps the
        # dataset deterministic per build.
        zipf = F.least(
            F.ceil(F.lit(1.0) / (F.lit(1.0) - F.rand(42))), F.lit(100000)
        ).cast(dict(ev.dtypes)["user_id"])
        ev.withColumn("user_id", zipf).write.mode("overwrite").parquet(ev_dst)

    doc_dst = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(doc_dst):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        hot = F.concat(
            F.lit("hot template "), (F.col("doc_id") % 3).cast("string"),
            F.lit(" the quick brown fox jumps over the lazy dog and keeps "
                  "jumping because training data repeats itself endlessly "),
            (F.col("doc_id") % 7).cast("string"),
        )
        docs.withColumn(
            "text",
            F.when(F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 3, hot)
            .otherwise(F.col("text")),
        ).write.mode("overwrite").parquet(doc_dst)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewdata/sf0.1"

    from elevate_data_pipeline_spark.queries import QUERIES
    from elevate_data_pipeline_spark.session import get_spark

    spark = get_spark("edp-skew-bench")
    build_skew_dir(spark, sf_dir, out_dir)

    names = [n for n in BENCH if n in QUERIES]
    # codegen warmup on the small dir (identical plans)
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for n in names:
        try:
            QUERIES[n](spark, warm if os.path.isdir(warm) else sf_dir).collect()
        except Exception:
            pass

    def run(dirpath: str) -> dict[str, float]:
        out = {}
        for n in names:
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[n](spark, dirpath).collect()
                samples.append(time.perf_counter() - t0)
            out[n] = sorted(samples)[1]
        return out

    uni = run(sf_dir)
    skw = run(out_dir)

    doc = os.path.join(ROOT, "docs", "SKEW_BENCH.md")
    with open(doc, "w") as f:
        f.write(
            f"# Skew stress bench — {sf_dir} vs Zipf/hot-template twin\n\n"
            "events.user_id ~ Zipf(2) (one user absorbs ~half the remapped "
            "mass); 30% of documents collapsed onto 3 hot near-duplicate "
            "templates. Median of 3 warm runs per query per dataset.\n\n"
            "| query | uniform s | skewed s | ratio |\n|---|---|---|---|\n"
        )
        worst = 0.0
        for n in names:
            ratio = skw[n] / uni[n] if uni[n] else float("inf")
            worst = max(worst, ratio)
            f.write(f"| {n} | {uni[n]:.2f} | {skw[n]:.2f} | {ratio:.2f}x |\n")
        f.write(f"\nWorst ratio: **{worst:.2f}x** (target: <= 2x).\n")
    print(f"wrote {doc}; worst ratio "
          f"{max(skw[n] / uni[n] for n in names if uni[n]):.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
