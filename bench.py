"""Benchmark runner — one JSON line with per-query wall times.

Runs the headline queries from the registry at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elevate_data_pipeline_spark.session import get_spark
from elevate_data_pipeline_spark.queries import QUERIES

# Headline set: spec-engine pipelines + TPC-H-style + events rollup.
# Extended as new operator families land (dedup / similarity / text).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q18_large_orders",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q9_product_profit",
    "q22_idle_rich_customers",
    "orders_moving_avg",
    "events_user_gaps",
    "topk_orders_per_segment",
    "spec_fetchid_order_count",
    "spec_join_fold",
    "spec_nested_rollup",
    "spec_dynamic_agg_sum",
    "union_fold",
    "events_hourly",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_cosine_topk",
    "curation_pack_sequences",
    "skew_salted_agg",
    "events_asof_join",
    "events_range_join",
    "ann_lsh_topk",
    "text_winnowing",
    "q19_bracket_revenue",
    "events_cube",
    "set_retained_customers",
    "dedup_cc_clusters",
    "events_heavy_hitters",
    "events_pivot_types",
    "events_resample_hourly",
    "embedding_quantize_int8",
    "dedup_semantic_clusters",
    "curation_pipeline",
    "dedup_levenshtein",
    "text_repetition",
    "text_pii_scrub",
    "corpus_decontaminate",
    "customer_balance_deciles",
    "text_chunking",
    "mixture_weights",
    "dedup_incremental",
    "text_rarity",
    "events_scd2",
    "events_value_buckets",
    "text_tfidf_topterms",
    "text_dsir_score",
    "events_funnel",
    "orders_retention_cohorts",
    "customer_rfm",
    "events_user_features",
    "corpus_vocab",
    "dedup_substring_spans",
    "embedding_kmeans",
    "events_rolling_dau",
    "lineitem_zorder",
    "text_bigram_lm",
    "orders_snapshot_diff",
    "customer_abc_pareto",
    "events_anomaly_mad",
    "dedup_canonical_docs",
    "curation_domain_cap",
    "ann_hard_negatives",
    "events_type_pagerank",
    "compaction_plan",
    "text_quality_calibrated",
    "events_type_pagerank_conserving",
    "multimodal_decode",
    "multimodal_png_decode",
    "multimodal_jpeg_decode",
    "multimodal_gif_decode",
    "stream_sessionize_native",
    "corpus_block_dedup",
    "curation_shuffle",
    "pretraining_corpus",
    "bpe_merges",
    "bpe_encode",
    "bpe_fertility",
    "events_drift_score",
    "curation_count_sample",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q20_dominant_suppliers",
    "q21_sole_late_supplier",
    "text_bm25_topk",
    "text_inverted_postings",
    "decontam_semantic",
    "curation_systematic_sample",
    "corpus_diversity",
    "events_attribution",
    "events_interpolate_hourly",
    "events_trend_slope",
    "dedup_containment",
    "dedup_normalized",
    "multimodal_audio_features",
    "multimodal_video_decode",
    "mixture_epoch_plan",
    "basket_part_pairs",
    "sql_nation_revenue",
    "events_winsorized_stats",
    "events_rollup_incremental",
    "embedding_random_projection",
    "orders_merge_upsert",
    "orders_ivm_join_delta",
    "events_state_asof",
    "skew_salted_join",
    "events_ewma",
    "stream_state_twin",
    "stream_quota_twin",
    "basket_triangles",
    "basket_communities",
    "dedup_sorted_neighborhood",
    "embedding_pq_codes",
    "ann_pq_adc_topk",
    "ann_pq_recall",
    "ann_matryoshka_recall",
    "embedding_cluster_purity",
]


def shuffle_probe(spark) -> float:
    """Fixed shuffle-microbenchmark calibration probe: a deterministic
    range -> groupBy-agg -> join -> global-agg chain (one real shuffle
    + one broadcast join over 1.5M rows x 32 partitions), median of 3
    after its own warm lap. The value calibrates what THIS box's
    shuffle machinery costs right now: bench_last.json records it next
    to the medians, and tests/test_bench_guard.py scales its trip
    limits by (current probe / committed probe), so a box-generation
    flip (either direction) moves the guard instead of faking a
    regression or leaving the guard loose."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        a = spark.range(0, 1_500_000, 1, 32).select(
            (F.col("id") % 4096).alias("k"), (F.col("id") % 97).alias("v")
        )
        b = spark.range(0, 4096, 1, 8).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        (
            a.groupBy("k").agg(F.sum("v").alias("s"))
            .join(b, "k")
            .agg(F.sum(F.col("s") + F.col("w")).alias("t"))
            .collect()
        )
        return time.perf_counter() - t0

    once()  # the probe's own codegen/JIT is not the signal
    return round(sorted(once() for _ in range(3))[1], 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("edp-bench")
    # Keep the captured stdout/stderr tail a clean signal. BENCH_r08's
    # tail carried one end-of-run "ERROR DAGScheduler: Failed to update
    # accumulator ... (Unknown class) / attempted to access non-existent
    # accumulator" burst: a late task-completion event posting to an
    # accumulator the ContextCleaner had already weak-ref-GC'd after
    # ~800 collects / ~300k accumulators. It is advisory by design —
    # DAGScheduler.updateAccumulators catches and logs, never fails the
    # job — and a real failure still surfaces as a collect() exception
    # (rc != 0). Targeted reproduction failed (full 199-query sweep and
    # a 20x streaming-twin stress both clean), so the burst is a rare
    # session-lifetime race, not attributable to any query. r9 scoped
    # the whole DAGScheduler logger to FATAL; that also hid any REAL
    # scheduler error, so scope narrower: a message-level RegexFilter
    # that denies only the advisory accumulator burst and passes every
    # other DAGScheduler diagnostic through untouched.
    try:
        jvm = spark.sparkContext._jvm
        result = jvm.org.apache.logging.log4j.core.Filter.Result
        flt = jvm.org.apache.logging.log4j.core.filter.RegexFilter.createFilter(
            ".*(Failed to update accumulator"
            "|attempted to access non-existent accumulator).*",
            None, False, result.DENY, result.NEUTRAL,
        )
        ctx = jvm.org.apache.logging.log4j.LogManager.getContext(False)
        ctx.getConfiguration().addFilter(flt)
        # The unpartitioned-window WARN ("No Partition Defined for Window
        # operation") fires on the audited bounded feeders only — every
        # Exchange SinglePartition window in the repo is a structurally
        # bounded global-scalar/pid-offsets feeder with a named waiver in
        # scripts/plan_audit.py WAIVERS (CI-enforced by
        # tests/test_plan_audit.py), so the warning is advisory here;
        # scope the window-exec package to ERROR for the bench session so
        # the captured tail stays readable for real signals.
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # logging backend absent/renamed: bench must still run
    # FULL registry coverage: the headline set first (stable ordering for
    # round-over-round comparison), then every remaining registry query —
    # no silent caps; a query's sf0.1 Spark-side cost is recorded here or
    # nowhere. (Driver-gate oracles are separate; this times Spark only.)
    names = [n for n in HEADLINE if n in QUERIES]
    names += sorted(n for n in QUERIES if n not in HEADLINE)

    # Steady-state methodology: run every headline query once at sf0.001
    # first. The plans are identical (same schemas + expression trees), so
    # this populates the whole-stage-codegen cache, JIT-compiles the hot
    # generated classes, and forks the Python UDF workers — one-time
    # session costs a long-lived cluster amortizes to zero. The timed
    # numbers below then measure per-query THROUGHPUT at sf0.1, which is
    # the quantity that extrapolates to the 100 TB target (a cold q1 pays
    # ~25 s of Janino/C2 compile on the first decimal-agg ever run in the
    # JVM; that cost does not scale with data and would be misleading to
    # attribute to any one query).
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).collect()
        except Exception:
            pass
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(32).select(_warm("id")).collect()

    # Untimed per-INPUT priming at the timed scale: the sf0.001 warm pass
    # compiles the plans but does not touch the sf0.1 parquet files, so
    # in a single-shot (driver) context the first timed query over each
    # not-yet-read input also paid first-touch page-cache and
    # scale-specific AQE costs — BENCH_r10 recorded q1 at 6.77 s against
    # a 0.94 s steady-state median purely from running first, and after
    # r11 primed only the first 8 run-order queries, BENCH_r11 still
    # inflated later first-touch queries (dedup_minhash_lsh 4.38 s vs a
    # 1.05 s committed median that solo-replayed at 1.57 s). Touch every
    # table's every column once (count(col) must read values to count
    # nulls, forcing a full-column scan into the page cache) so no timed
    # query is the first reader of its input at this scale.
    from pyspark.sql import functions as F

    for fname in sorted(os.listdir(sf_dir)):
        if not fname.endswith(".parquet"):
            continue
        try:
            t = spark.read.parquet(os.path.join(sf_dir, fname))
            t.select([F.count(c) for c in t.columns]).collect()
        except Exception:
            pass
    # ...and still prime the first queries in run order at scale: the
    # input touch covers page cache, but the first timed query would
    # otherwise also pay its own scale-specific AQE re-plan cold.
    for name in names[:4]:
        try:
            QUERIES[name](spark, sf_dir).collect()
        except Exception:
            pass

    # Box-calibration probe (see shuffle_probe): recorded beside the
    # medians so the guard scales with the box instead of tripping on
    # hardware-generation drift.
    probe_sec = shuffle_probe(spark)

    # Median of 3 timed runs per query: single-shot numbers at this scale
    # are noisy enough to flag phantom regressions (GC pauses, page cache,
    # AQE re-plans) — the r2 bench showed 5x swings on queries whose plans
    # had not changed. The median is robust to one bad run either way.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 3)

    total = round(sum(times.values()), 3)
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "probe_sec": probe_sec,
    }
    # The full per-query map (~3.6 KB at 121 queries) exceeds the 2 000-char
    # stdout tail the driver captures, so it goes to bench_last.json only.
    # stdout gets ONE compact final line (< 1.5 KB guaranteed: slowest-20
    # queries, trimmed further if ever needed) that still satisfies the
    # {"metric", "value", "unit", "queries", "sf"} contract.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_last.json"), "w") as f:
        f.write(json.dumps(full) + "\n")

    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    keep = 20
    while keep > 1:
        compact = {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": dict(list(slowest.items())[:keep]),
            "sf": sf,
            "n_queries": len(times),
            "probe_sec": probe_sec,
            "full": "bench_last.json",
        }
        line = json.dumps(compact)
        if len(line) <= 1500:
            break
        keep -= 2
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
