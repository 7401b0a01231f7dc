"""Regenerate docs/PLANS.md: formatted physical plans of the headline
queries with the scale-relevant properties called out. Run from the repo
root: ``python scripts/dump_plans.py``."""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elevate_data_pipeline_spark.session import get_spark  # noqa: E402
from elevate_data_pipeline_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SHOWCASE = [
    ("q5_local_supplier_volume", "6-table join: dims broadcast, facts shuffle once"),
    ("spec_fetchid_order_count", "decorrelated fetchId: one scan per table, agg broadcast back"),
    ("spec_multi_agg_fused", "fused aggs extension: 3 aggregates, ONE scan+shuffle of orders"),
    ("q1_pricing_summary", "pushdown + pruned ReadSchema + partial aggregation"),
    ("dedup_minhash_lsh", "LSH: band-key self-join after Arrow-batched signatures"),
    ("dedup_ngram_jaccard", "PPJoin: prefix-filtered candidates, verify-only array intersects"),
    ("events_sessionize", "islands-and-gaps: single shuffle on user_id reused by window+groupBy"),
    ("q19_bracket_revenue", "OR-of-brackets: disjunction envelope pushed into both scans"),
    ("customer_balance_deciles", "exact ntile without a global window: range repartition + broadcast offsets"),
    ("corpus_decontaminate", "decontamination: benchmark gram set broadcast onto the corpus gram stream"),
    ("dedup_incremental", "incremental dedup: probe-vs-base band equi-join, no probe self-pairs"),
    ("mixture_weights", "temperature mixing: rates broadcast onto the corpus; only per-partition partial counts reach the exchange"),
    ("text_dsir_score", "DSIR importance weights: bucket counts fold to B=1024 rows, the weight table broadcasts back onto the gram stream"),
    ("events_funnel", "ordered funnel: every stage keys on user_id, stage filters pushed to each events scan"),
    ("corpus_block_dedup", "C4 segment dedup: one block-key shuffle, boilerplate set joined back (AQE-broadcastable), per-doc bounded reconstruction"),
    ("dedup_canonical_docs", "canonical survivors: cc member map splits the corpus via semi/anti join; only cluster members reach a window"),
    ("events_drift_score", "drift TVD: pinned bucket frame, single conditional-sum scan, integer cross-multiplication"),
    ("bpe_merges", "BPE training round: vocab pair-count shuffle + TakeOrdered top-1 + broadcast replace merge"),
    ("pretraining_corpus", "flagship composition: strip -> gates -> canonical -> shuffle/shard in one plan"),
    ("q21_sole_late_supplier", "EXISTS + NOT-EXISTS self-join as ONE grouped pass; per-order rollup reuses the l_orderkey partitioning"),
    ("text_bm25_topk", "BM25: query-term filter inside the explode, |query|-row df broadcast, TakeOrdered top-k"),
    ("curation_systematic_sample", "weighted systematic sample: range-partitioned cumsum + broadcast 1-row total, scan-level threshold filter"),
    ("dedup_containment", "one-sided PPJoin: contained-side prefix vs full postings, verify-only intersects"),
    ("events_interpolate_hourly", "linear gap interpolation: series-partitioned carries over the broadcast-built grid"),
    ("orders_merge_upsert", "MERGE INTO: one full-outer key join, delete/update/insert resolved in a single projection"),
    ("events_state_asof", "changelog time travel: max-struct aggregate, no window; bounds frame broadcasts"),
    ("skew_salted_join", "manual skew split: 8-way salted fact vs exploded dim, shuffled-hash join on (key, salt)"),
    ("basket_triangles", "degree-ordered triangle census: wedges charged to the lowest-degree vertex"),
    ("ann_pq_adc_topk", "PQ ADC search: broadcast codebooks + per-query lookup tables, 4-int corpus scan"),
    ("dedup_sorted_neighborhood", "SNM blocking: range-partitioned global rank, exploded-offset window equi-join, verify-only intersects"),
    ("basket_communities", "label propagation: per-round node-keyed join + (node,label) aggregate, pinned labels"),
    ("orders_ivm_join_delta", "incremental join maintenance: three delta-term joins, AQE broadcasts the delta sides"),
    ("multimodal_png_decode", "PNG decode: pruned 2-column scan into one MapInPandas stage, no shuffle"),
    ("sketch_hll_portable", "portable HLL: register partial-agg (<=512 keys/group), one IEEE division, exact join to countDistinct"),
    ("sketch_kmv_overlap", "KMV set algebra: kept-hash frames re-ranked per type pair, all-integer estimates, broadcast joins"),
    ("sketch_cms_counts", "count-min: w*d-capped counter shuffle, 4 KB sketch broadcast onto the probes"),
    ("decontam_bloom", "Bloom decontamination: 32 KB bit set broadcast, gram stream probed without materializing the benchmark strings"),
    ("multimodal_ahash_neardup", "image near-dup: decode->aHash in MapInPandas, band-key equi-join, bit_count verify"),
]


def plan_of(name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # strip the per-run attribute ids (#123L) so diffs stay reviewable
    return re.sub(r"#\d+L?", "#x", text)


if __name__ == "__main__":
    spark = get_spark("plans")
    out = [
        "# Physical plans of the headline queries",
        "",
        f"Generated by `scripts/dump_plans.py` at {SF_DIR} "
        "(attribute ids normalized). What to look for: `PushedFilters` and a "
        "narrow `ReadSchema` on every scan, `BroadcastHashJoin` for "
        "dimension-sized sides, one `Exchange` per aggregate keyed on its "
        "group column, no nested-loop joins anywhere.",
        "",
    ]
    for name, why in SHOWCASE:
        out.append(f"## {name}")
        out.append("")
        out.append(f"*{why}*")
        out.append("")
        out.append("```")
        out.append(plan_of(name).rstrip())
        out.append("```")
        out.append("")
    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote docs/PLANS.md")
