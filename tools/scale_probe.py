"""Empirical scaling probe: do the headline plans scale linearly?

Builds a 10× copy of the heavy tables (union of 10 shifted-key copies
of sf0.1, written to a temp dir under the repo), times a set of
shuffle-heavy queries at 1× and 10×, and writes SCALING.md with the
wall-clock ratios. A plan whose ratio is ≈10 (or below, thanks to
fixed overhead amortizing) scales linearly in data volume; a ratio
well above 10 means something super-linear crept in (pairwise blowup,
driver collect, unpartitioned window) and must be fixed.

Run: python tools/scale_probe.py      (takes ~2-4 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.catalog import TABLES, load_table  # noqa: E402
from bangumi_notion_data_integration_project_spark.queries import QUERIES  # noqa: E402
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = 10
# shuffle/agg/join/window-heavy queries whose input is the scaled tables
PROBED = [
    "category_summary",
    "revenue_by_nation",
    "merge_full_sync",
    "merge_partition_scoped",
    "order_top_parts",
    "dedup_latest_by_key",
    "events_sessionize",
    "events_zorder_stats",
    "running_revenue",
    "dedup_exact",
    "dedup_near_pipeline",
    "simhash_docs",
    "minhash_lsh_verified",
    "embedding_near_dup",
    "vocab_topk",
    "docs_dup_spans",
    "market_share",
    "customer_order_distribution",
    "waiting_suppliers",
    "events_max_concurrency",
    "parts_pagerank",
    "part_pairs_lift",
    "snapshot_diff_orders",
    "docs_bigram_counts",
    "embedding_pq_codes",
    "ann_pq_topk",
    "cdc_apply_orders",
    "lineitem_correlations",
    "events_top_paths",
    "customer_rfm",
    "events_ewma",
    "docs_frequent_tokens",
    "embedding_covariance",
    "supplier_wilson",
    "revenue_pareto",
    "events_markov",
    "dedup_keep_best",
    "orders_mad",
    "events_attribution_decay",
    "incremental_agg_cdc",
    # round 6: rollup refresh (calendar-bounded state), winnowing (one
    # ordered window per doc), cohort LTV (co-partitioned join), exact
    # order statistics, novelty join-back
    "events_time_rollup_refresh",
    "docs_winnowing",
    "orders_cohort_ltv",
    "supplier_lead_times",
    "lineitem_weighted_median",
    "events_user_quantiles",
    "docs_ngram_novelty",
    "segment_share_yoy",
    # round 7 batch: blocked linkage (vocab-bounded verify), TWAP
    # (ordered windows), endpoint backlog (O(days) fold), JVM-fold
    # debounce (10x longer per-key arrays), integer-moment outliers,
    # Heaps growth, fertility, grouped top-k, 2-D histogram, profile
    "fuzzy_name_blocking",
    "events_twap",
    "orders_running_backlog",
    "events_debounce",
    "events_seasonal_zscore",
    "docs_vocab_growth",
    "docs_tokenizer_fertility",
    "docs_lang_topk_tokens",
    "docs_quality_joint_hist",
    "orders_dow_profile",
    # round 7 second batch: KM steps + ACF + decomposition (all on
    # calendar/duration-bounded aggregates -> expect flat), PMI + Zipf
    # + JSD (token-count-bounded aggregates + TakeOrdered cuts),
    # interval-union coverage (one per-user window)
    "orders_survival_km",
    "revenue_acf",
    "orders_seasonal_decompose",
    "docs_pmi_collocations",
    "docs_zipf_fit",
    "docs_source_jsd",
    "events_user_coverage",
    # round 8 batch: PACF/Holt/runs/changepoint (all on the O(days)
    # daily aggregate -> expect flat), per-segment KM (duration-bounded
    # per group), RAKE (the posexplode run-split is the only new
    # token-scale window — per-doc partitions), branching entropy
    # (vocab-bounded aggregates + TakeOrdered), grouped value sketch
    # (per-group bottom-k windows), HLL overlap (sketch algebra + one
    # user-level equi-join)
    "revenue_pacf",
    "revenue_holt",
    "revenue_runs_test",
    "orders_breakpoint_trend",
    "segment_churn_km",
    "docs_rake_keywords",
    "docs_branching_entropy",
    "events_value_quantiles_sketch",
    "events_type_overlap_sketch",
]
SCALED_TABLES = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def build_scaled(spark, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        t = f"{name}.parquet"
        src = load_table(spark, BASE, name)
        if name in SCALED_TABLES:
            key = SCALED_TABLES[name]
            offset = (src.agg(F.max(key)).first()[0] or 0) + 1
            copies = [
                src.withColumn(key, F.col(key) + F.lit(i * offset)) for i in range(MULT)
            ]
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
            scaled.write.mode("overwrite").parquet(os.path.join(out_dir, t))
        else:
            src.write.mode("overwrite").parquet(os.path.join(out_dir, t))


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in PROBED:
        # noop sink, NOT count(): under count() Catalyst prunes every
        # projected column, so signature/fingerprint queries measure
        # near-zero work (the bench learned this in round 2 — same
        # honesty rule here)
        def run():
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

        run()  # warm codegen for this plan
        t0 = time.perf_counter()
        run()
        out[name] = time.perf_counter() - t0
    return out


def main() -> None:
    spark = get_spark("scale_probe")
    scaled_dir = os.path.join(os.path.dirname(__file__), "..", "spark-warehouse", "_scaled10x")
    build_scaled(spark, scaled_dir)
    try:
        t1 = time_queries(spark, BASE)
        t10 = time_queries(spark, scaled_dir)
        lines = [
            "# SCALING — 1× vs 10× wall-clock (auto-generated)",
            "",
            f"`python tools/scale_probe.py`: heavy tables duplicated {MULT}× with",
            "shifted keys; each query timed warm (second run) at both scales.",
            "Ratio ≈ 10 → linear in data volume; < 10 → fixed overhead still",
            "amortizing; >> 10 → super-linear, fix the plan.",
            "",
            "| query | 1× sec | 10× sec | ratio |",
            "|---|---|---|---|",
        ]
        for name in PROBED:
            r = t10[name] / t1[name] if t1[name] > 0 else float("inf")
            lines.append(f"| {name} | {t1[name]:.2f} | {t10[name]:.2f} | {r:.1f}× |")
        lines += [
            "",
            "Interpretation note: the 10× corpus shifts KEYS but repeats",
            "BODIES, so every document text occurs 10× — true duplicate",
            "pairs grow ~quadratically per group (10 copies → 45 pairs).",
            "Dedup/near-dup queries (`dedup_near_pipeline`,",
            "`embedding_near_dup`, `minhash_lsh_verified`) therefore do",
            "legitimately super-linear OUTPUT work on this synthetic blowup;",
            "their ratios measure result-size growth, not a plan defect —",
            "on a real corpus the duplicate fraction stays roughly constant",
            "and these plans scale with it. `dedup_near_pipeline`'s",
            "wall-clock is driver-synced (iterative component rounds with",
            "eager checkpoints), so its absolute numbers vary ~2×",
            "run-to-run.",
        ]
        md_path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
        # preserve hand-written / sibling-tool sections ("## ..." blocks:
        # the dot-product bench, the window-family skew probe) across
        # regenerations of the main table
        extra = ""
        if os.path.exists(md_path):
            with open(md_path) as f:
                prev = f.read()
            idx = prev.find("\n## ")
            if idx >= 0:
                extra = prev[idx:]
        with open(md_path, "w") as f:
            f.write("\n".join(lines) + "\n" + extra)
        print("\n".join(lines))
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
