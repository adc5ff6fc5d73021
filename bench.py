"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE compact JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "n_queries": N, "total_wall": sec, "queries": {name: warm_sec},
"sf": ...}. The per-query breakdown (warm + first-run times) is also
written to BENCH_LOCAL.json and BENCH_LOCAL_c{cpus}.json.

Each query is executed into the ``noop`` sink: every output column is
fully materialized on the executors (unlike ``count()``, which lets
Catalyst prune projected columns — a fingerprint/simhash query "costs"
milliseconds under count() because the signature column is never
computed), with no driver transfer. Row counts come from a cheap
second pass so the reported number still sanity-checks output size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bangumi_notion_data_integration_project_spark.queries import QUERIES  # noqa: E402
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward the heavy ones.
BENCH_QUERIES = [
    "category_summary",
    "global_summary",
    "rollup_summary",
    "order_top_parts",
    "top_parts_per_brand",
    "merge_full_sync",
    "merge_upsert",
    "dedup_latest_by_key",
    "text_token_stats",
    "text_quality",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_bow",
    "similarity_bruteforce",
    "events_sessionize",
    "event_window_agg",
    "revenue_by_nation",
    "filtered_revenue",
    "orders_cube",
    "jaccard_top_pairs",
    "multimodal_features",
    "ann_lsh_topk",
    "orders_asof_join",
    "purchases_after_click",
    "salted_skew_join",
    "price_percentiles",
    "summary_grouping_sets",
    "running_revenue",
    "docs_hash_sample",
    "docs_pack_bins",
    "docs_quality_bins",
    "vocab_topk",
    "dq_report",
    "dedup_components",
    "docs_tfidf_topk",
    "events_retention",
    "orders_scd2",
    "events_zorder_stats",
    "dedup_near_pipeline",
    "parts_skyline",
    "incremental_agg_merge",
    "video_frame_sample",
    "image_resize",
    "text_lang_id",
    "simhash_docs",
    "docs_filter_pipeline",
    "volume_shipping",
    "promo_revenue",
    "large_volume_customers",
    "embedding_near_dup",
    "docs_dup_spans",
    "market_share",
    "min_cost_supplier",
    "customer_order_distribution",
    "waiting_suppliers",
    "events_session_window",
    "docs_chunks",
    "minhash_lsh_verified",
    "merge_partition_scoped",
    "audio_segments",
    "embedding_kmeans",
    "parts_pagerank",
    "events_max_concurrency",
    "snapshot_diff_orders",
    "docs_bigram_counts",
    "events_funnel_steps",
    "embedding_pq_codes",
    "ann_pq_topk",
    "events_conversion_lag",
    "decontaminate_bloom",
    "docs_line_scrub",
    "docs_bm25_topk",
    "events_attribution",
    "parts_triangles",
    "cdc_apply_orders",
    "lineitem_regression",
    "lineitem_correlations",
    "events_top_paths",
    "customer_rfm",
    "parts_kcore",
    "orders_benford",
    "events_ewma",
    "docs_frequent_tokens",
    "embedding_covariance",
    "embedding_pca_variance",
    "orders_window_battery",
    "customer_set_ops",
    "orders_scd2_asof",
    "dedup_keep_best",
    "supplier_wilson",
    "revenue_pareto",
    "events_markov",
    "revenue_gini",
    "docs_lang_confusion",
    "orders_seasonal",
    "incremental_agg_cdc",
    "orders_mad",
    "docs_curriculum",
    "events_attribution_decay",
    "events_freshness",
    "brand_concentration",
    "events_inter_arrival",
    "docs_setsim_prefix",
    "docs_containment",
    "events_cusum",
    "events_time_rollup",
    "events_sequence_rules",
    "brand_monthly_trend",
    "docs_bigram_logprob",
    "docs_bpe_merges",
    "events_time_rollup_refresh",
    "docs_bpe_merges_batched",
    "embedding_near_dup_topk",
    "orders_cohort_ltv",
    "supplier_lead_times",
    "docs_token_coverage",
    "docs_winnowing",
    "orders_chi2_cells",
    "segment_share_yoy",
    "lineitem_weighted_median",
    "events_user_quantiles",
    "orders_gap_stats",
    "docs_ngram_novelty",
    "fuzzy_name_blocking",
    "events_twap",
    "orders_dow_profile",
    "docs_quality_joint_hist",
    "docs_lang_topk_tokens",
    "orders_running_backlog",
    "docs_tokenizer_fertility",
    "events_seasonal_zscore",
    "docs_vocab_growth",
    "events_debounce",
    # round-7 additions
    "lineitem_quantile_sketch",
    "lineitem_sketch_merge",
    "events_weekly_users_sketch",
    "orders_survival_km",
    "revenue_acf",
    "docs_pmi_collocations",
    "docs_zipf_fit",
    "events_user_coverage",
    "orders_seasonal_decompose",
    "docs_source_jsd",
    # round-8 additions
    "revenue_pacf",
    "revenue_holt",
    "revenue_runs_test",
    "orders_breakpoint_trend",
    "segment_churn_km",
    "docs_rake_keywords",
    "docs_branching_entropy",
    "events_value_quantiles_sketch",
    "events_type_overlap_sketch",
    # round-8 coverage sweep: every registry entry with a distinct
    # execution path is benched (tests/test_bench_coverage.py enforces
    # registry ⊆ BENCH_QUERIES ∪ BENCH_SKIP from here on)
    "minhash_lsh_pairs",
    "sketch_distinct_counts",
    "ann_lsh_recall",
    "ann_ivf_topk",
    "ann_ivf_recall",
    "ann_pq_recall",
    "events_funnel",
    "events_gap_fill",
    "events_anomaly",
    "events_max_concurrency_2p",
    "event_sliding_window",
    "latest_event_per_type",
    "part_pairs_lift",
    "embedding_quantize_stats",
    "embedding_norms",
    "embedding_dup_pairs",
    "top_parts_salted",
    "supplier_part_variety",
    "excess_share_suppliers",
    "suppliers_per_region",
    "docs_length_histogram",
    "customer_balance_ranks",
    "docs_train_test_split",
    "docs_epoch_shuffle",
    "docs_temperature_mix",
    "docs_weighted_sample",
    "docs_stratified_sample",
    "docs_mixture_weights",
    "docs_group_quota",
    "docs_repetition",
    "docs_char_entropy",
    "docs_unigram_logprob",
    "docs_pii_scrub",
    "text_bpe_tokens",
    "decontaminate_overlap",
    "name_edit_distance",
    "merge_updates",
    "union_all_counts",
    "pivot_status",
    "orders_above_cust_avg",
    "customers_without_orders",
    "lineitem_unpivot",
    "orders_top_unshipped",
    "orders_price_histogram",
    "product_profit",
    "returned_top_customers",
    "brand_disc_revenue",
    "top_revenue_suppliers",
    "small_qty_revenue",
    "idle_rich_customers",
    "important_parts",
    "late_shipment_priority",
    # round-9 batch (registered for the r10 window)
    "docs_textrank_keywords",
    "docs_textrank_phrases",
    "orders_price_psi",
    "revenue_hampel_outliers",
    "events_user_overlap_setsketch",
    "segment_holt",
    "events_type_breakpoint",
    "events_conversion_km",
    # round-10 batch (registered for the r11 window)
    "revenue_mann_kendall",
    "orders_seasonal_mk",
    "revenue_sen_trend",
    "revenue_ship_ccf",
    "events_type_psi",
    "events_type_hampel",
    "lineitem_ols2",
    "events_type_mk",
    "events_markov_entropy",
    "parts_freq_cms",
    "orders_price_psi_sketch",
    # r11-registered (the r12 driver batch): drift-significance playbook
    "orders_price_mwu",
    "orders_price_ks",
    "events_type_mwu",
    "events_type_ks",
    "revenue_kendall_tau",
    "revenue_spearman",
    "revenue_pettitt",
    "segment_mk_bh",
    "lineitem_returns_ztest",
    "revenue_trimmed_mean",
    # r12-registered (the r13 driver batch): magnitude + omnibus rungs
    "orders_price_w1",
    "orders_price_cvm",
    "orders_price_mood",
    "events_type_kw",
    "events_type_w1",
    "segment_returns_ztest",
    "segment_trimmed_mean",
    # r13-registered (the r14 driver batch): post-hoc / dispersion /
    # ordered-trend / categorical-mix + grouped rank correlation
    "events_type_dunn",
    "orders_price_ab",
    "events_type_jt",
    "events_mix_chi2",
    "events_mix_shares",
    "events_type_pettitt",
    "segment_kendall",
    "segment_spearman",
]

# Registry entries intentionally NOT benched (coverage is enforced by
# tests/test_bench_coverage.py: every QUERIES key must appear in
# BENCH_QUERIES or here, with a reason). Only trivial per-row
# projections with no shuffle, strict subsets of a benched composite,
# or the warmup query belong here.
BENCH_SKIP: dict[str, str] = {
    "project_truncate": "two-column projection + truncate, no shuffle",
    "filter_nonempty": "single per-row filter projection, no shuffle",
    "timestamp_parse": "per-row timestamp-cast projection, no shuffle",
    "json_extract": "per-row from_json projection, no shuffle",
    "map_multikey": "per-row map-coalesce projection, no shuffle",
    "token_pivot": "per-row positional pivot projection, no shuffle",
    "coalesce_display": "per-row scalar coalesce projection, no shuffle",
    "merge_inserts": "one anti-join; strict subset of benched merge_full_sync",
    "merge_deletes": "one anti-join; strict subset of benched merge_full_sync",
    "cross_join_dims": "tiny-dim broadcast cross join, output bounded by dims",
    "order_priority_counts": "the bench warmup query, deliberately untimed",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    # A 200+-query sweep compiles ~1.5k whole-stage classes; the 100-
    # entry default cache recompiles on every pass-2 visit (+20% whole-
    # bench, diagnosed r9 — SCALING.md "Bench notes"). get_spark sizes
    # it, but getActiveSession() can hand back a FOREIGN session (a
    # future harness change that builds its own) — fail loud rather
    # than silently re-paying the regression.
    cache_entries = int(
        spark.conf.get("spark.sql.codegen.cache.maxEntries", "100")
    )
    assert cache_entries >= 1000, (
        f"bench session has spark.sql.codegen.cache.maxEntries="
        f"{cache_entries} (< 1000): a foreign SparkSession is active and"
        " the whole-bench numbers would regress ~20% from codegen-cache"
        " thrash — size the cache to the workload (session.py does)"
    )
    timings: dict[str, float] = {}

    # Warm the JVM, parquet footers, the noop-sink write path, and the
    # Python/Arrow workers so the first measured slot doesn't pay
    # one-time process-startup costs (daemon fork, Arrow init, committer
    # classloading) that a long-lived cluster pays once, not per-query.
    # The warmup query is OUTSIDE the timed set and runs through the
    # same noop sink as the measured queries — warming with count()
    # left the first timed slot absorbing the sink's first-use cost.
    QUERIES["order_priority_counts"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    # Two timed passes per query: the r5 driver artifact charged a
    # 1.6 s-warm query 5.0 s because its slot landed on a cold stretch
    # (page cache / codegen cache churn from neighbouring queries). The
    # reported per-query number is min(pass1, pass2) — the steady-state
    # cost a long-lived cluster pays — while total_wall keeps the honest
    # end-to-end wall including both passes.
    cold: dict[str, float] = {}
    wall_t0 = time.perf_counter()
    for pass_no in (1, 2):
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            if pass_no == 1:
                cold[name] = round(dt, 4)
                n = QUERIES[name](spark, sf_dir).count()  # untimed row sanity
                print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
            else:
                timings[name] = round(min(cold[name], dt), 4)
                print(f"# {name}: warm {dt:.3f}s", file=sys.stderr)
    total_wall = time.perf_counter() - wall_t0

    total = sum(timings.values())
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Metric renamed r7: "value" is the sum of per-query min(pass1,
    # pass2) WARM times (two-pass protocol since r6); honest end-to-end
    # time is "total_wall". Pre-r6 artifacts used a single cold pass
    # under the old key "headline_queries_total_wall" — not comparable.
    payload = {
        "metric": "headline_queries_total_warm",
        "value": round(total, 4),
        "unit": "sec",
        "n_queries": len(timings),
        "total_wall": round(total_wall, 4),
        # The per-query warm map rides in the printed line so the
        # driver's PERF artifact gets per_query/scaling tables for every
        # run (r13's summary-only line left PERF_r13.per_query empty;
        # the map is one ~8 KB line — the r4 truncation was many
        # per-query stderr lines, not a single compact JSON line).
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Durable full payload: per-query warm + first-pass times also live
    # in BENCH_LOCAL_c{cpus}.json (per core count, so a second driver
    # run at a lower core count no longer overwrites the local[32]
    # breakdown) and the legacy BENCH_LOCAL.json path.
    here = os.path.dirname(os.path.abspath(__file__))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    full = json.dumps({**payload, "queries_first_run": cold}) + "\n"
    for fname in ("BENCH_LOCAL.json", f"BENCH_LOCAL_c{cpus}.json"):
        with open(os.path.join(here, fname), "w") as fh:
            fh.write(full)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
