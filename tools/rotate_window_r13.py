"""One-shot r13 window rotation for the QUERIES dict in queries.py.

Reorders the dict entries for the round-13 driver window:
  positions 1-7  : the 7 never-driver-checked r13-batch queries
  positions 8-50 : the 43 STALEST r8-vintage rows (registry order)
  boundary comment at position 50 with the r14 rotation note
  then: the r14 batch (registered this round, never driver-checked),
  the displaced r12 window (prior relative order), then the rest of
  the registry (prior relative order) minus rows moved forward.

CORRECTION vs the r12 boundary note: that note (and VERDICT r12 item
1) said "the 19 remaining r8 rows (docs_zipf_fit .. docs_frequent_
tokens)" then 24 r9 rows — a miscount. tools/vintage_report.py (the
artifact-recomputed ground truth, which VERDICT r12's own histogram
agrees with: "44×r8") shows 44 rows whose LATEST driver row is r8:
the 19 r8-FIRST-EXPOSURE rows plus 25 older rows re-checked at r8.
Rotating r9 rows in while 25 r8 rows sat stale would violate the
stalest-first rule the window exists for, so r13 takes the 43
stalest r8 rows (all but embedding_kmeans, the last in registry
order) and leaves r9 untouched for r14.
"""
from __future__ import annotations

import re

PATH = "bangumi_notion_data_integration_project_spark/queries.py"

R13_BATCH = [
    "orders_price_w1", "orders_price_cvm", "orders_price_mood",
    "events_type_kw", "events_type_w1", "segment_returns_ztest",
    "segment_trimmed_mean",
]
# the 43 stalest latest-row-r8 entries, registry order (vintage_report)
R8_ROWS = [
    "docs_zipf_fit", "events_user_coverage", "orders_seasonal_decompose",
    "docs_source_jsd", "minhash_lsh_pairs", "simhash_docs",
    "sketch_distinct_counts", "dedup_near_pipeline", "docs_tfidf_topk",
    "minhash_lsh_verified", "embedding_pca_variance",
    "orders_window_battery", "orders_scd2_asof", "dedup_keep_best",
    "supplier_wilson", "revenue_pareto", "orders_benford", "events_ewma",
    "docs_frequent_tokens", "similarity_bruteforce", "ann_lsh_topk",
    "ann_ivf_topk", "events_max_concurrency", "events_funnel",
    "events_conversion_lag", "events_gap_fill", "events_anomaly",
    "snapshot_diff_orders", "parts_pagerank", "part_pairs_lift",
    "embedding_quantize_stats", "ann_pq_topk", "decontaminate_bloom",
    "docs_line_scrub", "docs_bm25_topk", "events_attribution",
    "parts_triangles", "cdc_apply_orders", "lineitem_regression",
    "events_top_paths", "customer_rfm", "parts_kcore", "top_parts_salted",
]
# prior window (the r12-checked 50), prior relative order
R12_WINDOW = [
    "orders_price_mwu", "orders_price_ks", "events_type_mwu",
    "events_type_ks", "revenue_kendall_tau", "revenue_spearman",
    "revenue_pettitt", "segment_mk_bh", "lineitem_returns_ztest",
    "revenue_trimmed_mean",
    "events_twap", "orders_dow_profile", "docs_quality_joint_hist",
    "docs_lang_topk_tokens", "orders_running_backlog",
    "docs_tokenizer_fertility", "events_seasonal_zscore",
    "docs_vocab_growth", "events_debounce", "customer_order_distribution",
    "supplier_part_variety", "excess_share_suppliers", "waiting_suppliers",
    "docs_dup_spans", "docs_length_histogram", "docs_chunks",
    "customer_balance_ranks", "events_session_window",
    "events_zorder_stats", "events_sessionize", "docs_train_test_split",
    "dq_report", "merge_partition_scoped", "docs_epoch_shuffle",
    "audio_segments", "docs_temperature_mix", "docs_filter_pipeline",
    "jaccard_top_pairs", "multimodal_features", "event_window_agg",
    "pivot_status", "rollup_summary", "order_top_parts",
    "top_parts_per_brand",
    "lineitem_quantile_sketch", "lineitem_sketch_merge",
    "events_weekly_users_sketch", "orders_survival_km", "revenue_acf",
    "docs_pmi_collocations",
]

BOUNDARY = """\
    # --------- driver checked-window boundary (position 50) ---------
    # ROUND-14 ROTATION NOTE: after r13 lands, the stalest evidence
    # is embedding_kmeans (the ONE remaining latest-row-r8 entry; the
    # r12 note's "19 remaining r8 rows" was a miscount — vintage_
    # report.py shows 44, r13 re-checked 43), then the 50 r9 rows
    # (revenue_pacf .. ann_ivf_recall, registry order). Rotate
    # the r14 window onto the r14 batch just below this comment
    # (positions 51+, never driver-checked) + embedding_kmeans + the
    # stalest r9 rows up to the 50 budget. The flagship/parity family
    # (category_summary, global_summary, P/J/M anchors) carries r11
    # rows and must re-enter the window by r15 (never-age-past-4) —
    # plan r15 = remaining r9 + those anchors first among refreshes.
    # Do NOT register more new queries than the window budget (~10)
    # per round.
"""

HEAD_COMMENTS = {
    "orders_price_w1": """\
    # -- the 7 r13-batch queries (registered r12, never
    # -- driver-checked — new queries outrank every refresh, the
    # -- standing rotation rule): the drift playbook's magnitude +
    # -- omnibus rungs — W1/CvM/Mood on the order-price era split,
    # -- the Kruskal-Wallis omnibus over event types, grouped W1 per
    # -- type, segment-grain return-rate z + trimmed daily revenue
""",
    "docs_zipf_fit": """\
    # -- the 43 stalest latest-row-r8 entries (registry order; all
    # -- of the r8 vintage except embedding_kmeans, which r14 takes
    # -- — see the boundary-note correction)
""",
    "orders_price_mwu": """\
    # -- displaced r12 window (10 r12-batch + 34 retired-r7 + 6 r8
    # -- sketch/survival rows), every row green in its latest driver
    # -- round, prior order preserved
""",
    "revenue_mann_kendall": """\
    # -- remainder of the registry, prior order preserved
""",
}

src = open(PATH).read()
m = re.search(
    r"^QUERIES: dict\[str, Callable\[\[SparkSession, str\], DataFrame\]\] = \{\n(.*?)^\}\n",
    src, re.S | re.M)
assert m, "QUERIES dict not found"
body = m.group(1)
entries = re.findall(r'^    "([A-Za-z0-9_]+)": (q_[A-Za-z0-9_]+),$', body, re.M)
names = [n for n, _ in entries]
funcs = dict(entries)
assert len(names) == 251, f"expected 251 entries, got {len(names)}"

window = R13_BATCH + R8_ROWS
assert len(window) == 50, len(window)
moved = set(window) | set(R12_WINDOW)
rest = [n for n in names if n not in moved]
new_order = window + R12_WINDOW + rest
assert len(new_order) == 251 and len(set(new_order)) == 251
assert sorted(new_order) == sorted(names)

out = []
for i, n in enumerate(new_order):
    if n in HEAD_COMMENTS:
        out.append(HEAD_COMMENTS[n])
    if i == 50:
        out.append(BOUNDARY)
    out.append(f'    "{n}": {funcs[n]},\n')
new_body = "".join(out)
new_src = src[: m.start(1)] + new_body + src[m.end(1):]
open(PATH, "w").write(new_src)
print("rotated: window head =", new_order[:3], "... pos50 =", new_order[49])
print("pos51 (first displaced) =", new_order[50])
