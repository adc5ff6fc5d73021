"""One-shot r14 window rotation for the QUERIES dict in queries.py.

Prepared at the END of round 13 (the boundary note made executable),
to be RUN AT THE START OF ROUND 14 after the r13 driver artifacts
land. Reorders the dict entries for the round-14 driver window:
  positions 1-8  : the 8 never-driver-checked r14-batch queries
  position  9    : embedding_kmeans (the ONE remaining latest-row-r8
                   entry after the r13 rotation re-checked 43 of 44)
  positions 10-50: the 41 stalest latest-row-r9 rows (registry order)
  boundary comment at position 50 with the r15 rotation note
  then: any round-14 registrations (never driver-checked, directly
  below the boundary), the displaced r13 window (prior relative
  order), then the rest of the registry (prior relative order).

Leaves for r15: the 9 remaining r9 rows (orders_price_histogram,
doc_fingerprint,
embedding_norms, orders_cube, running_revenue, latest_event_per_type,
text_bpe_tokens, ann_lsh_recall, ann_ivf_recall) + the r10 vintage —
and the flagship/parity family (category_summary, global_summary, the
P/J/M anchors) carries r11 rows, so r15 must take those anchors first
among refreshes (the never-age-past-4 rule).

BEFORE RUNNING: re-run `python tools/vintage_report.py` and confirm
CORRECTNESS_r13 re-checked exactly the intended 50 (7 r13-batch + 43
r8); if the driver windowed differently, fix the row lists first.
"""
from __future__ import annotations

import re

PATH = "bangumi_notion_data_integration_project_spark/queries.py"

R14_BATCH = [
    "events_type_dunn", "orders_price_ab", "events_type_jt",
    "events_mix_chi2", "events_mix_shares", "events_type_pettitt",
    "segment_kendall", "segment_spearman",
]
R8_LAST = ["embedding_kmeans"]
# the 41 stalest latest-row-r9 entries, registry order (vintage_report)
R9_ROWS = [
    "revenue_pacf", "revenue_holt", "revenue_runs_test",
    "orders_breakpoint_trend", "segment_churn_km", "docs_rake_keywords",
    "docs_branching_entropy", "events_value_quantiles_sketch",
    "events_type_overlap_sketch", "ann_pq_recall", "customer_set_ops",
    "dedup_bow", "docs_bigram_counts", "docs_pack_bins",
    "docs_weighted_sample", "embedding_covariance", "embedding_pq_codes",
    "events_funnel_steps", "events_max_concurrency_2p",
    "lineitem_correlations", "merge_updates", "events_markov",
    "revenue_gini", "docs_lang_confusion", "orders_seasonal",
    "incremental_agg_cdc", "orders_mad", "docs_curriculum",
    "events_attribution_decay", "events_freshness", "brand_concentration",
    "events_inter_arrival", "events_cusum", "events_sequence_rules",
    "dedup_latest_by_key", "union_all_counts", "cross_join_dims",
    "text_token_stats", "text_quality", "text_lang_id",
    "docs_repetition",
]
# prior window (the r13-checked 50), prior relative order
R13_WINDOW = [
    "orders_price_w1", "orders_price_cvm", "orders_price_mood",
    "events_type_kw", "events_type_w1", "segment_returns_ztest",
    "segment_trimmed_mean",
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

BOUNDARY = """\
    # --------- driver checked-window boundary (position 50) ---------
    # ROUND-15 ROTATION NOTE: after r14 lands, the stalest evidence
    # is the 9 remaining r9 rows (orders_price_histogram,
    # doc_fingerprint, embedding_norms,
    # orders_cube, running_revenue, latest_event_per_type,
    # text_bpe_tokens, ann_lsh_recall, ann_ivf_recall — registry
    # order), then the r10 vintage — BUT the flagship/parity family
    # (category_summary, global_summary, the P/J/M anchors:
    # project_truncate, filter_nonempty, timestamp_parse,
    # json_extract, map_multikey, token_pivot, coalesce_display,
    # merge_inserts/deletes/full_sync/upsert, dedup_exact) carries
    # r11 rows and the never-age-past-4 rule forces them into the
    # r15 window ahead of fresher r10 rows. Rotate r15 = the r15
    # batch just below this comment (orders_price_bm /
    # events_type_median are built, oracle-pinned, plan-pinned —
    # register them in r14) + the 8 r9 rows + the flagship family +
    # stalest r10 rows up to the 50 budget.
"""

HEAD_COMMENTS = {
    "events_type_dunn": """\
    # -- the 8 r14-batch queries (registered r13, never
    # -- driver-checked — new queries outrank every refresh): the
    # -- playbook's post-hoc (Dunn), dispersion (Ansari-Bradley),
    # -- ordered-trend (JT) and categorical-mix (χ²) rungs + the
    # -- grouped rank-correlation variants (per-type Pettitt,
    # -- per-segment volume-revenue tau-b and rho)
""",
    "embedding_kmeans": """\
    # -- the last latest-row-r8 entry (the r13 rotation re-checked
    # -- the other 43), then the 41 stalest r9 rows (registry order)
""",
    "orders_price_w1": """\
    # -- displaced r13 window (7 r13-batch + 43 r8 refreshes), every
    # -- row green in its latest driver round, prior order preserved
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
# 258 at r13 close; r14 may register the r15 batch before rotating
assert len(names) >= 258, f"expected >= 258 entries, got {len(names)}"

window = R14_BATCH + R8_LAST + R9_ROWS
assert len(window) == 50, len(window)
moved = set(window) | set(R13_WINDOW)
rest = [n for n in names if n not in moved]
new_order = window + R13_WINDOW + rest
assert len(new_order) == len(names) and len(set(new_order)) == len(names)
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
print("pos51 (first after boundary) =", new_order[50])
