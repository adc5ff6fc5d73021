"""One-shot r12 window rotation for the QUERIES dict in queries.py.

Reorders the dict entries per the ROUND-12 ROTATION NOTE:
  positions 1-10 : the 10 never-driver-checked r12-batch queries
  positions 11-44: the 34 remaining r7-vintage rows (registry order)
  positions 45-50: the 6 stalest r8 rows (registry order)
  boundary comment at position 50 with the r13 rotation note
  then: displaced r11 window (prior relative order), then the rest
  of the registry (prior relative order) minus rows moved forward.
"""
from __future__ import annotations

import re

PATH = "bangumi_notion_data_integration_project_spark/queries.py"

R12_BATCH = [
    "orders_price_mwu", "orders_price_ks", "events_type_mwu",
    "events_type_ks", "revenue_kendall_tau", "revenue_spearman",
    "revenue_pettitt", "segment_mk_bh", "lineitem_returns_ztest",
    "revenue_trimmed_mean",
]
R7_ROWS = [
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
]
R8_ROWS = [
    "lineitem_quantile_sketch", "lineitem_sketch_merge",
    "events_weekly_users_sketch", "orders_survival_km", "revenue_acf",
    "docs_pmi_collocations",
]
# prior window (the r11-checked 50), prior relative order
R11_WINDOW = [
    "revenue_mann_kendall", "orders_seasonal_mk", "revenue_sen_trend",
    "revenue_ship_ccf", "events_type_psi", "events_type_hampel",
    "lineitem_ols2", "events_type_mk", "events_markov_entropy",
    "parts_freq_cms", "orders_price_psi_sketch",
    "parts_skyline", "incremental_agg_merge", "events_retention",
    "docs_char_entropy", "coalesce_display", "orders_top_unshipped",
    "order_priority_counts", "docs_unigram_logprob",
    "docs_stratified_sample", "docs_mixture_weights", "volume_shipping",
    "product_profit", "returned_top_customers", "promo_revenue",
    "large_volume_customers", "brand_disc_revenue",
    "top_revenue_suppliers", "small_qty_revenue", "idle_rich_customers",
    "min_cost_supplier", "market_share", "important_parts",
    "late_shipment_priority",
    "category_summary", "global_summary", "revenue_by_nation",
    "project_truncate", "filter_nonempty", "timestamp_parse",
    "json_extract", "map_multikey", "token_pivot", "merge_inserts",
    "merge_deletes", "merge_full_sync", "merge_upsert", "dedup_exact",
    "orders_asof_join", "fuzzy_name_blocking",
]

BOUNDARY = """\
    # --------- driver checked-window boundary (position 50) ---------
    # ROUND-13 ROTATION NOTE: after r12 lands, the vintage floor is
    # r8 and the stalest evidence is the remaining r8 rows
    # (docs_zipf_fit .. docs_frequent_tokens, registry order below).
    # Rotate the r13 window onto the new r13 queries just below this
    # comment (positions 51+, never driver-checked) + the remaining
    # r8 rows + the stalest r9 rows up to the 50 budget. Do NOT
    # register more new queries than the window budget (~10) per
    # round.
"""

HEAD_COMMENTS = {
    "orders_price_mwu": """\
    # -- the 10 r12-batch queries (registered r11, never
    # -- driver-checked — new queries outrank every refresh, the
    # -- standing rotation rule): the drift-significance playbook —
    # -- MWU + KS era drift (global on order price, grouped per
    # -- event type), Kendall tau-b + Spearman on daily
    # -- ordered-vs-shipped revenue, Pettitt changepoint,
    # -- BH-corrected grouped MK per market segment, two-proportion
    # -- z on the return rate, exact trimmed mean of daily revenue
""",
    "events_twap": """\
    # -- the 34 remaining r7-vintage rows (the stalest driver
    # -- evidence — this retires the r7 debt entirely; vintage
    # -- floor becomes r8 after the driver runs)
""",
    "lineitem_quantile_sketch": """\
    # -- the 6 stalest r8 rows (registry order) filling the 50
    # -- budget
""",
    "revenue_mann_kendall": """\
    # -- displaced r11 window (11 r11-batch + 23 retired-r6 +
    # -- flagship family), every row green in its latest driver
    # -- round, prior order preserved
""",
    "docs_textrank_keywords": """\
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
assert len(names) == 244, f"expected 244 entries, got {len(names)}"

window = R12_BATCH + R7_ROWS + R8_ROWS
assert len(window) == 50, len(window)
moved = set(window) | set(R11_WINDOW)
rest = [n for n in names if n not in moved]
new_order = window + R11_WINDOW + rest
assert len(new_order) == 244 and len(set(new_order)) == 244
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
