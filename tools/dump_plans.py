"""Regenerate PLANS.md: physical-plan evidence for representative
queries. Run after changing any query shape:

    python tools/dump_plans.py

For each selected query we record the scan schemas (column pruning),
pushed filters (predicate pushdown), join strategies, exchange count
(shuffles), and whole-stage-codegen coverage — the properties that
decide whether the plan survives a 100 TB input. tests/test_plans.py
asserts the same properties; this file is the human-readable exhibit.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangumi_notion_data_integration_project_spark.queries import QUERIES  # noqa: E402
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# one per family: agg, merge, star join, window, ANN, dedup, layout
SHOWN = [
    ("category_summary", "flagship grouped aggregate (reference A1-A4)"),
    ("merge_upsert", "keyed snapshot merge (reference M1-M6)"),
    ("merge_partition_scoped", "partition-scoped MERGE INTO (Delta-style, plain parquet)"),
    ("simhash_docs", "bulk SimHash, packed 2x32-bit-lane bit counts"),
    ("revenue_by_nation", "star join with eager pre-aggregation"),
    ("order_top_parts", "top-k per group window"),
    ("similarity_bruteforce", "brute-force ANN, broadcast query side"),
    ("dedup_exact", "hash-groupBy dedup tier"),
    ("parts_skyline", "2-D skyline, distributed prefix-max"),
    ("events_zorder_stats", "Morton-key locality audit"),
    ("dedup_near_pipeline", "inverted-shingle-index near-dedup + closure"),
    ("docs_dup_spans", "duplicated-span fraction (substring-dedup approx)"),
    ("market_share", "q8 conditional-share star join"),
    ("waiting_suppliers", "q21 reformulated as one aggregation"),
    ("docs_chunks", "map-only overlap chunking"),
    ("events_max_concurrency", "interval +1/-1 boundary sweep (no self-join)"),
    ("parts_pagerank", "3-iteration distributed PageRank over co-purchase edges"),
    ("snapshot_diff_orders", "bucketed checksum table-diff (reconcile)"),
    ("events_funnel_steps", "N-step funnel, one exchange regardless of depth"),
    ("docs_bigram_counts", "join-free BPE pair counting"),
    ("ann_pq_topk", "ADC scan over PQ codes, broadcast LUT"),
    ("cdc_apply_orders", "CDC log replay, one max_by aggregate (no window sort)"),
    ("lineitem_correlations", "6-pair correlation matrix, one scan + one shuffle pair"),
    ("events_top_paths", "path mining via bounded in-array sort (no event-table window)"),
    ("parts_kcore", "iterative k-core peel, semi-join rounds"),
    ("embedding_covariance", "fixed-point PCA Gram pass, map-only partials"),
    ("orders_window_battery", "8 analytic window functions on one keyed sort"),
    ("revenue_pareto", "customer-dimension cumsum + decile rollup"),
    ("docs_frequent_tokens", "Misra-Gries candidates + broadcast recount"),
    ("incremental_agg_cdc", "O(delta) view maintenance: touched-key semi join + retract/assert"),
    ("events_attribution_decay", "dyadic time-decay credit over the bucketed range join"),
    ("docs_setsim_prefix", "PPJoin prefix-filter set-similarity join (lossless)"),
    ("docs_containment", "asymmetric shingle-containment near-dup (directed)"),
    ("events_cusum", "CUSUM change-point via running-sum/running-min closed form"),
    ("events_time_rollup", "hierarchical day->week/month rollup from partials (join-free)"),
    ("events_sequence_rules", "order-constrained rules: (user,type) aggregate before pair join"),
    ("brand_monthly_trend", "two-level OLS: monthly partials then exact-moment fit"),
    ("docs_bigram_logprob", "bigram-LM scoring, plan-literal count maps (join-free)"),
    ("events_time_rollup_refresh", "O(touched) continuous-aggregate refresh == full rollup"),
    ("embedding_near_dup_topk", "bounded O(N*k) SRP near-dup, per-vector rank window"),
    ("docs_winnowing", "MOSS winnowing fingerprints, packed-integer window argmin"),
    ("docs_token_coverage", "vocab coverage curve, one token-stream aggregate"),
    ("docs_ngram_novelty", "first-occurrence novelty, shingle join-back (no pairs)"),
    ("orders_cohort_ltv", "cohort LTV triangle, co-partitioned custkey join"),
    ("supplier_lead_times", "fact-fact orderkey join + post-agg broadcast dim"),
    ("lineitem_weighted_median", "exact weighted median via cumulative window"),
    ("fuzzy_name_blocking", "blocked record linkage: vocab-sized Levenshtein verify inside blocks"),
    ("events_twap", "time-weighted average price, exact whole-second hold durations"),
    ("orders_running_backlog", "interval-endpoint +-1 fold, prefix sum over O(days) aggregate"),
    ("events_debounce", "last-KEPT-anchor throttle, one key shuffle + JVM array fold"),
    ("docs_vocab_growth", "Heaps-law growth via first-bucket attribution (no recount)"),
    ("orders_survival_km", "Kaplan-Meier steps, ordered product fold over O(durations) agg"),
    ("revenue_acf", "lag-1..7 autocorrelation, exact DECIMAL moments on calendar-bounded agg"),
    ("docs_pmi_collocations", "PMI top-50 via monotone integer ratio, TakeOrdered cut"),
    ("docs_zipf_fit", "Zipf OLS, micro-int ln moments, TakeOrdered vocab cut"),
    ("events_user_coverage", "interval-union coverage, running-max merge (no self-join)"),
    ("orders_seasonal_decompose", "7-row moving-average decomposition, x7-integer-exact"),
    ("docs_source_jsd", "pairwise source JSD, per-pair token union + nano-int sums"),
    ("revenue_pacf", "Durbin-Levinson PACF on the stored ACF (bounded collect)"),
    ("revenue_holt", "Holt linear smoothing, one ordered JVM fold on O(days) agg"),
    ("revenue_runs_test", "Wald-Wolfowitz runs test, integer order statistics"),
    ("orders_breakpoint_trend", "two-segment changepoint, one prefix-moment window"),
    ("segment_churn_km", "per-segment KM curves, windows keyed on segment"),
    ("docs_rake_keywords", "RAKE keywords, per-row run-split + broadcast word scores"),
    ("docs_branching_entropy", "left/right branching entropy, broadcast top-25 cut"),
    ("events_value_quantiles_sketch", "grouped bottom-k sketch + per-group rank probe"),
    ("events_type_overlap_sketch", "HLL inclusion-exclusion overlap from stored sketches"),
    ("docs_textrank_keywords", "TextRank keywords, 4 unrolled weighted-pagerank rounds"),
    ("docs_textrank_phrases", "TextRank keyphrases, run-split + broadcast top-word scores"),
    ("orders_price_psi", "PSI drift, distinct-value edges + broadcast range bucketize"),
    ("revenue_hampel_outliers", "Hampel filter, plan-literal rank from sorted 7-day windows"),
    ("events_user_overlap_setsketch", "KMV bottom-k overlap vs exact, broadcast k-row sketches"),
    ("segment_holt", "per-segment Holt fold, grouped sort_array aggregate"),
    ("events_type_breakpoint", "per-type changepoint, prefix-moment windows keyed on type"),
    ("events_conversion_km", "funnel time-to-conversion KM, broadcast scalar max-date"),
    ("orders_price_mwu", "Mann-Whitney drift significance, one window over the sided distinct-value aggregate"),
    ("events_type_kw", "Kruskal-Wallis omnibus, two RANGE windows over the (type, value) count aggregate"),
    ("events_type_dunn", "Dunn post-hoc pairs, broadcast self-join of the O(k) group frame + BH rank window"),
    ("orders_price_ab", "Ansari-Bradley scale test, closed-form block scores on the sided-counts fold"),
    ("events_type_jt", "Jonckheere-Terpstra trend, dense (group x values) grid of two aggregates"),
    ("events_mix_chi2", "chi-square mix homogeneity, two keyed count aggregates + O(categories) fold"),
    ("segment_kendall", "grouped tau-b, checkpoint-pinned daily frame + per-segment pair join"),
    ("segment_mk_bh", "grouped Mann-Kendall + BH step-up over the per-key test rows"),
]


def _formatted(spark, name: str) -> tuple[str, int]:
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # codegen ids exist only in the executed (AQE-final) plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    n_codegen = len(set(re.findall(r"\*\((\d+)\)", executed)))
    return plan, n_codegen


def digest(plan: str) -> list[str]:
    # formatted mode prints each node once in the tree and once in the
    # details section headed "(<id>) <NodeName>"; count the headers so
    # every physical node is counted exactly once
    nodes = re.findall(r"^\((\d+)\) (\w+)", plan, re.M)
    kinds = [k for _, k in nodes]
    lines = []
    seen_schemas = set()
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        if s in seen_schemas:
            continue
        seen_schemas.add(s)
        cols = [c.split(":")[0] for c in s.split(",") if c]
        lines.append(f"- scan reads {len(cols)} columns: `{', '.join(cols)}`")
    seen_pf = set()
    for pf in re.findall(r"PushedFilters: \[([^\]]+)\]", plan):
        if pf.strip() and pf not in seen_pf:
            seen_pf.add(pf)
            lines.append(f"- pushed filters: `{pf.strip()}`")
    join_kinds = [
        k for k in kinds
        if k in ("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin", "ShuffledHashJoin")
    ]
    if join_kinds:
        counts = {j: join_kinds.count(j) for j in dict.fromkeys(join_kinds)}
        lines.append("- joins: " + ", ".join(f"{v}× {k}" for k, v in counts.items()))
    n_shuffle = kinds.count("Exchange")
    n_bcast = kinds.count("BroadcastExchange")
    lines.append(f"- exchanges: {n_shuffle} shuffle, {n_bcast} broadcast")
    if "BatchEvalPython" in plan:
        lines.append("- WARNING: row-wise Python in plan")
    return lines


def main() -> None:
    spark = get_spark("plans")
    out = [
        "# PLANS — physical-plan evidence (auto-generated)",
        "",
        "Generated by `python tools/dump_plans.py` at sf0.001 (plan shape",
        "is scale-independent; AQE may further coalesce at runtime).",
        "Properties asserted in `tests/test_plans.py`.",
        "",
    ]
    for name, blurb in SHOWN:
        plan, n_codegen = _formatted(spark, name)
        out.append(f"## {name}")
        out.append(f"*{blurb}*")
        out.append("")
        out.extend(digest(plan))
        out.append(f"- whole-stage-codegen spans (executed plan): {n_codegen}")
        out.append("")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
