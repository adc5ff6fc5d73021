"""Differential tests: BM25 scoring and multi-touch attribution vs
pure-Python references computed straight off the parquet."""

from __future__ import annotations

import math

import pandas as pd

from bangumi_notion_data_integration_project_spark.queries import (
    ATTRIBUTION_WINDOW_DAYS,
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    q_docs_bm25_topk,
    q_events_attribution,
)


def test_bm25_matches_python_reference(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n = len(pdf)
    dls: dict[int, int] = {}
    tfs: dict[int, dict[str, int]] = {}
    for r in pdf.itertuples():
        toks = r.text.strip().split()  # \s+ split, like tokens()
        dls[r.doc_id] = len(toks)
        for t in toks:
            if t in BM25_TERMS:
                tfs.setdefault(r.doc_id, {})
                tfs[r.doc_id][t] = tfs[r.doc_id].get(t, 0) + 1
    avgdl = sum(dls.values()) / n
    df = {t: sum(1 for d in tfs.values() if t in d) for t in BM25_TERMS}

    def score(doc_id: int) -> float:
        s = 0.0
        for t, tf in tfs[doc_id].items():
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            denom = tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[doc_id] / avgdl)
            s += idf * tf * (BM25_K1 + 1) / denom
        return round(s, 6)

    expected = sorted(
        ((score(d), len(t)) for d, t in tfs.items()),
        key=lambda x: (-x[0],),
    )
    got = q_docs_bm25_topk(spark, sf_dir).collect()
    assert len(got) == min(20, len(tfs))
    ranked = sorted(
        ((d, score(d)) for d in tfs), key=lambda x: (-x[1], x[0])
    )[: len(got)]
    for row, (doc_id, s) in zip(got, ranked):
        assert row["doc_id"] == doc_id
        assert abs(row["bm25"] - s) < 1e-6
        assert row["n_terms"] == len(tfs[doc_id])
    # sanity on the corpus: the test is vacuous unless terms actually hit
    assert len(tfs) > 20


def test_attribution_matches_python_reference(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    touches = pdf[pdf.event_type.isin(["click", "view"])]
    purchases = pdf[pdf.event_type == "purchase"]
    window = pd.Timedelta(days=ATTRIBUTION_WINDOW_DAYS)

    pair_counts: dict[int, int] = {}
    pair_types: list[tuple[str, int, float]] = []
    for p in purchases.itertuples():
        hits = touches[
            (touches.user_id == p.user_id)
            & (touches.ts >= p.ts - window)
            & (touches.ts <= p.ts)
        ]
        if len(hits):
            pair_counts[p.event_id] = len(hits)
            for t in hits.itertuples():
                pair_types.append((t.event_type, p.event_id, p.value))

    expected: dict[str, tuple[int, set, float]] = {}
    for etype, pid, value in pair_types:
        cnt, pids, total = expected.get(etype, (0, set(), 0.0))
        pids = set(pids) | {pid}
        expected[etype] = (cnt + 1, pids, total + value / pair_counts[pid])

    got = {r["event_type"]: r for r in q_events_attribution(spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for etype, (cnt, pids, total) in expected.items():
        assert got[etype]["n_touches"] == cnt
        assert got[etype]["n_purchases"] == len(pids)
        assert abs(got[etype]["attributed_value"] - round(total, 2)) < 0.02
    # vacuity guard: the fixture must actually produce attributed pairs
    assert sum(c for c, _, _ in expected.values()) > 10
