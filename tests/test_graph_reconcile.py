"""Tests for the round-4 additions: PageRank, snapshot reconciliation,
weighted sampling, and the interval-sweep / funnel / gap-fill queries.

Each distributed operator is checked against an independent pure-Python
reference on the same inputs, the strongest oracle available when the
semantics are iterative or involve engine-portable hashing.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.graph import pagerank
from bangumi_notion_data_integration_project_spark.operators.reconcile import (
    row_checksum,
    snapshot_diff,
)
from bangumi_notion_data_integration_project_spark.operators.sampling import (
    weighted_sample_keys,
)


# ---------------------------------------------------------------- pagerank


def py_pagerank(edges, iterations=3, damping=0.85, dangling=False):
    """Pure-Python power iteration over a distinct directed edge list."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        incoming = {v: 0.0 for v in nodes}
        for u, v in edges:
            incoming[v] += rank[u] / out[u]
        spread = sum(rank[v] for v in nodes if v not in out) / n if dangling else 0.0
        rank = {
            v: (1 - damping) / n + damping * (incoming[v] + spread) for v in nodes
        }
    return rank


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_python_symmetric(spark):
    raw = [(1, 2), (2, 3), (3, 1), (1, 4)]
    edges = raw + [(b, a) for a, b in raw]
    got = _spark_ranks(spark, edges, iterations=3)
    want = py_pagerank(edges, iterations=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass_redistributed(spark):
    # 3 is a sink: without dangling handling total mass leaks each round
    edges = [(1, 2), (2, 3), (1, 3)]
    got = _spark_ranks(spark, edges, iterations=4, handle_dangling=True)
    want = py_pagerank(edges, iterations=4, dangling=True)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_rejects_zero_iterations(spark):
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_pagerank_symmetric_path_bit_identical(spark):
    """symmetric=True (r14: skips the per-iteration nodes LEFT JOIN)
    must reproduce the general path's ranks BIT-for-bit on a mirrored
    edge list — same floats, not just approx: the skipped join was a
    no-op re-attachment under the symmetry contract."""
    raw = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (2, 5)]
    edges = raw + [(b, a) for a, b in raw]
    general = _spark_ranks(spark, edges, iterations=3, edges_distinct=True)
    fast = _spark_ranks(
        spark, edges, iterations=3, edges_distinct=True, symmetric=True
    )
    assert general == fast  # exact float equality, node set included


def test_pagerank_symmetric_rejects_dangling(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    with pytest.raises(ValueError, match="dangling"):
        pagerank(df, symmetric=True, handle_dangling=True)


def test_pagerank_duplicate_edges_collapse(spark):
    # duplicated edges must not double-count contributions
    edges = [(1, 2), (1, 2), (2, 1)]
    got = _spark_ranks(spark, edges, iterations=2)
    want = py_pagerank([(1, 2), (2, 1)], iterations=2)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


# ------------------------------------------------------------- reconcile


def py_checksum(*vals) -> int:
    digest = hashlib.md5(":".join(str(v) for v in vals).encode()).hexdigest()
    digits = "".join(c for c in digest if c.isdigit()) + "000000"
    return int(digits[:6])


def test_row_checksum_is_engine_portable(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (31, 0)], ["k", "v"])
    got = df.select("k", "v", row_checksum(F.col("k"), F.col("v")).alias("c")).collect()
    for r in got:
        assert r["c"] == py_checksum(r["k"], r["v"])


def test_snapshot_diff_identical_is_all_ok(spark):
    df = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    out = snapshot_diff(df, df, "k", ["v"], n_buckets=8).collect()
    assert len(out) == 8
    assert all(r["status"] == "ok" for r in out)
    assert sum(r["left_rows"] for r in out) == 500


def test_snapshot_diff_localizes_mutations(spark):
    left = spark.range(0, 512).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    # delete key 17 (bucket 1), mutate key 40 (bucket 0); bucket count 8
    right = left.filter(F.col("k") != 17).withColumn(
        "v", F.when(F.col("k") == 40, F.lit(-1)).otherwise(F.col("v"))
    )
    rows = {r["bucket"]: r for r in snapshot_diff(left, right, "k", ["v"], n_buckets=8).collect()}
    assert rows[1]["status"] == "diff" and rows[1]["right_rows"] == rows[1]["left_rows"] - 1
    assert rows[0]["status"] == "diff" and rows[0]["right_rows"] == rows[0]["left_rows"]
    for b in range(2, 8):
        assert rows[b]["status"] == "ok"


def test_snapshot_diff_count_collision_caught_by_checksum(spark):
    # same row count, different payload — only the checksum can tell
    left = spark.createDataFrame([(0, 1), (8, 2)], ["k", "v"])
    right = spark.createDataFrame([(0, 1), (8, 3)], ["k", "v"])
    rows = {r["bucket"]: r for r in snapshot_diff(left, right, "k", ["v"], n_buckets=8).collect()}
    assert rows[0]["status"] == "diff"
    assert rows[0]["left_rows"] == rows[0]["right_rows"] == 2


# ------------------------------------------------------- weighted sampling


def py_aes_key(key, weight, salt=""):
    import math

    digest = hashlib.md5((str(key) + salt).encode()).hexdigest()
    digits = "".join(c for c in digest if c.isdigit()) + "000000"
    u = (int(digits[:6]) + 0.5) / 1_000_000.0
    return -math.log(u) / weight


def test_weighted_sample_keys_match_python(spark):
    df = spark.createDataFrame(
        [(i, float(10 + 7 * i)) for i in range(50)], ["k", "w"]
    )
    got = weighted_sample_keys(df, "k", "w").collect()
    assert len(got) == 50
    for r in got:
        assert r["aes_key"] == pytest.approx(py_aes_key(r["k"], r["w"]), rel=1e-12)


def test_weighted_sample_drops_nonpositive_weights(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], ["k", "w"])
    kept = {r["k"] for r in weighted_sample_keys(df, "k", "w").collect()}
    assert kept == {1}


def test_weighted_sample_is_weight_biased(spark):
    # one heavy item among uniform light ones should be selected into a
    # small top-k far more often than 1/n — use many salts as trials
    heavy_hits = 0
    trials = 30
    rows = [(i, 1.0) for i in range(40)] + [(99, 400.0)]
    df = spark.createDataFrame(rows, ["k", "w"])
    for t in range(trials):
        top = (
            weighted_sample_keys(df, "k", "w", salt=f"t{t}")
            .orderBy("aes_key")
            .limit(5)
            .collect()
        )
        heavy_hits += any(r["k"] == 99 for r in top)
    # P(heavy in top-5) ≈ 1 - prod(1 - 400/(400+40-i)) >> 0.9; demand most
    assert heavy_hits >= trials * 0.8
