"""Unit tests for degree-oriented triangle counting."""

from __future__ import annotations

import itertools
import random

from bangumi_notion_data_integration_project_spark.operators.graph import (
    triangle_stats,
)


def _frame(spark, edges):
    return spark.createDataFrame(sorted(edges), "a: long, b: long")


def _python_reference(edges):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # each triangle {a<b<c} counted once: at edge (a,b) with neighbor c>b
    tri = sum(1 for a, b in edges for c in (adj[a] & adj[b]) if c > b)
    paths2 = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    return len(adj), len(edges), paths2, tri


def test_triangle_stats_known_graph(spark):
    # K4 has 4 triangles; plus a pendant edge adding none
    edges = list(itertools.combinations(range(1, 5), 2)) + [(4, 99)]
    row = triangle_stats(_frame(spark, edges)).collect()[0]
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["n_triangles"] == 4
    # paths2: degrees [3,3,3,4,1] -> 3+3+3+6+0 = 15; transitivity 12/15
    assert row["n_paths2"] == 15
    assert abs(row["transitivity"] - 0.8) < 1e-9


def test_triangle_stats_triangle_free(spark):
    # star graphs have no triangles regardless of hub degree
    edges = [(0, i) for i in range(1, 30)]
    row = triangle_stats(_frame(spark, edges)).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_paths2"] == 29 * 28 // 2


def test_triangle_stats_matches_python_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(40))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (rng.sample(nodes, 2) for _ in range(200))
        }
    )
    n_nodes, n_edges, paths2, tri = _python_reference(edges)
    row = triangle_stats(_frame(spark, edges)).collect()[0]
    assert row["n_nodes"] == n_nodes
    assert row["n_edges"] == n_edges
    assert row["n_paths2"] == paths2
    assert row["n_triangles"] == tri


def test_triangle_stats_skewed_hub_counts_once(spark):
    """A hub in every triangle: orientation must not double-count or
    explode — hub edges all point INTO the hub (highest degree)."""
    # fan of triangles sharing hub 0: (0,i),(0,i+1),(i,i+1)
    edges = set()
    for i in range(1, 20, 2):
        edges |= {(0, i), (0, i + 1), (i, i + 1)}
    row = triangle_stats(_frame(spark, sorted(edges))).collect()[0]
    assert row["n_triangles"] == 10
