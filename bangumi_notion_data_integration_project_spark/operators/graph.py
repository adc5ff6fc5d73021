"""Distributed graph analytics: fixed-iteration PageRank.

Complements ``operators/components.py`` (connected components) with the
other workhorse iterative graph operator a large-corpus pipeline needs —
ranking nodes of a similarity / co-occurrence graph (e.g. co-purchased
parts, near-duplicate document clusters) by link structure.

Scale design (100 TB):
- The edge list is the only large input; each iteration is one
  equi-join ``ranks ⋈ edges`` on the source key plus one ``groupBy`` on
  the destination key — both hash-partitioned shuffles on bounded-width
  rows. Nothing is ever collected to the driver.
- ``edges`` is joined with out-degrees ONCE up front and cached, so the
  per-iteration work is a single join + aggregate; on a real cluster the
  cached edge table stays partitioned by ``src`` and the join is
  shuffle-free on the rank side only.
- Iteration count is fixed (power iteration), so the plan size is
  bounded and there is no driver-side convergence loop over ``collect``.
  For rank-until-convergence semantics, wrap this in the same
  loud-failure pattern as ``connected_components``.
- Dangling nodes (out-degree 0) cannot occur when the edge list is
  symmetric (undirected graphs); for directed inputs pass
  ``handle_dangling=True`` to redistribute their mass uniformly, which
  costs one extra 1-row aggregate per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    handle_dangling: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over a (src, dst) edge list.

    Returns ``(node, rank)`` for every node that appears as a source or
    destination. Ranks after ``iterations`` rounds of
    ``r(v) = (1-d)/N + d * Σ_{u→v} r(u)/outdeg(u)``, all computed with
    DataFrame joins/aggregates (no driver-side collect; N enters the
    plan via a broadcast one-row aggregate, not a Python scalar).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    # (src, dst, outdeg) — the per-iteration join target, computed once.
    edges_deg = e.join(deg, "src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_row = nodes.agg(F.count("*").cast("double").alias("n"))
    # Broadcast the 1-row N so every stage stays JVM-side.
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    base = F.lit(1.0 - damping) / F.col("n")
    for _ in range(iterations):
        contrib = (
            ranks.join(edges_deg, ranks["node"] == edges_deg["src"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("incoming"))
        )
        if handle_dangling:
            out_mass = (
                ranks.join(edges_deg.select("src").distinct(), ranks["node"] == F.col("src"), "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
            )
            spread = F.col("dangling") / F.col("n")
            ranks = (
                nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
                .crossJoin(F.broadcast(n_row))
                .crossJoin(F.broadcast(out_mass))
                .select(
                    "node",
                    (base + F.lit(damping) * (F.coalesce(F.col("incoming"), F.lit(0.0)) + spread)).alias("rank"),
                )
            )
        else:
            ranks = (
                nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
                .crossJoin(F.broadcast(n_row))
                .select(
                    "node",
                    (base + F.lit(damping) * F.coalesce(F.col("incoming"), F.lit(0.0))).alias("rank"),
                )
            )
    return ranks
