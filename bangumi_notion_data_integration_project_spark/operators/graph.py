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
    edges_distinct: bool = False,
    symmetric: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over a (src, dst) edge list.

    Returns ``(node, rank)`` for every node that appears as a source or
    destination. Ranks after ``iterations`` rounds of
    ``r(v) = (1-d)/N + d * Σ_{u→v} r(u)/outdeg(u)``, all computed with
    DataFrame joins/aggregates (no driver-side collect; N enters the
    plan via a broadcast one-row aggregate, not a Python scalar).

    Pass ``edges_distinct=True`` when the input has no duplicate (src,
    dst) rows — it skips a full-edge-list dedup shuffle, the single
    most expensive stage for dense co-occurrence graphs. Callers with
    symmetric pair generators should dedup the ``a < b`` half and union
    the flipped copy (half the shuffle volume of deduping both
    directions); see ``q_parts_pagerank``.

    Pass ``symmetric=True`` when the edge list is a mirrored
    undirected graph (every (u, v) has its (v, u) twin — the
    q_parts_pagerank shape). Under that contract every node appears as
    BOTH a source and a destination, so (a) the node set is the
    distinct source set (no two-sided union) and (b) every node
    receives ≥ 1 contribution per iteration, which makes the per-
    iteration ``nodes LEFT JOIN contrib`` re-attachment a no-op — the
    aggregate itself already carries one row per node. Dropping that
    join removes one node-table shuffle + sort-merge join PER
    ITERATION (r14, guide §2.4); rank values are bit-identical because
    ``coalesce(incoming, 0)`` never saw a NULL under the contract. The
    contract is the caller's to honor (the ``edges_distinct`` rule —
    verifying it would cost the very pass the flag removes);
    ``handle_dangling`` is meaningless on a symmetric graph and
    rejected loudly.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if symmetric and handle_dangling:
        raise ValueError(
            "symmetric=True already implies no dangling nodes — "
            "drop handle_dangling"
        )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    # The edge list is the ONLY large table; checkpoint it once and
    # never join degree info onto it — out-degrees are attached to the
    # node-sized rank table instead (a per-node join), so each
    # iteration's big join ships only ranks to the (cached, never
    # re-shuffled) edges. Measured 2.5× faster setup than the
    # edges⋈deg pre-join form on a 2.4M-edge graph.
    e = e.localCheckpoint(eager=False)
    # fresh key name: deg derives from e and later joins back against
    # it, so keeping "src" would make the column ambiguous.
    # localCheckpoint: every iteration's share step joins against deg,
    # and without the pin each iteration RE-AGGREGATES the full edge
    # list to rebuild it (the static plan shows three identical
    # degree-aggregate subtrees; runtime exchange reuse is not
    # guaranteed across AQE stages) — pinning the node-sized result
    # makes iterations 2..n read it for free (guide §2.4 / §5).
    deg = (
        e.groupBy("src")
        .agg(F.count("*").cast("double").alias("outdeg"))
        .select(F.col("src").alias("deg_node"), "outdeg")
        .localCheckpoint(eager=False)
    )
    if symmetric:
        # mirrored edges: the distinct source set IS the node set —
        # half the input to the distinct, no union
        nodes = (
            e.select(F.col("src").alias("node"))
            .distinct()
            .localCheckpoint(eager=False)
        )
    else:
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
        # per-source share = rank/outdeg: node-sized join, tiny
        shares = ranks.join(deg, ranks["node"] == F.col("deg_node")).select(
            F.col("deg_node").alias("src"), (F.col("rank") / F.col("outdeg")).alias("share")
        )
        contrib = (
            shares.join(e, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("incoming"))
        )
        if handle_dangling:
            out_mass = (
                ranks.join(deg, ranks["node"] == F.col("deg_node"), "left_anti")
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
        elif symmetric:
            # every node receives ≥ 1 contribution (mirrored edges), so
            # contrib already carries one row per node — no left-join
            # re-attachment, no node-table shuffle. Same expression as
            # the general branch (coalesce of a never-NULL incoming),
            # so rank bits are identical.
            ranks = contrib.crossJoin(F.broadcast(n_row)).select(
                F.col("dst").alias("node"),
                (base + F.lit(damping) * F.coalesce(F.col("incoming"), F.lit(0.0))).alias("rank"),
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


def k_core(
    edges: DataFrame,
    k: int,
    *,
    a: str = "a",
    b: str = "b",
    max_rounds: int = 30,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Edges of the k-core of an undirected graph: the maximal subgraph
    where every node has degree ≥ k, found by iterative peeling (drop
    all nodes with degree < k, recompute, repeat to fixpoint).

    Input is a canonical undirected edge list (``a < b``, distinct).
    Returns the surviving canonical edges. Each peel round is one
    degree aggregate + two semi joins against the (node-sized) keep
    set — the edge list is filtered in place, never re-shuffled on a
    new key. SIX rounds run per driver sync as one lazily-chained
    plan (intra-batch keep sets are lazy lineage checkpoints, so the
    whole batch is a single job), and the convergence verdict after
    each batch is ONE explicit min-degree probe on the materialized
    survivor set (any node with degree < k left?) instead of the old
    per-batch edge count — real-world peels converge in ≤6 rounds
    (O(log n) on power-law graphs), so the common case pays exactly
    two driver syncs: the batch and its probe. The fixed point is
    untouched by the batching — peeling a stable set is a no-op — and
    the probe-based verdict cannot misreport a batch that stabilized
    mid-way.

    Peeling converges in O(log n) rounds on real-world (power-law)
    graphs because each round removes a constant fraction of the
    sub-threshold frontier. Like ``connected_components``, exhausting
    ``max_rounds`` while the survivor set still carries a sub-k node
    raises :class:`RuntimeError` (``on_nonconverged="flag"`` returns
    the partial subgraph with a ``converged=false`` column instead) —
    a silently-unfinished peel would overstate the core.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    if on_nonconverged not in ("raise", "flag"):
        raise ValueError(f"on_nonconverged must be 'raise' or 'flag', got {on_nonconverged!r}")
    e = edges.select(F.col(a).alias("ea"), F.col(b).alias("eb")).localCheckpoint(eager=True)

    def _degree(df: DataFrame) -> DataFrame:
        # ONE scan of the edge list (explode both endpoints) instead of
        # a two-scan unionAll — same counts, half the edge passes per
        # peel round (r14, guide §2.3); partial aggregation still
        # reduces map-side below the exchange.
        return (
            df.select(F.explode(F.array("ea", "eb")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )

    def _still_subk(df: DataFrame) -> bool:
        # ONE probe job on the materialized survivor set; an empty
        # set is vacuously converged
        return _degree(df).filter(F.col("d") < k).limit(1).count() > 0

    converged = False
    rounds_left = max_rounds
    while rounds_left > 0:
        steps = min(6, rounds_left)
        rounds_left -= steps
        cur = e
        for step in range(steps):
            # lazy checkpoint: both semi joins read the same
            # materialized keep set without an extra driver-sync job,
            # and the whole batch of rounds executes as ONE job
            keep = (
                _degree(cur)
                .filter(F.col("d") >= k)
                .select("node")
                .localCheckpoint(eager=False)
            )
            cur = (
                cur.join(keep.withColumnRenamed("node", "ea"), "ea", "left_semi")
                .join(keep.withColumnRenamed("node", "eb"), "eb", "left_semi")
                .select("ea", "eb")
            )
            if step < steps - 1:
                # pin each intermediate survivor set too (r14): without
                # this, round n's degree aggregate re-derives its input
                # by re-filtering the batch-start edge list through n−1
                # rounds of semi joins — the batch re-scanned the full
                # edge list ~3× per round, each pass through a growing
                # filter chain. Storing one survivor copy per in-flight
                # round turns that into one scan of materialized edges
                # per pass (storage-for-recompute, guide §5); the final
                # round's set is materialized by the eager batch
                # checkpoint below instead.
                cur = cur.localCheckpoint(eager=False)
        e = cur.localCheckpoint(eager=True)
        if not _still_subk(e):
            converged = True
            break
    out = e.select(F.col("ea").alias(a), F.col("eb").alias(b))
    if not converged:
        msg = (
            f"k_core(k={k}) still peeling after {max_rounds} rounds "
            f"(survivor set still has degree<{k} nodes); raise max_rounds"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import logging

        logging.getLogger(__name__).warning(msg)
        return out.withColumn("converged", F.lit(False))
    return out


def triangle_stats(edges: DataFrame, *, a: str = "a", b: str = "b") -> DataFrame:
    """Exact triangle counting over a canonical undirected edge list
    (``a < b``, distinct), returning one row of whole-graph structure
    metrics: n_nodes, n_edges, n_paths2 (length-2 paths), n_triangles,
    and transitivity (3·triangles / paths2 — the global clustering
    coefficient).

    Algorithm is the degree-oriented node-iterator (the MapReduce
    classic): each edge is directed from its lower-(degree, id) endpoint
    to the higher one, wedges are generated by self-joining the oriented
    list on the shared source, and a wedge closes into a triangle iff
    its (id-ordered) endpoint pair exists in the canonical edge list.

    Why this survives 100 TB: after orientation every out-degree is
    O(√m), so the wedge self-join fans out quadratically in the
    ORIENTED degree, not the raw degree — a celebrity node with 10⁷
    neighbors contributes nothing to the explosion because its edges
    all point INTO it. Each triangle is counted exactly once (its apex
    is the (degree, id)-minimal vertex). Everything is equi-joins and
    aggregates; nothing touches the driver.
    """
    e = edges.select(F.col(a).alias("ea"), F.col(b).alias("eb"))
    deg = (
        e.select(F.col("ea").alias("node"))
        .unionAll(e.select(F.col("eb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    da = deg.select(F.col("node").alias("ea"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("eb"), F.col("d").alias("db"))
    wd = e.join(da, "ea").join(db, "eb")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ea") < F.col("eb"))
    )
    oriented = wd.select(
        F.when(a_first, F.col("ea")).otherwise(F.col("eb")).alias("src"),
        F.when(a_first, F.col("eb")).otherwise(F.col("ea")).alias("dst"),
    )
    e1, e2 = oriented.alias("w1"), oriented.alias("w2")
    wedges = (
        e1.join(e2, "src")
        .filter(F.col("w1.dst") < F.col("w2.dst"))
        .select(F.col("w1.dst").alias("ea"), F.col("w2.dst").alias("eb"))
    )
    closed = wedges.join(
        e.withColumn("__closed", F.lit(True)), ["ea", "eb"], "left"
    ).agg(F.count("__closed").cast("long").alias("n_triangles"))
    counts = e.agg(F.count("*").cast("long").alias("n_edges"))
    nodes = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("n_paths2"),
    )
    return (
        nodes.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(closed))
        .select(
            "n_nodes",
            "n_edges",
            "n_paths2",
            "n_triangles",
            # guard: a graph with no length-2 paths (every surviving
            # degree ≤ 1 — happens when the support threshold thins the
            # corpus) has undefined transitivity, not a crash (ANSI
            # division-by-zero). NULL matches the oracle's sum-over-
            # empty NULL propagation.
            F.when(
                F.col("n_paths2") > 0,
                F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_paths2"), 6),
            ).alias("transitivity"),
        )
    )
