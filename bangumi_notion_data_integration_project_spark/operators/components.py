"""Connected components over a pair list — transitive dedup clusters.

LSH/SimHash emit near-duplicate *pairs*; keeping one document per
*cluster* needs the transitive closure (a~b, b~c → {a,b,c} is one
group). This is the standard large-scale formulation: iterative
min-label propagation over the edge list until fixpoint — each round
every node adopts the smallest label among itself and its neighbors.
Rounds = graph diameter (near-dup clusters are shallow, so typically
2-4), each round is one join + one aggregation on the edge list.

Scale notes: the edge list never leaves the cluster, labels are 8-byte
ids, and every iteration re-uses the same (node → label) partitioning.
``localCheckpoint`` truncates the growing lineage each round — without
it, plan depth doubles per iteration and the driver re-optimizes an
exponentially larger tree.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


class ConvergenceError(RuntimeError):
    """Label propagation exhausted ``max_iterations`` while labels were
    still changing — component assignments may be wrong (a long chain of
    near-dup docs, e.g. templated boilerplate series, exceeds the
    iteration budget). Silent wrong output here corrupts keeper
    selection downstream, so the default is to fail loudly."""


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Return (node, component) where component is the smallest node id
    reachable from ``node``. Nodes appear iff they occur in an edge.

    ``on_nonconverged`` controls what happens if the fixpoint is not
    reached within ``max_iterations`` rounds (i.e. the last round still
    changed labels): ``"raise"`` (default) raises :class:`ConvergenceError`;
    ``"flag"`` logs a warning and returns the partial labels with an
    extra boolean ``converged`` column (False everywhere) so callers
    that prefer degraded output over failure can quarantine it.
    """
    if on_nonconverged not in ("raise", "flag"):
        raise ValueError(f"on_nonconverged must be 'raise' or 'flag', got {on_nonconverged!r}")
    # one scan of the (possibly expensive) edge plan: emit both
    # directions with a 2-element explode instead of a union of two
    # selects, which would evaluate the upstream candidate join twice
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .distinct()
        .localCheckpoint(eager=False)  # scanned every round; cut lineage once
    )
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))

    changed = -1  # "no iteration ran" sentinel; 0-edge inputs converge trivially
    for _ in range(max_iterations):
        # each node's candidate: min over its own label and neighbors' labels
        neighbor_min = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        # fold the convergence flag into the same pass: a node changed
        # iff a neighbor offered a strictly smaller label — avoids a
        # second full recompute of the update plan just to count deltas
        updated = labels.join(neighbor_min, "u", "left").select(
            "u",
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                "label"
            ),
            (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label"))
            .cast("long")
            .alias("__changed"),
        )
        chk = updated.localCheckpoint(eager=True)
        changed = chk.agg(F.sum("__changed")).first()[0] or 0  # reads cached blocks
        labels = chk.drop("__changed")
        if changed == 0:
            break

    out = labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
    if changed != 0:
        # the final round still moved labels (or the budget was 0): the
        # fixpoint is unproven, so downstream min-id keeper selection
        # could silently split clusters. Never return that silently.
        msg = (
            f"connected_components did not converge within {max_iterations} "
            f"iterations ({changed} labels still changing); the input graph "
            f"has a component with diameter > {max_iterations}"
        )
        if on_nonconverged == "raise":
            raise ConvergenceError(msg)
        logger.warning("%s — returning partial labels flagged converged=False", msg)
        return out.withColumn("converged", F.lit(False))
    return out


def connected_components_star(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", 2014) — same output contract as
    :func:`connected_components`, different convergence behavior.

    Min-label propagation moves a label ONE hop per round, so rounds =
    component diameter; a templated-boilerplate chain of depth 500
    needs 500 shuffles. The star rounds rewire the graph itself —
    large-star hangs every larger neighbor directly under the local
    minimum, small-star flattens the remainder — so components collapse
    toward a star around their global minimum in O(log²) rounds in the
    worst case (2 rounds for shallow near-dup clusters). Each round is
    two groupBy+join passes on the edge list; edges only ever connect a
    node to a smaller node, so the set shrinks monotonically toward
    (member → component-min) and termination is detected by edge-set
    fixpoint (count + order-independent hash in ONE aggregate).

    Same ``on_nonconverged`` contract as :func:`connected_components`:
    ``"raise"`` (default) or ``"flag"`` (warn + ``converged`` column).
    """
    if on_nonconverged not in ("raise", "flag"):
        raise ValueError(f"on_nonconverged must be 'raise' or 'flag', got {on_nonconverged!r}")

    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    all_nodes = sym.select("u").distinct().localCheckpoint(eager=True)

    def _sig(e: DataFrame) -> tuple[int, int]:
        """Order-independent edge-set fingerprint, one aggregate pass."""
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                # decimal sum: order-independent and overflow-free under
                # ANSI (an int64 SUM of xxhash64 values overflows)
                F.sum(
                    F.xxhash64(F.least("u", "v"), F.greatest("u", "v")).cast(
                        "decimal(38,0)"
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    e = sym.localCheckpoint(eager=True)
    prev = _sig(e)
    converged = False
    for _ in range(max_iterations):
        # large-star: hang every neighbor v > u under m(u) = min(Γ(u) ∪ {u})
        mins = e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            e.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # every edge is re-emitted from its smaller endpoint's
        # neighborhood (v ∈ Γ⁺(u)), so no node is orphaned: a node with
        # only-larger neighbors emits its own edges, a node with a
        # smaller neighbor is re-attached by that neighbor's emission
        e1 = (
            large.select(
                F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
            )
            .distinct()
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                        F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                    )
                ).alias("__e")
            )
            .select("__e.u", "__e.v")
        )
        # small-star: flatten the ≤-neighborhood onto its minimum
        smaller = e1.filter(F.col("v") < F.col("u"))
        minsS = smaller.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            smaller.join(minsS, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias("p"), F.col("m").alias("q")),
                        F.struct(F.col("v").alias("p"), F.col("m").alias("q")),
                    )
                ).alias("__e")
            )
            .select("__e.p", "__e.q")
            .filter(F.col("p") != F.col("q"))
            .select(
                F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b")
            )
            .distinct()
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                        F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                    )
                ).alias("__e")
            )
            .select("__e.u", "__e.v")
        )
        e = small.localCheckpoint(eager=True)
        sig = _sig(e)
        if sig == prev:
            converged = True
            break
        prev = sig

    # at fixpoint every component is a star on its minimum: a node's
    # component is its smallest neighbor (or itself for singletons-in-
    # edge-list, which cannot occur after symmetrization, and centers)
    labels = (
        all_nodes.join(
            e.groupBy("u").agg(F.min("v").alias("__mn")), "u", "left"
        )
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.coalesce("__mn", F.col("u"))).alias("component"),
        )
    )
    if not converged:
        msg = (
            f"connected_components_star did not reach an edge-set fixpoint "
            f"within {max_iterations} iterations"
        )
        if on_nonconverged == "raise":
            raise ConvergenceError(msg)
        logger.warning("%s — returning partial labels flagged converged=False", msg)
        return labels.withColumn("converged", F.lit(False))
    return labels


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    *,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    on_nonconverged: str = "raise",
    algorithm: str = "minlabel",
) -> DataFrame:
    """Cluster assignment for every row: near-dup groups collapse to
    their minimum id; singletons keep their own id. The downstream
    "keep one per cluster" is then ``filter(id == cluster_id)``.

    ``algorithm``: ``"minlabel"`` (default — 1 join/round, rounds =
    cluster diameter; near-dup clusters are shallow so this wins) or
    ``"star"`` (:func:`connected_components_star` — ~2× work/round but
    O(log²) rounds; pick it when clusters can chain deep, e.g.
    templated boilerplate series)."""
    if algorithm not in ("minlabel", "star"):
        raise ValueError(f"algorithm must be 'minlabel' or 'star', got {algorithm!r}")
    impl = connected_components if algorithm == "minlabel" else connected_components_star
    comp = impl(
        pairs,
        src=src,
        dst=dst,
        max_iterations=max_iterations,
        on_nonconverged=on_nonconverged,
    )
    out = all_ids.join(comp, all_ids[id_col] == comp["node"], "left").select(
        all_ids[id_col],
        F.coalesce(comp["component"], all_ids[id_col]).alias("cluster_id"),
        # propagate the non-convergence flag when "flag" mode tripped:
        # rows outside any pair are trivially converged singletons
        *(
            [F.coalesce(comp["converged"], F.lit(True)).alias("converged")]
            if "converged" in comp.columns
            else []
        ),
    )
    return out
