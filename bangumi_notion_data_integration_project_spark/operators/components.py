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


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    *,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Cluster assignment for every row: near-dup groups collapse to
    their minimum id; singletons keep their own id. The downstream
    "keep one per cluster" is then ``filter(id == cluster_id)``."""
    comp = connected_components(
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
