"""2-D skyline (Pareto frontier) as a two-pass declarative plan.

A row is on the skyline when no other row is at least as good on both
criteria and strictly better on one. The general n-D skyline needs a
dominance join (O(n²)); the 2-D case collapses to one aggregation plus
one running-max scan:

1. keep only the best ``maximize`` value per distinct ``minimize``
   value (a dominated row can never outrank its own group's best);
2. scan the survivors in ``minimize`` order — a row survives iff its
   ``maximize`` value strictly exceeds the running max of everything
   cheaper.

Scale shape: the groupBy is a partial+final hash agg. The prefix max
is NOT a single global window (which would funnel every distinct
``minimize`` value through one task); it is computed two-level, like a
distributed prefix sum: range-partition by ``minimize``, take a
partition-local running max with a window keyed on the partition id,
then combine with a per-partition offset table that has exactly one
row per partition (tiny — its prefix max is a broadcast triangular
self-join, so no global-window operator appears anywhere).
Papers on Spark skyline integration motivate the operator; this is the
standard sort-based 2-D algorithm expressed as DataFrame ops, not a
port of any reference code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame, *, minimize: str, maximize: str, num_partitions: int | None = None
) -> DataFrame:
    """Rows Pareto-optimal for (min ``minimize``, max ``maximize``).

    Returns the input columns of the surviving rows. Among duplicates
    of an optimal (minimize, maximize) pair, all copies survive — a
    duplicate is not strictly dominated; filter separately if one
    representative per point is wanted. Criteria columns are assumed
    non-null.
    """
    best = df.groupBy(minimize).agg(F.max(maximize).alias("__best"))

    # Distributed prefix max over `minimize` order.
    if num_partitions:
        best = best.repartitionByRange(num_partitions, minimize)
    else:
        best = best.repartitionByRange(minimize)
    best = best.withColumn("__pid", F.spark_partition_id())

    # Partition-local running max (parallel: window is keyed by __pid;
    # range partitioner assigns ascending ranges to ascending ids).
    w_local = Window.partitionBy("__pid").orderBy(minimize).rowsBetween(
        Window.unboundedPreceding, -1
    )
    best = best.withColumn("__local_prior", F.max("__best").over(w_local))

    # One row per partition → running max over *earlier* partitions.
    # The offsets table is bounded by the partition count, so the
    # prefix max is a broadcast triangular self-join (pid2 < pid), not
    # a global window: P² pairs is trivial even at thousands of
    # partitions, every task stays parallel, and no operator funnels
    # unbounded data through one task.
    pmax = best.groupBy("__pid").agg(F.max("__best").alias("__pmax"))
    earlier = pmax.select(
        F.col("__pid").alias("__pid2"), F.col("__pmax").alias("__pmax2")
    )
    offsets = (
        pmax.join(F.broadcast(earlier), F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.max("__pmax2").alias("__carry"))
    )

    prior = F.greatest(F.col("__local_prior"), F.col("__carry"))
    frontier = (
        best.join(F.broadcast(offsets), "__pid")
        .filter(prior.isNull() | (F.col("__best") > prior))
        # fresh names so the semi join below is between distinct
        # attributes (same-name columns from a self-derived frame make
        # Spark warn about trivially-true predicates)
        .select(F.col(minimize).alias("__sky_min"), F.col("__best").alias("__sky_max"))
    )
    return df.join(
        frontier,
        (df[minimize] == frontier["__sky_min"]) & (df[maximize] == frontier["__sky_max"]),
        "left_semi",
    )
