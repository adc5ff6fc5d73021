"""Top-K per group (SURVEY §2.6 T1 — the reference's top-5 tags pivot,
generalized).

Window `row_number` is the scalable strategy: one shuffle on the
partition key, no driver-side state. For small k over huge groups
Spark pushes a per-partition top-k (WindowGroupLimit) BEFORE the
shuffle — verify with .explain() — which is the first-line skew
mitigation: a hot group ships at most k rows per input partition.
AQE does NOT rebalance skewed window partitions (its skew splitting
applies to sort-merge joins only; measured in SCALING.md's window
probe), so when WindowGroupLimit can't trigger (rank ties, unsupported
orderings) the structural fallback is :func:`top_k_per_group_salted`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the first k rows of each group under the given ordering.

    Include a unique tiebreaker in `order_cols` for deterministic
    results (the driver hash-compares against a SQL oracle).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_k_per_group_salted(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    *,
    n_salts: int,
    tiebreaker: str,
    rank_col: str = "rn",
) -> DataFrame:
    """Two-phase top-k for HOT group keys — the salted-window pattern.

    Phase 1 ranks within (group, salt), so a hot group's rows are
    processed by ``n_salts`` parallel tasks instead of one; each salt
    keeps its local top-k. Phase 2 re-ranks the ≤ n_salts·k survivors
    per group — a trivially small window. The salt is a deterministic
    hash of ``tiebreaker`` (a per-row-distinct column), so the result
    is IDENTICAL to :func:`top_k_per_group` under the same total
    ordering, and the DuckDB oracle is the plain unsalted SQL.

    Measured selection rule (SCALING.md "Salted vs plain top-k"):
    for SMALL k, WindowGroupLimit already prunes the hot group before
    the shuffle and the plain form wins (3 M rows, 90 % skew: 1.6 s vs
    4.5 s); the salted form wins when the survivor set is large
    (k=5000: 1.5 s vs 2.3 s) or the ordering defeats WindowGroupLimit
    (rank ties, percent_rank), where the hot group's sort would
    otherwise serialize in one task.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(F.col(tiebreaker)), F.lit(n_salts))
    )
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop("__salt")
    )
