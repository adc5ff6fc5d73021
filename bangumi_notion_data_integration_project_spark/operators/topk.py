"""Top-K per group (SURVEY §2.6 T1 — the reference's top-5 tags pivot,
generalized).

Window `row_number` is the scalable strategy: one shuffle on the
partition key, no driver-side state, AQE handles skewed groups. For
small k over huge groups Spark pushes a per-partition top-k
(WindowGroupLimit) before the shuffle — verify with .explain().
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
