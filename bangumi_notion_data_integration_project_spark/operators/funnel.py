"""Ordered funnel analysis over an event stream.

"Which entities completed step 1, then step 2 strictly later, then
step 3 strictly later…" — the standard conversion-funnel question. The
naive formulation is one self-join per step; this operator computes an
arbitrary-length funnel with chained conditional-min windows over ONE
partition spec, so Catalyst plans a single sort/exchange on the entity
key regardless of funnel depth (each step's window reuses the previous
sort). No self-joins, no per-entity event collection.

Semantics: step i is reached at the EARLIEST event of that type that is
strictly later than the step i-1 timestamp (greedy-earliest matching —
the standard funnel definition; it maximizes completion because
choosing any later step-i event can only shrink the window for step
i+1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    key: str,
    ts: str,
    step_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Per-entity first-completion timestamp of every funnel step.

    Returns one row per entity: ``(key, step_0, step_1, …)`` where
    ``step_i`` is the timestamp the entity reached step i (NULL from
    the first missed step onward — the strictly-later chaining makes
    NULLs propagate automatically).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(key)
    cur = df
    prev: str | None = None
    for i, step in enumerate(steps):
        cond: Column = F.col(step_col) == step
        if prev is not None:
            cond = cond & (F.col(ts) > F.col(prev))
        name = f"step_{i}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col(ts))).over(w))
        prev = name
    names = [f"step_{i}" for i in range(len(steps))]
    return cur.groupBy(key).agg(
        *[F.max(n).alias(n) for n in names]
    )


def funnel_counts(
    df: DataFrame,
    key: str,
    ts: str,
    step_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel summary: one row per step with the number of entities
    that reached it, plus the total entity count at step_index -1.

    Shape ``(step_index, step, n_reached)`` — step_index -1 carries the
    denominator ('entered the funnel') so conversion rates divide out
    of one result set.
    """
    times = funnel_times(df, key, ts, step_col, steps)
    rows = [
        F.struct(
            F.lit(-1).alias("step_index"),
            F.lit("total").alias("step"),
            F.count("*").cast("long").alias("n_reached"),
        )
    ]
    for i, step in enumerate(steps):
        rows.append(
            F.struct(
                F.lit(i).alias("step_index"),
                F.lit(step).alias("step"),
                F.count(f"step_{i}").cast("long").alias("n_reached"),
            )
        )
    return (
        times.agg(F.array(*rows).alias("rows"))
        .select(F.explode("rows").alias("r"))
        .select("r.step_index", "r.step", "r.n_reached")
    )
