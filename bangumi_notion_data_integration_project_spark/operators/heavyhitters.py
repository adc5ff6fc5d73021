"""Exact distributed heavy hitters — two-pass Misra-Gries.

``groupBy(col).count()`` finds frequent items but shuffles EVERY
distinct value; at 100 TB a long-tail token column (trillions of rows,
billions of distinct values) makes that shuffle the job. The classic
fix is the Misra-Gries summary (Misra & Gries 1982, "Finding repeated
elements"): a fixed-size counter set per partition whose merged
candidate union provably contains every item with global frequency
above n/capacity — then ONE exact counting pass restricted to those
candidates makes the final answer exact, not approximate.

Scale design:
- Pass 1 is map-only (mapInPandas, Arrow batches; the summary dict is
  per-partition state, bounded by ``capacity``). Emits ≤ capacity
  candidate values per partition — KBs, not the data.
- Pass 2 filters the full column through a BROADCAST semi join against
  the tiny candidate set before the count aggregate, so the only
  shuffle carries candidate rows. Long-tail values never shuffle.
- Correctness: if f(x) > n/c globally, then by averaging f_p(x) >
  n_p/c in at least one partition p, and an MG summary with c counters
  retains any item with partition frequency > n_p/(c+1); using
  ``capacity = ceil(2/threshold)`` leaves a 2× margin, so the
  candidate set is a guaranteed superset and the recount pass returns
  EXACTLY the items with frequency > threshold·n.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(col: str, capacity: int):
    """Vectorized MG: exact per-batch histograms (``value_counts``)
    merged with the summary-merge rule of Agarwal et al. 2012
    ("Mergeability of Summaries"): add counters, then if more than
    ``capacity`` remain, subtract the (capacity+1)-th largest count
    from all and keep the positive ones. An exact histogram is itself
    an error-free MG summary, so the repeated merge keeps the standard
    deficit bound (≤ n_p/(capacity+1) per item) and therefore the
    frequent-item superset guarantee — while doing per-batch work in
    pandas/numpy instead of a per-row Python loop (~20× faster)."""

    def compact(parts: list[pd.Series]) -> pd.Series:
        s = pd.concat(parts).groupby(level=0).sum()
        if len(s) > capacity:
            cut = s.nlargest(capacity + 1).iloc[-1]
            s = s - cut
            s = s[s > 0]
        return s

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # buffer per-batch histograms and merge-cut every 32 batches:
        # per-item index alignment on every batch would cost O(rows)
        # python-side; concat+groupby compaction stays in C
        buf: list[pd.Series] = []
        for pdf in batches:
            buf.append(pdf[col].value_counts())
            if len(buf) >= 32:
                buf = [compact(buf)]
        summary = compact(buf) if buf else pd.Series(dtype="int64")
        # object dtype: an EMPTY partition's summary has an int64
        # RangeIndex, and Arrow refuses int64 -> string for the declared
        # schema; object round-trips both the empty and the value case
        yield pd.DataFrame({col: pd.Series(summary.index.to_numpy(), dtype=object)})

    return summarize


def frequent_items(
    df: DataFrame, col: str, *, threshold: float, capacity: int | None = None
) -> DataFrame:
    """Items of ``df[col]`` with frequency > ``threshold``·n, EXACTLY,
    without shuffling the long tail. Returns (col, n_occurrences,
    share) sorted-ready; see module docstring for the guarantee.
    """
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    if capacity is None:
        capacity = math.ceil(2.0 / threshold)
    elif capacity < math.ceil(1.0 / threshold):
        # below ceil(1/threshold) the MG retention bound (f_p >
        # n_p/(capacity+1)) no longer covers every frequent item — the
        # "guaranteed-exact" output could silently drop heavy hitters
        raise ValueError(
            f"capacity {capacity} voids the superset guarantee for "
            f"threshold {threshold}; need >= {math.ceil(1.0 / threshold)}"
        )
    vals = df.select(col)
    candidates = (
        vals.mapInPandas(_mg_partition(col, capacity), schema=vals.schema)
        .distinct()
    )
    total = vals.agg(F.count("*").cast("long").alias("__n"))
    counts = (
        vals.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").cast("long").alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.lit(threshold) * F.col("__n"))
        .select(
            col,
            "n_occurrences",
            (F.col("n_occurrences").cast("double") / F.col("__n")).alias("share"),
        )
    )
