"""Interval analytics via the +1/-1 boundary sweep.

Peak concurrency ("how many intervals overlap at once, per key") is
classically answered with an interval self-join — O(n²) pairs and a
range-join explosion at scale. The sweep form is O(n log n): emit +1 at
each interval start and -1 at each end, sort per key, take the max of
the running sum. One sort shuffle, no joins.

The catch at 100 TB is the sort key: a low-cardinality group key (five
event types) serializes each group's whole history through one task.
``split_by_day=True`` switches to the exact two-phase decomposition:

  1. local running sum per (key, day) — cardinality now |keys|×|days|,
     so no partition outgrows an executor;
  2. per-key prefix sum of each day's NET delta (a tiny |keys|×|days|
     window) gives the carry-in offset for every day;
  3. global running count = local running sum + day's offset.

This is exact for ANY interval length — the sweep operates on boundary
points, and days partition the time axis, so within-day order plus the
prior-days carry reproduces the global prefix sum term by term. Both
modes share tie semantics: the default RANGE window frame sums the
whole peer group at an instant, so a start and an end at the same
timestamp net out identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sweep_points(
    df: DataFrame, key: str, start: Column, end: Column
) -> DataFrame:
    """(key, t, delta) boundary points for intervals [start, end)."""
    starts = df.select(key, start.alias("t"), F.lit(1).alias("delta"))
    ends = df.select(key, end.alias("t"), F.lit(-1).alias("delta"))
    return starts.union(ends)


def peak_concurrency(
    df: DataFrame,
    key: str,
    start: Column,
    end: Column,
    *,
    split_by_day: bool = False,
) -> DataFrame:
    """Max number of concurrently open [start, end) intervals per key.

    Returns ``(key, max_concurrent)``. ``split_by_day`` selects the
    two-phase form whose widest sort partition is one (key, day) cell
    instead of one key — required when keys are low-cardinality at
    scale; bit-identical results (property-tested against the
    single-phase form and a pure-Python sweep).
    """
    pts = sweep_points(df, key, start, end)
    if not split_by_day:
        w = Window.partitionBy(key).orderBy("t")  # default RANGE frame
        cur = F.sum("delta").over(w)
        return (
            pts.withColumn("cur", cur)
            .groupBy(key)
            .agg(F.max("cur").cast("long").alias("max_concurrent"))
        )
    pts = pts.withColumn("day", F.to_date("t"))
    # 1. within-day running sum (partition cardinality |keys|×|days|)
    w_local = Window.partitionBy(key, "day").orderBy("t")
    local = pts.withColumn("local_cur", F.sum("delta").over(w_local))
    # 2. carry-in offset: per-key prefix sum of prior days' net deltas
    #    over the tiny (key, day) table
    net = pts.groupBy(key, "day").agg(F.sum("delta").alias("net"))
    w_days = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = net.select(
        key,
        "day",
        F.coalesce(F.sum("net").over(w_days), F.lit(0)).alias("offset"),
    )
    # 3. global running count = local + carry-in; join is on (key, day),
    #    the same partitioning the local window just established
    return (
        local.join(offsets, [key, "day"])
        .withColumn("cur", F.col("local_cur") + F.col("offset"))
        .groupBy(key)
        .agg(F.max("cur").cast("long").alias("max_concurrent"))
    )


def interval_coverage(
    df: DataFrame,
    key: str,
    start_s: Column,
    duration_s: int,
    order_cols: "list[str]",
) -> DataFrame:
    """Union length of fixed-length intervals ``[s, s+duration_s)`` per
    key, in whole integer time units — "how many seconds was this user
    actually active", with overlapping activity windows counted once.

    The merge-overlaps pass is the running-max-of-end trick, not a
    self-join: ordered by start, an interval's NEW contribution is the
    part of it past the furthest end seen so far,

        covered_i = max(0, e_i - max(s_i, max_{j<i} e_j))

    which is one ordered window (running max over the preceding frame)
    plus one aggregation — O(n log n) in the sort, zero joins, exact
    integers throughout. ``order_cols`` must make (key, start,
    order_cols) a total order so every engine walks rows identically
    (equal-start rows are symmetric in the formula, but determinism is
    cheap). Returns ``(key, n_rows, n_intervals, covered_s)`` where
    ``n_intervals`` counts the merged maximal runs.

    Scale shape: one shuffle on the key for the window sort, one
    map-side-combinable groupBy. Low-cardinality keys at 100 TB want
    the same day-split decomposition as :func:`peak_concurrency`;
    per-user keys (the common case) are naturally fine.
    """
    e = df.withColumn("__s", start_s.cast("long")).withColumn(
        "__e", (F.col("__s") + F.lit(int(duration_s))).cast("long")
    )
    w_prev = (
        Window.partitionBy(key)
        .orderBy("__s", *order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = e.withColumn("__pmax", F.max("__e").over(w_prev))
    covered = F.greatest(
        F.lit(0).cast("long"),
        F.col("__e")
        - F.greatest(F.col("__s"), F.coalesce(F.col("__pmax"), F.col("__s"))),
    )
    # strict >: a window starting exactly where the furthest end stops
    # touches it, and touching windows union into ONE maximal run
    new_iv = (
        F.col("__pmax").isNull() | (F.col("__s") > F.col("__pmax"))
    ).cast("long")
    return (
        scored.withColumn("__cov", covered)
        .withColumn("__new", new_iv)
        .groupBy(key)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("__new").cast("long").alias("n_intervals"),
            F.sum("__cov").cast("long").alias("covered_s"),
        )
    )
