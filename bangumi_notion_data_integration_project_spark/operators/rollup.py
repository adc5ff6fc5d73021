"""Hierarchical time-bucket rollup — the "hypertable continuous
aggregate" pattern: coarse grains derive from the finest grain's
partials, never from a re-scan of the raw table.

A naive multi-granularity rollup runs one full scan + shuffle per
grain (or one GROUPING SETS pass that still shuffles every raw row
once per grouping). Here the raw table is scanned ONCE into day-level
partials; week and month then aggregate the day table — thousands of
rows, not billions — so the marginal cost of each extra grain is a
broadcast-sized re-aggregation. This is exactly how TimescaleDB
continuous aggregates and Druid rollup segments are maintained, and
it composes with incremental refresh: a late event touches one day
partial, and the coarser grains rebuild from partials alone.

Exactness: the measure must be an algebraic integer (cents, counts)
so re-aggregating partials is associative — double sums would differ
between day→week→sum and raw→week→sum orderings in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAINS = ("day", "week", "month")


def hierarchical_time_rollup(
    df: DataFrame,
    ts_col: str,
    value_cents: Column,
    *,
    grains: tuple[str, ...] = GRAINS,
) -> DataFrame:
    """One raw scan → day partials → week/month from the partials.

    ``value_cents`` must be an exact-integer column expression (the
    caller owns the fixed-point conversion). Returns
    ``(grain, bucket_start, n_events, value_cents)`` — one row per
    (grain, bucket), dates as DATE so every engine prints them alike.
    """
    if grains[0] != "day":
        raise ValueError("day partials are the base of the hierarchy")
    day = (
        df.groupBy(F.to_date(ts_col).alias("bucket_start"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(value_cents.cast("long")).cast("long").alias("value_cents"),
        )
        .localCheckpoint(eager=False)  # scanned once, read per coarse grain
    )
    out = day.select(
        F.lit("day").alias("grain"), "bucket_start", "n_events", "value_cents"
    )
    for grain in grains[1:]:
        coarse = (
            day.groupBy(
                F.to_date(F.date_trunc(grain, "bucket_start")).alias("bucket_start")
            )
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("value_cents").cast("long").alias("value_cents"),
            )
            .select(F.lit(grain).alias("grain"), "bucket_start", "n_events", "value_cents")
        )
        out = out.unionByName(coarse)
    return out
