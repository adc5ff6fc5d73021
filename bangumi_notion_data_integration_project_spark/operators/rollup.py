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


def rollup_refresh_delta(
    stored_rollup: DataFrame | None,
    delta: DataFrame,
    ts_col: str,
    value_cents: Column,
    *,
    grains: tuple[str, ...] = GRAINS,
) -> DataFrame:
    """O(touched) continuous-aggregate refresh: the REPLACEMENT rows
    for only the (grain, bucket) buckets the delta touches.

    A late event touches one day partial; the day row re-folds from
    (stored day row + delta partial), and each coarser grain rebuilds
    ONLY its touched buckets — from the updated day partials, never
    from raw history. Cost is O(|touched days| + |days inside touched
    weeks/months|), independent of both raw-table size and calendar
    length, which is what makes late-data backfill viable on a 100 TB
    fact table: TimescaleDB's continuous-aggregate invalidation model,
    re-expressed as three bounded DataFrame joins.

    Returns the same (grain, bucket_start, n_events, value_cents)
    shape as :func:`hierarchical_time_rollup`, restricted to touched
    buckets. Feed it to :func:`apply_rollup_refresh` for the full
    logical table, or use it as the MERGE source for a
    partition-scoped stored rollup.
    """
    agg = [
        F.count("*").cast("long").alias("n_events"),
        F.sum(value_cents.cast("long")).cast("long").alias("value_cents"),
    ]
    fold = [
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("value_cents").cast("long").alias("value_cents"),
    ]
    delta_day = (
        delta.groupBy(F.to_date(ts_col).alias("bucket_start"))
        .agg(*agg)
        .localCheckpoint(eager=True)  # touched keys + fold + coarse reuse
    )
    touched = delta_day.select("bucket_start")
    old_day = None
    if stored_rollup is not None:
        old_day = stored_rollup.filter(F.col("grain") == "day").select(
            "bucket_start", "n_events", "value_cents"
        )
    day_new = (
        delta_day
        if old_day is None
        else old_day.join(F.broadcast(touched), "bucket_start", "left_semi")
        .unionByName(delta_day)
        .groupBy("bucket_start")
        .agg(*fold)
    ).localCheckpoint(eager=True)  # read once per coarse grain below
    out = day_new.select(
        F.lit("day").alias("grain"), "bucket_start", "n_events", "value_cents"
    )
    for grain in grains[1:]:
        trunc = F.to_date(F.date_trunc(grain, F.col("bucket_start")))
        tb = touched.select(trunc.alias("__cb")).distinct()
        contrib = day_new
        if old_day is not None:
            # stored day rows inside a touched coarse bucket but not
            # themselves touched — day_new already covers the touched
            # ones (including their stored content)
            old_in = old_day.join(
                F.broadcast(tb), trunc == F.col("__cb"), "left_semi"
            ).join(F.broadcast(touched), "bucket_start", "left_anti")
            contrib = old_in.unionByName(day_new)
        out = out.unionByName(
            contrib.groupBy(trunc.alias("bucket_start"))
            .agg(*fold)
            .select(F.lit(grain).alias("grain"), "bucket_start", "n_events", "value_cents")
        )
    return out


def apply_rollup_refresh(
    stored_rollup: DataFrame, refreshed: DataFrame
) -> DataFrame:
    """Replace the touched (grain, bucket) rows of a stored rollup with
    :func:`rollup_refresh_delta`'s output — the logical-table form of
    the partition-scoped MERGE (untouched rows pass through unscanned
    in the partitioned storage layout; here they pass through one
    anti join)."""
    keep = stored_rollup.select(
        "grain", "bucket_start", "n_events", "value_cents"
    ).join(
        F.broadcast(refreshed.select("grain", "bucket_start")),
        ["grain", "bucket_start"],
        "left_anti",
    )
    return keep.unionByName(
        refreshed.select("grain", "bucket_start", "n_events", "value_cents")
    )
