"""Hampel filter — rolling-median/MAD outlier detection over an
ordered integer series, the robust time-series cleaning pass (a point
is an outlier when it sits more than ``n_mads`` median-absolute-
deviations from the rolling median).

Everything is EXACT integer work end to end: the rolling median is the
lower order statistic at rank ``ceil(m/2)`` of the sorted window (the
``runs_test`` median convention — no interpolation), the MAD is the
same order statistic of the absolute deviations, and the outlier test
``|x − med| > n_mads · mad`` compares integers when ``n_mads`` is an
integer — so both engines agree bit-for-bit with no float anywhere.

Input contract (the ``km_survival``/``holt_linear`` family rule): feed
the per-period aggregate — one row per (key,) day/hour — so the
ordered windows are calendar-bounded, never data-bounded. With
``group_cols`` every window partitions by the key; without, the single
partition holds one bounded series.

Degenerate behavior is explicit: rows without a full window report
NULL med/mad/outlier (the ``orders_seasonal_decompose`` edge-row
convention), and a locally-constant window has mad = 0, so ANY
deviation flags — the textbook Hampel behavior on flat segments.
A NULL ``x`` anywhere in the window makes the window NOT full
(fullness gates on ``count(x)``, which skips NULLs, never on
``count(*)``) — so a NULL can never silently shift the order
statistic; every neighboring row reports NULL med/mad/outlier,
exactly like an edge row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hampel_outliers(
    df: DataFrame,
    order_col: str,
    x_col: str,
    *,
    group_cols: "list[str] | None" = None,
    half_window: int = 3,
    n_mads: int = 3,
) -> DataFrame:
    """One row per input row: ``(group..., order, x, med, mad,
    deviation, is_outlier)``; med/mad/outlier are NULL on rows whose
    centered window is not full."""
    if half_window < 1:
        raise ValueError("half_window must be >= 1")
    if n_mads < 1:
        raise ValueError("n_mads must be >= 1 (integer-exact threshold)")
    groups = list(group_cols or [])
    full = 2 * int(half_window) + 1
    if groups:
        w = (
            Window.partitionBy(*groups)
            .orderBy(order_col)
            .rowsBetween(-half_window, half_window)
        )
    else:
        w = Window.orderBy(order_col).rowsBetween(-half_window, half_window)
    x = F.col(x_col).cast("long")
    arr = F.array_sort(F.collect_list(x).over(w))
    d = df.select(
        *groups,
        F.col(order_col).alias("__o"),
        x.alias("__x"),
        # count(x) skips NULLs: a NULL x inside the window would pass a
        # count(*) gate while collect_list silently dropped it, shifting
        # every rank — gate on non-NULL count so such windows read NULL
        F.when(F.count(x).over(w) == full, arr).alias("__w"),
    )
    # lower median at rank ceil(m/2); m == full here, so the rank is a
    # plan literal — element_at is 1-based
    rank = (full + 1) // 2
    med = F.element_at("__w", rank)
    devs = F.array_sort(
        F.transform(F.col("__w"), lambda v: F.abs(v - med))
    )
    mad = F.element_at(devs, rank)
    dev = F.abs(F.col("__x") - med)
    return d.select(
        *groups,
        F.col("__o").alias(order_col),
        F.col("__x").alias(x_col),
        med.cast("long").alias("med"),
        mad.cast("long").alias("mad"),
        dev.cast("long").alias("deviation"),
        F.when(
            F.col("__w").isNotNull(), dev > F.lit(int(n_mads)) * mad
        ).alias("is_outlier"),
    ).orderBy(*groups, order_col)
