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


def trimmed_mean(
    df: DataFrame,
    x_col: str,
    *,
    trim: float = 0.1,
    winsorize: bool = False,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Exact trimmed (or winsorized) mean over an integer column — the
    robust location estimate that pairs with the Hampel filter's
    robust outlier test (quality-score aggregation that one viral
    garbage document cannot drag):

        k = floor(trim · n)   (cut from EACH tail; computed in EXACT
                               integer arithmetic — trim scales to
                               parts-per-million on the driver, so the
                               IEEE product 0.29·100 = 28.999…96 can
                               never under-trim)
        trimmed:    mean of the values ranked k+1 .. n−k
        winsorized: tails are CLAMPED to the boundary order statistics
                    instead of dropped, then averaged over all n

    Everything is exact integer work on the DISTINCT-VALUE aggregate
    (the psi/_ranked_distinct scale contract — raw rows reduce
    map-side first, so the single ordered window sees O(distinct
    values) rows at any fact volume): per value, the kept mass is the
    overlap of its cumulative rank span [cum−c+1, cum] with the kept
    interval [k+1, n−k] (plus, when winsorizing, clamped tail mass at
    the two boundary values), and the numerator Σ v·kept accumulates
    in DECIMAL(38,0). The mean is ONE double division — bit-equal
    across engines. Returns one row per group: ``(group..., n_points,
    n_trimmed_each, mean)``. The kept interval n − 2·floor(trim·n) is
    ≥ 1 for every trim < ½, so the mean is always defined (the
    __kept > 0 guard is belt-and-braces). ``trim`` must be in
    [0, 0.5); NULL x and NULL group keys raise (the psi convention)."""
    if not (0.0 <= float(trim) < 0.5):
        raise ValueError("trim must be in [0, 0.5)")
    from .drift import _checked_keys, _ranked_distinct

    groups = list(group_cols or [])
    op = "winsorized_mean" if winsorize else "trimmed_mean"
    if groups:
        df = _checked_keys(df, groups, op_name=op)
    # the SHARED distinct-value + cumulative-rank chain (drift.
    # _ranked_distinct) — one implementation carries the O(distinct-
    # values) window promise and its plan pin for both psi and this
    ranked = _ranked_distinct(
        df, F.col(x_col), groups or None, where="input", op_name=op
    )
    if groups:
        w_n = Window.partitionBy(*groups)
    else:
        w_n = Window.partitionBy()
    cum = ranked.withColumn(
        "__n", F.sum("__c").over(w_n).cast("long")
    ).withColumn("__cum", F.col("__cum").cast("long"))
    n = F.col("__n")
    # k = floor(trim·n) in EXACT integer arithmetic: the double product
    # trim*n can round just below an integral value (0.29*100 =
    # 28.999999999999996 → k=28, silently under-trimming — the review
    # find). trim is scaled to parts-per-million on the driver, so
    # k = (t6·n) div 10⁶ is exact for any 6-decimal trim; bound: t6·n
    # < 2⁶³ holds past 10¹³ rows per group.
    t6 = int(round(float(trim) * 1_000_000))
    k = (
        F.floor(
            (F.lit(t6) * n).cast("decimal(38,0)")
            / F.lit(1_000_000).cast("decimal(7,0)")
        )
        .cast("long")
    )
    lo, hi = k + 1, n - k  # kept rank interval, inclusive
    span_lo = F.col("__cum") - F.col("__c") + 1
    span_hi = F.col("__cum")
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(span_hi, hi) - F.greatest(span_lo, lo) + 1,
    ).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    if winsorize:
        # tail mass clamps to the boundary order statistics: the value
        # at rank lo absorbs the k low ranks, the value at rank hi the
        # k high ranks (exact per-value membership tests on the span)
        is_lo_bound = (span_lo <= lo) & (span_hi >= lo)
        is_hi_bound = (span_lo <= hi) & (span_hi >= hi)
        extra = F.when(is_lo_bound, k).otherwise(F.lit(0)).cast(
            "long"
        ) + F.when(is_hi_bound, k).otherwise(F.lit(0)).cast("long")
        mass = (kept + extra).cast("long")
    else:
        mass = kept
    agg = cum.groupBy(*groups).agg(
        F.max("__n").alias("n_points"),
        F.max(k).cast("long").alias("n_trimmed_each"),
        dec(F.sum(dec(F.col("__v")) * mass)).alias("__num"),
        F.sum(mass).cast("long").alias("__kept"),
    )
    mean = F.col("__num").cast("double") / F.col("__kept").cast("double")
    out = agg.select(
        *groups,
        "n_points",
        "n_trimmed_each",
        F.when(F.col("__kept") > 0, F.round(mean, 6)).alias("mean"),
    )
    return out.orderBy(*groups) if groups else out
