"""One-pass distributed statistics from EXACT integer sufficient stats.

Closed-form simple linear regression and pairwise Pearson correlation,
computed the way they must be computed on a cluster: a single
``groupBy`` over exact-integer-valued columns, with every moment
(n, Σx, Σy, Σx², Σy², Σxy) accumulated as DECIMAL(38,0) so the partial
aggregates are EXACT no matter how Spark splits or reorders them.

Why integers: float moment sums are order-dependent (a+b+c ≠ c+a+b in
FP), so the same query returns last-ulp-different slopes on different
partitionings — and diverges from any other engine. Fixed-point inputs
(cents, basis points, integral quantities) make every sufficient
statistic a single exact integer; the final slope/corr is then ONE
deterministic double expression of those integers, bit-identical across
partition counts, AQE decisions, and engines. Callers cast upstream
(``(price*100)::long``) and own the unit bookkeeping.

Scale design (100 TB):
- One shuffle total, fully map-side-combinable: each task emits 6
  decimals per (group, pair), the reduce adds them. No second pass, no
  window, no collect. This is the textbook "algebraic aggregate".
- All K·6 moments for K variable pairs ride in the SAME aggregate pass
  (one scan), so adding pairs costs bandwidth, not passes.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# DECIMAL(38,0) holds ±10³⁸. The binding bound is the COVARIANCE-TERM
# products n·Σxy, n·Σx², n·Σy² (computed exactly in decimal before the
# double cast): each is ≤ n²·max|x·y|, so exactness requires
#     n² · max|x| · max|y|  <  10³⁸.
# Cents×quantity (10⁷·10²) holds to n ≈ 10¹⁴ rows; two 10⁹-scale
# columns hold to n ≈ 10¹⁰ — past that, Spark's non-ANSI decimal
# overflow silently NULLs the group. Pre-scale the units (drop basis
# points to percent, cents to dollars-decimal) before crossing that
# line. The r² denominator product of the two exact factors can always
# exceed 10³⁸, so the factors are cast to double FIRST and multiplied
# in FP — exact integers at cast time, hence engine-identical.
_DEC = "decimal(38,0)"


def _moments(x: Column, y: Column) -> dict[str, Column]:
    xd = x.cast(_DEC)
    yd = y.cast(_DEC)
    return {
        "n": F.count("*").cast(_DEC),
        "sx": F.sum(xd),
        "sy": F.sum(yd),
        "sxx": F.sum(xd * xd),
        "syy": F.sum(yd * yd),
        "sxy": F.sum(xd * yd),
    }


def _cov_terms(m: str) -> tuple[Column, Column, Column]:
    """(n·Σxy−ΣxΣy, n·Σx²−(Σx)², n·Σy²−(Σy)²) as exact decimals."""
    n, sx, sy = F.col(f"{m}n"), F.col(f"{m}sx"), F.col(f"{m}sy")
    sxx, syy, sxy = F.col(f"{m}sxx"), F.col(f"{m}syy"), F.col(f"{m}sxy")
    return (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)


def ols_fit(
    df: DataFrame,
    group_cols: Sequence[str],
    x: str,
    y: str,
) -> DataFrame:
    """Per-group simple OLS of ``y`` on ``x`` (both exact-integer
    columns): returns group cols + ``n``, ``slope``, ``intercept``,
    ``r2`` — slope/intercept in the input units, each a deterministic
    double derived from exact integer moments (see module docstring).

    slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²);  intercept = (Σy−slope·Σx)/n;
    r² = (nΣxy−ΣxΣy)² / ((nΣx²−(Σx)²)(nΣy²−(Σy)²)).
    Groups with zero x-variance get NULL slope/intercept/r².
    """
    agg = df.groupBy(*group_cols).agg(
        *[c.alias(k) for k, c in _moments(F.col(x), F.col(y)).items()]
    )
    num, dx, dy = _cov_terms("")
    numd, dxd, dyd = num.cast("double"), dx.cast("double"), dy.cast("double")
    slope = F.when(dx != 0, numd / dxd)
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col(
        "n"
    ).cast("double")
    r2 = F.when((dx != 0) & (dy != 0), numd * numd / (dxd * dyd))
    return agg.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def corr_pairs(
    df: DataFrame,
    pairs: Sequence[tuple[str, str]],
) -> DataFrame:
    """Whole-table Pearson correlation for each (x, y) pair of
    exact-integer columns, ALL pairs in one aggregate pass over one
    scan. Returns (var_x, var_y, n, corr) — one row per pair, corr a
    deterministic double (NULL when either side has zero variance).
    """
    aggs: list[Column] = []
    for i, (x, y) in enumerate(pairs):
        for k, c in _moments(F.col(x), F.col(y)).items():
            aggs.append(c.alias(f"p{i}_{k}"))
    wide = df.agg(*aggs)
    rows = []
    for i, (x, y) in enumerate(pairs):
        num, dx, dy = _cov_terms(f"p{i}_")
        numd, dxd, dyd = num.cast("double"), dx.cast("double"), dy.cast("double")
        corr = F.when(
            (dx != 0) & (dy != 0), numd / F.sqrt(dxd * dyd)
        )
        rows.append(
            F.struct(
                F.lit(x).alias("var_x"),
                F.lit(y).alias("var_y"),
                F.col(f"p{i}_n").cast("long").alias("n"),
                corr.alias("corr"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def cusum_peaks(
    df: DataFrame,
    key: str,
    order_col: str,
    x: Column,
) -> DataFrame:
    """Exact CUSUM change-point detection per key, in closed form.

    The textbook upward CUSUM is the recursion S_t = max(0, S_{t-1} +
    (x_t - mu)) — not a window aggregate. But it has a closed form:
    with drift-adjusted prefix sums P_t = sum_{i<=t}(x_i - mu),

        S_t = P_t - min(0, min_{j<=t} P_j)

    (induction: max(0, P_{t-1} - m_{t-1} + y_t) = P_t - min(P_t,
    m_{t-1}) and m_{t-1} <= 0). Running sum + running min are both
    ONE ordered window over the key — the recursion distributes.

    Exactness across engines: mu = total/n is fractional, so everything
    is scaled by n: y'_t = n*x_t - total, an exact integer; S' = n*S.
    The peak row is picked by row_number over (S' desc, order asc) —
    a total order, so ties resolve identically everywhere.

    ``x`` is summed into one exact-integer value per (key, period)
    first — pass ``F.lit(1)`` for per-period counts. Returns
    (key, peak_<order_col>, peak_stat, n_periods) where peak_stat is
    the integer n-scaled CUSUM maximum.
    """
    from pyspark.sql import Window

    per_t = df.groupBy(key, F.col(order_col).alias("__t")).agg(
        F.sum(x.cast("long")).cast("long").alias("__x")
    )
    totals = per_t.groupBy(key).agg(
        F.count("*").alias("__n"), F.sum("__x").alias("__total")
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        per_t.join(totals, key)
        .withColumn("__y", F.col("__n") * F.col("__x") - F.col("__total"))
        .withColumn("__p", F.sum("__y").over(w))
        .withColumn(
            "__s", F.col("__p") - F.least(F.lit(0).cast("long"), F.min("__p").over(w))
        )
    )
    w_peak = Window.partitionBy(key).orderBy(F.col("__s").desc(), F.col("__t").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w_peak))
        .filter(F.col("__rk") == 1)
        .select(
            key,
            F.col("__t").alias(f"peak_{order_col}"),
            F.col("__s").cast("long").alias("peak_stat"),
            F.col("__n").cast("long").alias("n_periods"),
        )
    )


def _km_steps(df: DataFrame, groups: "list[str]", duration_col: str, event_col: str) -> DataFrame:
    """Shared Kaplan-Meier construction (see :func:`km_survival` for
    the statistics): one implementation parameterized by the grouping
    columns so the global and grouped operators can never diverge on
    the conventions (events-before-censoring, n_events>0 steps, the
    ordered collect_list product fold, round at 1e-6)."""
    from pyspark.sql import Window

    per_t = df.groupBy(*groups, F.col(duration_col).alias("__t")).agg(
        F.count("*").cast("long").alias("__ends"),
        F.sum(F.col(event_col).cast("long")).cast("long").alias("n_events"),
    )
    if groups:
        total = per_t.groupBy(*groups).agg(
            F.sum("__ends").cast("long").alias("__total")
        )
        based = per_t.join(total, groups)
        w_prev = (
            Window.partitionBy(*groups)
            .orderBy("__t")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_cum = (
            Window.partitionBy(*groups)
            .orderBy("__t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        total = per_t.agg(F.sum("__ends").cast("long").alias("__total"))
        based = per_t.crossJoin(F.broadcast(total))
        w_prev = Window.orderBy("__t").rowsBetween(
            Window.unboundedPreceding, -1
        )
        w_cum = Window.orderBy("__t").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    at_risk = based.withColumn(
        "n_at_risk",
        (
            F.col("__total")
            - F.coalesce(F.sum("__ends").over(w_prev), F.lit(0))
        ).cast("long"),
    )
    factors = (
        at_risk.filter(F.col("n_events") > 0)
        .withColumn(
            "__f", F.lit(1.0) - F.col("n_events") / F.col("n_at_risk")
        )
        .withColumn("__fl", F.collect_list("__f").over(w_cum))
    )
    return factors.select(
        *groups,
        F.col("__t").alias(duration_col),
        "n_at_risk",
        "n_events",
        F.round(
            F.aggregate("__fl", F.lit(1.0), lambda a, x: a * x), 6
        ).alias("survival"),
    ).orderBy(*groups, duration_col)


def km_survival(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival estimate over right-censored durations.

    Input: one row per subject with an integer ``duration_col`` and
    ``event_col`` = 1 if the terminal event was OBSERVED at that
    duration, 0 if the subject was censored there (still alive when
    observation ended). Output: one row per distinct duration with at
    least one observed event — the classic KM step table
    ``(duration, n_at_risk, n_events, survival)`` where

        S(t) = prod_{t' <= t} (1 - d_{t'} / n_{t'})

    with d = observed events at t' and n = subjects whose duration is
    >= t' (events at t happen before censorings at t, the standard
    convention).

    Scale shape: the raw table collapses to one row per DISTINCT
    duration in a single map-side-combinable groupBy; every window
    below runs on that aggregate, which is calendar-bounded (days of
    observation), not data-bounded. The cumulative product is a
    per-row ordered fold over ``collect_list`` of the ≤O(durations)
    factor list — NOT exp(sum(log)): the fold multiplies the same
    doubles in the same order in any engine (and any partitioning),
    so results are bit-identical, where a float log-sum is
    order-dependent. Single-partition windows are safe here for the
    same reason the sketch extractors' are: the input is the bounded
    aggregate, never raw rows.
    """
    return _km_steps(df, [], duration_col, event_col)


def km_survival_grouped(
    df: DataFrame,
    group_cols: "list[str]",
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Per-group Kaplan-Meier: one survival step table per key (churn
    curves per segment/cohort). Same construction as
    :func:`km_survival` — literally the same code path, parameterized
    by the group columns — with every window partitioned by the key,
    so no task ever holds more than one group's duration-bounded
    aggregate (differential-tested against the global operator per
    group)."""
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must name at least one column")
    return _km_steps(df, groups, duration_col, event_col)


def segmented_trend(
    df: DataFrame,
    order_col: str,
    y_col: str,
    *,
    min_seg: int = 3,
) -> DataFrame:
    """Two-segment least-squares changepoint fit over an ordered,
    integer-valued series: find the breakpoint k that minimizes
    SSE(rows 1..k fit) + SSE(rows k+1..n fit), with the x-axis the row
    index (uniform spacing).

    Distributed shape: ONE ordered window pass accumulates the prefix
    moments (Σt, Σy, Σt², Σty, Σy² — all exact integers in
    DECIMAL(38,0)); every candidate breakpoint's two SSEs are then
    CLOSED-FORM expressions of the prefix row and the broadcast totals
    (suffix moment = total − prefix), so evaluating all n−2·min_seg+1
    candidates costs one projection, not n regressions. The argmin is
    a row_number under a (sse, k) total order. The input must already
    be the per-period aggregate (one row per day/week/...) — the
    window is single-partition ON PURPOSE, bounded by the calendar,
    never by raw data volume.

    Exactness across engines: every moment is an exact integer; each
    SSE is m·SSE = A − B²/C with A = m·Σy²−(Σy)², B = m·Σty−Σt·Σy,
    C = m·Σt²−(Σt)² evaluated in ONE double expression of those
    integers — identical operand bits → identical doubles → identical
    ranking in any engine (ties broken on k). C > 0 whenever m ≥ 2
    because the t values are distinct ranks.

    Returns one row: (breakpoint = ``order_col`` value of the LAST
    point in the left segment, n_points, slope_left, slope_right,
    sse_two, sse_single, rel_reduction); slopes are per-index-step in
    y units. Needs n >= 2*min_seg rows (returns an empty frame below
    that).
    """
    return _segmented_core(df, [], order_col, y_col, min_seg)


def segmented_trend_grouped(
    df: DataFrame,
    group_cols: "list[str]",
    order_col: str,
    y_col: str,
    *,
    min_seg: int = 3,
) -> DataFrame:
    """Per-group two-segment changepoint fit: one breakpoint row per
    key (e.g. a trend break per event type / segment). Same
    construction as :func:`segmented_trend` — literally the same code
    path parameterized by the group columns (the _km_steps pattern, so
    the two can never diverge on conventions) — with every window
    partitioned by the key and the totals joined back per group, so no
    task ever holds more than one group's calendar-bounded aggregate.
    Groups with fewer than 2*min_seg rows produce no row."""
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must name at least one column")
    return _segmented_core(df, groups, order_col, y_col, min_seg)


def _segmented_core(
    df: DataFrame,
    groups: "list[str]",
    order_col: str,
    y_col: str,
    min_seg: int,
) -> DataFrame:
    from pyspark.sql import Window

    if min_seg < 2:
        raise ValueError("min_seg must be >= 2 (a 1-point fit has no slope)")
    if groups:
        w = Window.partitionBy(*groups).orderBy("__o")
    else:
        w = Window.orderBy("__o")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (
        df.select(
            *groups,
            # DECIMAL cast like ols_fit: fractional input rounds (the
            # module contract is integer-valued y; a stray double must
            # not silently TRUNCATE toward zero)
            F.col(order_col).alias("__o"),
            F.col(y_col).cast(_DEC).alias("__y"),
        )
        .withColumn("__t", F.row_number().over(w).cast("long"))
    )
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    pre = (
        d.withColumn("__st", dec(F.sum("__t").over(wc)))
        .withColumn("__sy", dec(F.sum("__y").over(wc)))
        .withColumn("__stt", dec(F.sum(F.col("__t") * F.col("__t")).over(wc)))
        .withColumn(
            "__sty", dec(F.sum(dec(F.col("__t")) * F.col("__y")).over(wc))
        )
        .withColumn(
            "__syy", dec(F.sum(dec(F.col("__y")) * F.col("__y")).over(wc))
        )
        .localCheckpoint(eager=False)  # referenced by tot AND cand below
    )
    # totals = the LAST row's prefix (max_by on __t), NOT max of the
    # prefixes: signed y makes __sy/__sty non-monotone running sums
    tot = pre.groupBy(*groups).agg(
        F.max("__t").alias("__n"),
        F.max_by("__st", "__t").alias("__tst"),
        F.max_by("__sy", "__t").alias("__tsy"),
        F.max_by("__stt", "__t").alias("__tstt"),
        F.max_by("__sty", "__t").alias("__tsty"),
        F.max_by("__syy", "__t").alias("__tsyy"),
    )

    def _sse(m, st, sy, stt, sty, syy):
        a = (m * syy - sy * sy).cast("double")
        b = (m * sty - st * sy).cast("double")
        c = (m * stt - st * st).cast("double")
        return a - b * b / c, b, c

    based = pre.join(tot, groups) if groups else pre.crossJoin(F.broadcast(tot))
    cand = based.filter(
        (F.col("__t") >= F.lit(min_seg))
        & (F.col("__t") <= F.col("__n") - F.lit(min_seg))
    )
    ml = dec(F.col("__t"))
    mr = dec(F.col("__n") - F.col("__t"))
    sse_l, b_l, c_l = _sse(
        ml, F.col("__st"), F.col("__sy"), F.col("__stt"), F.col("__sty"), F.col("__syy")
    )
    sse_r, b_r, c_r = _sse(
        mr,
        F.col("__tst") - F.col("__st"),
        F.col("__tsy") - F.col("__sy"),
        F.col("__tstt") - F.col("__stt"),
        F.col("__tsty") - F.col("__sty"),
        F.col("__tsyy") - F.col("__syy"),
    )
    scored = cand.select(
        *groups,
        "__o",
        "__t",
        "__n",
        (sse_l / ml.cast("double") + sse_r / mr.cast("double")).alias("__sse2"),
        (b_l / c_l).alias("__sl"),
        (b_r / c_r).alias("__sr"),
        "__tst",
        "__tsy",
        "__tstt",
        "__tsty",
        "__tsyy",
    )
    if groups:
        w_min = Window.partitionBy(*groups).orderBy(
            F.col("__sse2").asc(), F.col("__t").asc()
        )
    else:
        w_min = Window.orderBy(F.col("__sse2").asc(), F.col("__t").asc())
    best = scored.withColumn("__rk", F.row_number().over(w_min)).filter(
        F.col("__rk") == 1
    )
    mn = dec(F.col("__n"))
    sse_1, _b1, _c1 = _sse(
        mn, F.col("__tst"), F.col("__tsy"), F.col("__tstt"), F.col("__tsty"), F.col("__tsyy")
    )
    sse_single = sse_1 / mn.cast("double")
    out = best.select(
        *groups,
        F.col("__o").alias("breakpoint"),
        F.col("__n").alias("n_points"),
        F.round(F.col("__sl"), 6).alias("slope_left"),
        F.round(F.col("__sr"), 6).alias("slope_right"),
        F.round(F.col("__sse2"), 4).alias("sse_two"),
        F.round(sse_single, 4).alias("sse_single"),
        # a perfectly-linear series has sse_single == 0 exactly; under
        # Spark 4 ANSI mode the bare division would throw DIVIDE_BY_ZERO
        F.round(
            F.when(
                sse_single > 0.0,
                (sse_single - F.col("__sse2")) / sse_single,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rel_reduction"),
    )
    return out.orderBy(*groups) if groups else out


def pacf_from_acf(acf_df: DataFrame, *, max_lag: int) -> DataFrame:
    """Partial autocorrelation via the Durbin-Levinson recursion, from
    an already-computed autocorrelation table ``(lag, acf)`` (lags
    1..max_lag, e.g. ``revenue_acf``'s output).

    The recursion is inherently sequential in the lag index but the
    input is max_lag rows — a BOUNDED driver-side collect (the same
    budget class as the BPE winner row), never data-scale work; the
    result returns as a max_lag-row DataFrame.

    Determinism contract for a cross-engine oracle: the recursion
    consumes the acf values EXACTLY as stored (already rounded by the
    producer) and performs plain double arithmetic in a fixed order —
    an unrolled SQL replay of the same steps on the same inputs
    reproduces it bit-for-bit (the unrolled-iteration oracle pattern:
    pagerank/k-core/BPE). phi_kk is reported rounded at 1e-6.
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    rows = acf_df.orderBy("lag").collect()
    for row in rows:
        if row["acf"] is None:
            raise ValueError(f"acf is NULL at lag {row['lag']}")
    r = {int(row["lag"]): float(row["acf"]) for row in rows}
    missing = [k for k in range(1, max_lag + 1) if k not in r]
    if missing:
        raise ValueError(f"acf table is missing lags {missing}")
    # Durbin-Levinson: phi[k][k] is the PACF at lag k
    phi_prev: list[float] = []
    out = []
    for k in range(1, max_lag + 1):
        if k == 1:
            phi_kk = r[1]
        else:
            if denom == 0.0:
                raise ValueError(
                    f"degenerate ACF: prediction variance hit 0 before lag {k}"
                    " (|pacf| reached 1 — the process is deterministic)"
                )
            num = r[k]
            for j in range(1, k):
                num = num - phi_prev[j - 1] * r[k - j]
            phi_kk = num / denom
        # for k == 1 the comprehension below is empty, so phi_new ends
        # up [phi_kk] with no special-casing
        phi_new = [
            phi_prev[j - 1] - phi_kk * phi_prev[k - 1 - j] for j in range(1, k)
        ]
        phi_new.append(phi_kk)
        denom = (1.0 - r[1] * r[1]) if k == 1 else denom * (1.0 - phi_kk * phi_kk)
        phi_prev = phi_new
        out.append((k, phi_kk))
    spark = acf_df.sparkSession
    res = spark.createDataFrame(out, "lag long, pacf_raw double")
    return res.select("lag", F.round("pacf_raw", 6).alias("pacf")).orderBy("lag")


def pacf_unrolled_sql(acf_sql: str, max_lag: int) -> str:
    """Generate the DuckDB oracle for :func:`pacf_from_acf`: the
    Durbin-Levinson recursion UNROLLED into a chain of single-row CTEs
    (the pagerank/k-core/BPE unrolled-iteration oracle pattern).

    ``acf_sql`` must be a query yielding ``(lag, acf)`` for lags
    1..max_lag — normally the registered ACF oracle itself, so both
    engines consume bit-identical inputs. Every float operation is
    emitted in EXACTLY the order the Python recursion performs it
    (left-folded numerator subtractions, ``num / denom``,
    ``prev - phi_kk * mirror``, ``v * (1 - phi**2)``), which makes the
    SQL replay bit-for-bit equal: subtraction/division order is
    preserved and IEEE multiplication is commutative at the bit level.

    Contract: VALID input only. On a missing lag or a degenerate ACF
    the operator raises descriptive ValueErrors, while SQL has no
    raise — the generated query would emit NULL pacf from the first
    bad step on. The cross-engine equality claim (and the pinned test)
    covers well-formed ACF tables, which is what a registered oracle
    consumes after the ACF query itself hash-matches.
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    a = ", ".join(
        f"max(CASE WHEN lag = {k} THEN acf END) AS a{k}"
        for k in range(1, max_lag + 1)
    )
    ctes = [f"__acf AS ({acf_sql})", f"__r AS (SELECT {a} FROM __acf)"]
    prev = "__r"
    for k in range(1, max_lag + 1):
        if k == 1:
            ctes.append(
                f"__d1 AS (SELECT *, a1 AS p1_1, 1.0 - a1 * a1 AS v1 FROM {prev})"
            )
            prev = "__d1"
            continue
        num = f"a{k}"
        for j in range(1, k):
            num = f"({num} - p{k - 1}_{j} * a{k - j})"
        ctes.append(
            f"__d{k}a AS (SELECT *, {num} / v{k - 1} AS p{k}_{k} FROM {prev})"
        )
        updates = ", ".join(
            f"p{k - 1}_{j} - p{k}_{k} * p{k - 1}_{k - j} AS p{k}_{j}"
            for j in range(1, k)
        )
        ctes.append(
            f"__d{k} AS (SELECT *, {updates},"
            f" v{k - 1} * (1.0 - p{k}_{k} * p{k}_{k}) AS v{k} FROM __d{k}a)"
        )
        prev = f"__d{k}"
    rows = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS lag, round(p{k}_{k}, 6) AS pacf FROM {prev}"
        for k in range(1, max_lag + 1)
    )
    return "WITH " + ", ".join(ctes) + " " + rows + " ORDER BY lag"


def holt_linear(
    df: DataFrame,
    order_col: str,
    x_col: str,
    *,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizons: Sequence[int] = (1, 7, 30),
) -> DataFrame:
    """Holt's linear (double exponential) smoothing over an ordered
    series: level l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1}), trend
    b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}, initialized l_1 = x_1,
    b_1 = 0. Returns one row: (n_periods, level, trend,
    forecast_h<h>... = level + h·trend, each rounded at 1e-4).

    The recursion is inherently sequential, so the input contract is
    the same as :func:`km_survival`'s: feed the per-period AGGREGATE
    (daily/weekly cents — calendar-bounded), never raw rows. The fold
    runs as one ``aggregate`` over a sort_array'd collect_list — the
    same doubles multiplied in the same order on every partitioning.
    Dyadic defaults (α=1/2, β=1/4) are exact binary fractions, so no
    engine can disagree on the coefficients themselves; a cross-engine
    oracle replays the steps with a recursive CTE (the events_debounce
    pattern — NOT list_reduce: DuckDB 1.0.0 mis-folds struct
    accumulators)."""
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError("alpha in (0,1], beta in [0,1] required")
    # fail loudly on NULL inputs (the file convention, see
    # pacf_from_acf): a null x would silently poison level/trend into
    # permanent NULLs with no trace of the offending period
    return _holt_core(df, [], order_col, x_col, alpha, beta, horizons)


def holt_linear_grouped(
    df: DataFrame,
    group_cols: "list[str]",
    order_col: str,
    x_col: str,
    *,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizons: Sequence[int] = (1, 7, 30),
) -> DataFrame:
    """Per-group Holt's linear smoothing: one (level, trend,
    forecasts) row per key — per-segment forecasts from per-period
    aggregates. Same fold as :func:`holt_linear` through one shared
    core (the _km_steps pattern); each group's ordered array assembles
    under its own key, so no task holds more than one group's
    calendar-bounded series."""
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must name at least one column")
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError("alpha in (0,1], beta in [0,1] required")
    return _holt_core(df, groups, order_col, x_col, alpha, beta, horizons)


def _holt_core(
    df: DataFrame,
    groups: "list[str]",
    order_col: str,
    x_col: str,
    alpha: float,
    beta: float,
    horizons: Sequence[int],
) -> DataFrame:
    x_checked = F.when(
        F.col(x_col).isNull(),
        F.raise_error(
            F.concat(
                F.lit("holt_linear: NULL x value at "),
                F.col(order_col).cast("string"),
            )
        ),
    ).otherwise(F.col(x_col).cast("double"))
    arr = df.groupBy(*groups).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("o"), x_checked.alias("x")))
        ).alias("__a")
    )
    xs = F.transform(F.col("__a"), lambda s: s["x"])
    a, b_ = float(alpha), float(beta)
    init = F.struct(
        # F.get: null (not an ANSI index error) on the empty-input
        # degenerate, which then flows to a null level/trend row with
        # n_periods = 0 — a visible, documented degenerate
        F.get(xs, 0).alias("l"),
        F.lit(0.0).alias("b"),
    )
    def step(acc, x):
        ln = F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"])
        bn = F.lit(b_) * (ln - acc["l"]) + F.lit(1.0 - b_) * acc["b"]
        return F.struct(ln.alias("l"), bn.alias("b"))
    fin = F.aggregate(F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))), init, step)
    out = arr.select(
        *groups,
        F.size("__a").cast("long").alias("n_periods"),
        F.round(fin["l"], 4).alias("level"),
        F.round(fin["b"], 4).alias("trend"),
        *[
            F.round(fin["l"] + F.lit(float(h)) * fin["b"], 4).alias(
                f"forecast_h{h}"
            )
            for h in horizons
        ],
    )
    return out.orderBy(*groups) if groups else out


def runs_test(df: DataFrame, order_col: str, x_col: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of an ordered integer
    series around its median: values are labeled above(1)/below(0) the
    median (ties-with-median dropped, the classic convention), the
    number of RUNS of equal labels is counted, and the normal-
    approximation z-score comes from the exact run-count moments

        mu = 2·n1·n0/n + 1,   sigma² = (mu−1)(mu−2)/(n−1).

    Everything before the final z expression is exact integer work:
    the median is the lower order statistic at rank ceil(n/2) (an
    integer of the input column — no interpolation, so both engines
    agree bit-for-bit), run boundaries come from one lag over the
    ordered aggregate, and n/n1/n0/R are counts. One ordered window
    over the input (which must already be the calendar-bounded
    per-period aggregate, the km_survival contract) and one final
    double expression.
    """
    from pyspark.sql import Window

    d = df.select(
        F.col(order_col).alias("__o"), F.col(x_col).cast("long").alias("__x")
    )
    n_all = d.groupBy().agg(F.count("*").cast("long").alias("__n_all"))
    w_rank = Window.orderBy("__x", "__o")
    ranked = d.crossJoin(F.broadcast(n_all)).withColumn(
        "__r", F.row_number().over(w_rank).cast("long")
    )
    # an AGGREGATE (always exactly one row, null median on empty
    # input) — a filter+select here would produce a zero-row frame
    # whose crossJoin erases the output row entirely
    med = ranked.agg(
        F.max(
            F.when(
                F.col("__r")
                == F.ceil(F.col("__n_all") / F.lit(2)).cast("long"),
                F.col("__x"),
            )
        ).alias("__med")
    )
    lab = (
        d.crossJoin(F.broadcast(med))
        .filter(F.col("__x") != F.col("__med"))
        .select(
            "__o", (F.col("__x") > F.col("__med")).cast("long").alias("__lab")
        )
    )
    w_ord = Window.orderBy("__o")
    runs = lab.withColumn("__prev", F.lag("__lab").over(w_ord)).select(
        "__lab",
        (
            F.col("__prev").isNull() | (F.col("__lab") != F.col("__prev"))
        ).cast("long").alias("__new_run"),
    )
    agg = runs.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum("__lab"), F.lit(0)).cast("long").alias("n_above"),
        F.coalesce(F.sum("__new_run"), F.lit(0)).cast("long").alias("n_runs"),
    )
    n = F.col("n").cast("double")
    n1 = F.col("n_above").cast("double")
    n0 = (F.col("n") - F.col("n_above")).cast("double")
    mu = F.lit(2.0) * n1 * n0 / n + F.lit(1.0)
    var = (mu - F.lit(1.0)) * (mu - F.lit(2.0)) / (n - F.lit(1.0))
    # ANSI mode: every division lives inside a when() VALUE branch
    # whose condition proves the denominator positive (CaseWhen
    # branches evaluate lazily) — n=0 (all ties the median) and n=1
    # would otherwise throw DIVIDE_BY_ZERO. Untestable inputs report
    # NULL expected_runs/z, never a fake "perfectly random" 0.0.
    return agg.crossJoin(F.broadcast(med)).select(
        "n",
        F.col("__med").alias("median"),
        F.col("n_above"),
        (F.col("n") - F.col("n_above")).cast("long").alias("n_below"),
        F.col("n_runs"),
        F.when(F.col("n") > 0, F.round(mu, 6)).alias("expected_runs"),
        F.when(
            F.col("n") > 1,
            F.when(
                var > 0.0,
                F.round(
                    (F.col("n_runs").cast("double") - mu) / F.sqrt(var), 6
                ),
            ),
        ).alias("z"),
    )


def _pair_fanout_grouped(
    a: DataFrame, b: DataFrame, key_cols: "list[str]", salt_col: str
) -> DataFrame:
    """Keyed pairwise self-join with cluster-wide parallelism (guide
    §2.5): the pair frame is calendar-bounded (days² rows per group),
    but the group key has far fewer distinct values than the cluster
    has cores, and the pre-join inputs are so small that AQE's
    partition coalescing folds the whole join into ONE task which
    then pays the n² expansion serially (measured: segment_kendall's
    5-key join ran its ~14M generated pairs on one core). Bucket side
    ``a`` by a deterministic hash of its order key, replicate side
    ``b`` across the buckets, and repartition BOTH sides explicitly
    on (keys, bucket) — a user-specified repartition that AQE does
    not coalesce — so the expansion runs on defaultParallelism tasks.
    The generated pair set is identical (every a-row still meets
    every b-row of its group exactly once) and everything downstream
    is an exact-integer aggregate or a fully-ordered window, so
    results are bit-identical. Scale-adaptive: the bucket count IS
    defaultParallelism (local[8] probes and a 1000-core cluster both
    get their natural fan-out); the replicated side stays bounded
    (days × parallelism rows)."""
    sc = a.sparkSession.sparkContext
    p = max(1, sc.defaultParallelism)
    a2 = a.withColumn(
        "__pb", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(p)).cast("int")
    )
    b2 = b.withColumn(
        "__pb",
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(p - 1).cast("int"))),
    )
    jk = key_cols + ["__pb"]
    return (
        a2.repartition(p, *jk)
        .join(b2.repartition(p, *jk), jk)
        .drop("__pb")
    )


def _pair_fanout_parallelism(a: DataFrame) -> DataFrame:
    """Ungrouped twin of :func:`_pair_fanout_grouped`: the pair join
    is a BroadcastNestedLoopJoin (the small side broadcasts, the
    condition is the `<` pairing), whose parallelism is the STREAM
    side's partition count — after AQE coalescing of the tiny day
    aggregate that is one partition, so one task pays the whole n²
    scan. An explicit round-robin repartition (user-specified → never
    coalesced) spreads it across defaultParallelism tasks; the join
    stays a BNLJ and the pair set is unchanged."""
    sc = a.sparkSession.sparkContext
    return a.repartition(max(1, sc.defaultParallelism))


def mann_kendall(
    df: DataFrame,
    order_col: str,
    x_col: str,
    *,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Mann-Kendall trend test over an ordered integer series — the
    standard nonparametric "is there a monotone trend?" companion to
    the Wald-Wolfowitz randomness test:

        S = Σ_{i<j} sign(x_j − x_i)
        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18
        z = (S−1)/σ if S>0,  0 if S=0,  (S+1)/σ if S<0

    (t = size of each tied-value group; the continuity-corrected
    normal approximation).

    Everything before the final z is exact integer work: S is an
    integer sum of signs over the pairwise inequality self-join, n and
    the tie terms are counts, and Var(S)'s numerator is one integer
    expression — both engines produce identical bits. The input
    contract is the km_survival/holt rule: feed the per-period
    AGGREGATE, so the pairwise join is calendar-bounded (days², fixed
    at any data volume — the revenue_acf precedent), never raw-row-
    scaled. With ``group_cols`` the pair join equi-joins on the key
    first; every group reports a row — pairless groups (single point,
    or all order values duplicated) carry S = 0 and NULL z via the
    var_num guard, never silently vanish. NULL x raises (the
    holt_linear convention)."""
    groups = list(group_cols or [])
    d = _trend_input(df, groups, order_col, x_col, "mann_kendall")
    a = d.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("__o").alias("__oa"),
        F.col("__x").alias("__xa"),
    )
    b = d.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("__o").alias("__ob"),
        F.col("__x").alias("__xb"),
    )
    if groups:
        pairs = _pair_fanout_grouped(
            a, b, [f"__g_{g}" for g in groups], "__oa"
        ).filter(F.col("__oa") < F.col("__ob"))
    else:
        pairs = _pair_fanout_parallelism(a).join(
            F.broadcast(b), F.col("__oa") < F.col("__ob"), "inner"
        )
    s = pairs.groupBy(*[f"__g_{g}" for g in groups]).agg(
        F.sum(F.signum(F.col("__xb") - F.col("__xa")).cast("long"))
        .cast("long")
        .alias("s_stat")
    )
    ties = (
        d.groupBy(*groups, "__x")
        .agg(F.count("*").cast("long").alias("__t"))
        .groupBy(*groups)
        .agg(
            F.sum(
                F.col("__t")
                * (F.col("__t") - 1)
                * (F.lit(2) * F.col("__t") + 5)
            )
            .cast("long")
            .alias("tie_term"),
            F.sum("__t").cast("long").alias("n_points"),
        )
    )
    if groups:
        # LEFT join + coalesce: a single-point group (or one whose
        # order values are all duplicated) produces no pair rows, so an
        # inner join would silently drop it from the monitor — report
        # it with S = 0 instead (z comes out NULL via the var_num
        # guard), and seasonal_mann_kendall's n_seasons/n_points then
        # count every season, matching its pinned oracle
        base = ties.join(
            s.select(
                *[F.col(f"__g_{g}").alias(g) for g in groups], "s_stat"
            ),
            groups,
            "left",
        )
    else:
        base = ties.crossJoin(F.broadcast(s))
    base = base.withColumn(
        "s_stat", F.coalesce(F.col("s_stat"), F.lit(0)).cast("long")
    )
    n = F.col("n_points")
    var_num = (
        n * (n - 1) * (F.lit(2) * n + 5) - F.col("tie_term")
    ).cast("long")
    var_s = var_num.cast("double") / F.lit(18.0)
    sd = F.col("s_stat").cast("double")
    # ANSI: the division lives inside the var>0 VALUE branch (all-tied
    # series and n<2 report NULL z, never DIVIDE_BY_ZERO or a fake 0)
    z = F.when(
        var_num > 0,
        F.when(F.col("s_stat") > 0, (sd - 1.0) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (sd + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    out = base.select(
        *groups,
        "n_points",
        "s_stat",
        "tie_term",
        F.round(var_s, 4).alias("var_s"),
        F.round(z, 6).alias("z"),
    )
    return out.orderBy(*groups) if groups else out


def sen_slope(
    df: DataFrame,
    order_col: str,
    x_col: str,
    *,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Theil-Sen (Sen's slope) robust trend estimate: the median of
    all pairwise slopes (x_j − x_i)/(j − i) over the rank-indexed
    series (uniform spacing — the segmented_trend convention), with
    the intercept the median of x_i − slope·i. The classic partner of
    :func:`mann_kendall` (MK answers "is there a trend", Sen's slope
    "how steep"), immune to the outliers that wreck OLS.

    Both medians are LOWER order statistics at rank ceil(m/2) (the
    runs_test convention — no interpolation): each pairwise slope is
    ONE double division of exact integers, so both engines order
    identical bits identically and pick the identical element. The
    pair frame is calendar-bounded (days², fixed at any data volume);
    the slope median is selected by a distributed two-phase exact
    selection (monotone slope buckets + cumulative offsets, then a
    local sort of only the rank-holding bucket — see the inline note),
    never a single-partition sort of the pair frame; the residual
    median's window runs on the O(n) point frame, partitioned by the
    key when grouped. NULL x raises (the holt_linear convention)."""
    from pyspark.sql import Window

    groups = list(group_cols or [])
    d = _trend_input(df, groups, order_col, x_col, "sen_slope")
    if groups:
        w_t = Window.partitionBy(*groups).orderBy("__o")
    else:
        w_t = Window.orderBy("__o")
    dt = d.withColumn("__t", F.row_number().over(w_t).cast("long"))
    a = dt.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("__t").alias("__ta"),
        F.col("__x").alias("__xa"),
    )
    b = dt.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("__t").alias("__tb"),
        F.col("__x").alias("__xb"),
    )
    if groups:
        pairs = _pair_fanout_grouped(
            a, b, [f"__g_{g}" for g in groups], "__ta"
        ).filter(F.col("__ta") < F.col("__tb"))
    else:
        pairs = _pair_fanout_parallelism(a).join(
            F.broadcast(b), F.col("__ta") < F.col("__tb"), "inner"
        )
    slope = (F.col("__xb") - F.col("__xa")).cast("double") / (
        F.col("__tb") - F.col("__ta")
    ).cast("double")
    ps = pairs.select(
        *[f"__g_{g}" for g in groups], slope.alias("__s"), "__ta", "__tb"
    )
    gcols = [f"__g_{g}" for g in groups]
    # Distributed exact rank selection (r14, guide §2): the old form
    # fed the WHOLE n² pair frame through one fully-ordered row_number
    # window — a single-partition sort per group that re-serialized
    # the parallelism the pair fan-out just bought (measured 4.3 s on
    # the daily 2.9M-pair series). Two-phase selection instead:
    # (1) per-group slope bounds + pair count, (2) a MONOTONE uniform
    # bucket on the slope (same __s ⇒ same bucket; lower bucket ⇒
    # strictly smaller __s, so bucket-major order IS the global
    # order), (3) per-bucket counts → cumulative offsets on the tiny
    # O(groups·buckets) frame, (4) sort ONLY the bucket holding the
    # target rank and pick element (rank − offset) under the identical
    # (__s, __ta, __tb) tie-break — the selected element is
    # bit-identical to the global sort's (pinned by
    # tests/test_trend.py::test_sen_slope_selection_matches_single_sort).
    # An all-equal-slopes group collapses to bucket 0 — the old
    # single-sort shape, correct if slow. Bucket count scales with the
    # session's parallelism (nothing tuned to local[32]).
    sc = df.sparkSession.sparkContext
    nb = max(1, sc.defaultParallelism)
    # the pair frame feeds bounds AND the bucketed selection — pin it
    # (calendar-bounded: days²·width rows at any fact volume)
    ps = ps.localCheckpoint(eager=False)
    bounds = ps.groupBy(*gcols).agg(
        F.min("__s").alias("__lo"),
        F.max("__s").alias("__hi"),
        F.count("*").cast("long").alias("__m"),
    )
    if groups:
        bk_in = ps.join(F.broadcast(bounds), gcols)
    else:
        bk_in = ps.crossJoin(F.broadcast(bounds))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(nb))
    bkt = (
        F.when(
            width > 0,
            F.least(
                F.lit(nb - 1),
                F.floor((F.col("__s") - F.col("__lo")) / width).cast("int"),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    bucketed = bk_in.select(*gcols, "__s", "__ta", "__tb", bkt.alias("__bk"))
    cnt = bucketed.groupBy(*gcols, "__bk").agg(
        F.count("*").cast("long").alias("__bc"),
    )
    if groups:
        cnt = cnt.join(F.broadcast(bounds.select(*gcols, "__m")), gcols)
        w_off = (
            Window.partitionBy(*gcols)
            .orderBy("__bk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        cnt = cnt.crossJoin(F.broadcast(bounds.select("__m")))
        w_off = Window.orderBy("__bk").rowsBetween(
            Window.unboundedPreceding, -1
        )
    r_tgt = F.expr("(__m + 1) div 2")
    hit = (
        cnt.withColumn(
            "__off",
            F.coalesce(F.sum("__bc").over(w_off), F.lit(0)).cast("long"),
        )
        .filter((F.col("__off") < r_tgt) & (r_tgt <= F.col("__off") + F.col("__bc")))
        .select(*gcols, "__bk", "__off", "__m")
    )
    sel = bucketed.join(F.broadcast(hit), [*gcols, "__bk"])
    w_loc = Window.partitionBy(*gcols, "__bk").orderBy("__s", "__ta", "__tb")
    med_slope = (
        sel.withColumn("__rk", F.row_number().over(w_loc).cast("long"))
        .filter(F.col("__rk") == r_tgt - F.col("__off"))
        .select(
            *[F.col(f"__g_{g}").alias(g) for g in groups],
            F.col("__s").alias("__slope"),
            F.col("__m").alias("n_pairs"),
        )
    )
    if groups:
        resid = dt.join(med_slope, groups)
    else:
        resid = dt.crossJoin(F.broadcast(med_slope))
    r = resid.withColumn(
        "__res",
        F.col("__x").cast("double")
        - F.col("__slope") * F.col("__t").cast("double"),
    )
    if groups:
        w_rr = Window.partitionBy(*groups).orderBy("__res", "__t")
        w_rn = Window.partitionBy(*groups)
    else:
        w_rr = Window.orderBy("__res", "__t")
        w_rn = Window.partitionBy()
    out = (
        r.withColumn("__rr", F.row_number().over(w_rr).cast("long"))
        .withColumn("__n", F.count("*").over(w_rn).cast("long"))
        .filter(F.col("__rr") == F.expr("(__n + 1) div 2"))
        .select(
            *groups,
            F.col("__n").alias("n_points"),
            "n_pairs",
            F.round("__slope", 9).alias("sen_slope"),
            F.round("__res", 4).alias("intercept"),
        )
    )
    return out.orderBy(*groups) if groups else out


def _trend_input(
    df: DataFrame,
    groups: "list[str]",
    order_col: str,
    x_col: str,
    op_name: str,
) -> DataFrame:
    """Shared fail-loud projection for the trend tests: NULL x raises
    with the offending period named (the holt_linear convention), and
    NULL group keys raise (the psi convention) — the grouped pair
    joins below are null-UNSAFE, so a NULL-keyed group would form
    zero pairs and, after the left-join fix, report a confident
    S = 0 verdict computed from nothing."""
    if groups:
        from .drift import _checked_keys

        df = _checked_keys(df, groups, op_name=op_name)
    x_checked = F.when(
        F.col(x_col).isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"{op_name}: NULL x value at "),
                F.col(order_col).cast("string"),
            )
        ),
    ).otherwise(F.col(x_col).cast("long"))
    return df.select(
        *groups, F.col(order_col).alias("__o"), x_checked.alias("__x")
    )


def seasonal_mann_kendall(
    df: DataFrame,
    order_col: str,
    x_col: str,
    season_col: str,
) -> DataFrame:
    """Seasonal Mann-Kendall (Hirsch & Slack): run the MK test WITHIN
    each season (e.g. each day-of-week gets its own pairwise pass, so
    a weekly cycle can't masquerade as trend), then combine

        S = Σ_seasons S_g,   Var(S) = Σ_seasons Var_g(S)

    and take the continuity-corrected z of the totals. Built on the
    grouped :func:`mann_kendall` — the per-season S and tie terms are
    exact integers, so the combined variance numerator is one integer
    sum and the final z one double expression, identical across
    engines. Returns one row: (n_seasons, n_points, s_stat, var_s, z).
    Seasons with a single point contribute S = 0 and Var = 0 and ARE
    counted in n_seasons/n_points (the grouped operator reports every
    group — matching the pinned oracle's per_g chain, which aggregates
    the tie table over all seasons)."""
    per = mann_kendall(df, order_col, x_col, group_cols=[season_col])
    n = F.col("n_points")
    var_num = (
        n * (n - 1) * (F.lit(2) * n + 5) - F.col("tie_term")
    ).cast("long")
    agg = per.agg(
        F.count("*").cast("long").alias("n_seasons"),
        F.sum("n_points").cast("long").alias("n_points"),
        F.sum("s_stat").cast("long").alias("s_stat"),
        F.sum(var_num).cast("long").alias("__var_num"),
    )
    var_s = F.col("__var_num").cast("double") / F.lit(18.0)
    sd = F.col("s_stat").cast("double")
    z = F.when(
        F.col("__var_num") > 0,
        F.when(F.col("s_stat") > 0, (sd - 1.0) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (sd + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    return agg.select(
        "n_seasons",
        "n_points",
        "s_stat",
        F.round(var_s, 4).alias("var_s"),
        F.round(z, 6).alias("z"),
    )


def cross_correlation(
    df: DataFrame,
    order_col: str,
    x_col: str,
    y_col: str,
    *,
    max_lag: int = 7,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Cross-correlation function between two integer series sharing
    one date index — "does x lead y?" (lag k > 0 correlates x_t with
    y at t+k; k < 0 means y leads):

        ccf(k) = Σ_t Dx_t · Dy_{t+k} / sqrt(Σ Dx² · Σ Dy²)

    with the revenue_acf exactness recipe doubled: Dx_t = n·x_t − Sx
    and Dy_t = n·y_t − Sy are exact integers (n = rows, S = series
    sum), the lag products and both denominators accumulate exactly in
    DECIMAL(38,0) under any partitioning, and each ccf value is ONE
    double expression ``num / sqrt(denx · deny)`` of those integers.
    The input must already be the per-period aggregate with BOTH
    series as columns (one row per day — the km_survival contract), so
    the lag pairing is a broadcast calendar self-join, ~days² tiny.
    NULL x/y raise (the holt_linear convention). Bound: n²·max|x·y|
    must stay under 10³⁸ — daily cents at warehouse scale clears it by
    nine digits. With ``group_cols`` every stage keys on the group
    (ONE shared implementation — the _km_steps/psi house pattern):
    per-key moments, per-key deviations, the pair join adds the group
    equality, and the output carries one (group, lag) row each."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    groups = list(group_cols or [])
    d = _dual_series_input(
        df, groups, order_col, x_col, y_col, "cross_correlation"
    )
    if groups:
        tot = d.groupBy(*groups).agg(
            F.count("*").cast("long").alias("__n"),
            F.sum("__x").cast("long").alias("__sx"),
            F.sum("__y").cast("long").alias("__sy"),
        )
        based = d.join(F.broadcast(tot), groups)
    else:
        tot = d.agg(
            F.count("*").cast("long").alias("__n"),
            F.sum("__x").cast("long").alias("__sx"),
            F.sum("__y").cast("long").alias("__sy"),
        )
        based = d.crossJoin(F.broadcast(tot))
    n = F.col("__n").cast(_DEC)
    dev = based.select(
        *groups,
        "__o",
        (n * F.col("__x") - F.col("__sx")).cast(_DEC).alias("__dx"),
        (n * F.col("__y") - F.col("__sy")).cast(_DEC).alias("__dy"),
    ).localCheckpoint(eager=False)  # referenced three times below
    if groups:
        den = dev.groupBy(*groups).agg(
            F.sum(F.col("__dx") * F.col("__dx")).cast(_DEC).alias("__denx"),
            F.sum(F.col("__dy") * F.col("__dy")).cast(_DEC).alias("__deny"),
        )
    else:
        den = dev.agg(
            F.sum(F.col("__dx") * F.col("__dx")).cast(_DEC).alias("__denx"),
            F.sum(F.col("__dy") * F.col("__dy")).cast(_DEC).alias("__deny"),
        )
    a = dev.select(
        *[F.col(g).alias(f"__ga_{g}") for g in groups],
        F.col("__o").alias("__oa"),
        F.col("__dx").alias("__dxa"),
    )
    b = dev.select(
        *[F.col(g).alias(f"__gb_{g}") for g in groups],
        F.col("__o").alias("__ob"),
        F.col("__dy").alias("__dyb"),
    )
    lag = F.datediff(F.col("__ob"), F.col("__oa"))
    cond = (lag >= -max_lag) & (lag <= max_lag)
    for g in groups:
        cond = (F.col(f"__ga_{g}") == F.col(f"__gb_{g}")) & cond
    pairs = a.join(F.broadcast(b), cond).select(
        *[F.col(f"__ga_{g}").alias(g) for g in groups],
        lag.cast("long").alias("lag"),
        (F.col("__dxa") * F.col("__dyb")).alias("__prod"),
    )
    ccf = F.col("__num").cast("double") / F.sqrt(
        F.col("__denx").cast("double") * F.col("__deny").cast("double")
    )
    agged = pairs.groupBy(*groups, "lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("__prod").cast(_DEC).alias("__num"),
    )
    if groups:
        joined = agged.join(F.broadcast(den), groups)
    else:
        joined = agged.crossJoin(F.broadcast(den))
    return joined.select(
        *groups,
        "lag",
        "n_pairs",
        # ANSI: a constant series zeroes its deviation sum — report
        # NULL ccf, never DIVIDE_BY_ZERO (the zipf/runs convention)
        F.when(
            (F.col("__denx") > 0) & (F.col("__deny") > 0),
            F.round(ccf, 6),
        ).alias("ccf"),
    ).orderBy(*groups, "lag")


def ols_fit2(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    *,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Two-feature least squares ``y ~ b1·x1 + b2·x2 + a`` in closed
    form — the multi-regressor member of the :func:`ols_fit` family.
    One grouped aggregate accumulates the nine EXACT integer moments
    (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y) in
    DECIMAL(38,0); the normal equations solve by Cramer's rule on the
    CENTERED 2×2 system,

        A11·b1 + A12·b2 = C1        A11 = n·Σx1² − (Σx1)²   (etc.)
        A12·b1 + A22·b2 = C2        det = A11·A22 − A12²

    with every A/C one exact integer and b1/b2/intercept/r² each ONE
    double expression of those integers in a fixed op order — both
    engines agree bit-for-bit (the segmented_trend recipe). Collinear
    and NEAR-collinear inputs report NULL coefficients / NULL r²: the
    guard is RELATIVE, ``|det| > 1e-12 · A11 · A22`` (A11·A22 ≥ det ≥ 0
    for any real input, so this is 1 − ρ₁₂² > 1e-12) — an exact
    ``det != 0`` compare would let double rounding of huge exact
    integers wave numerically explosive coefficients through (the r9
    ADVICE find). Zero-variance y likewise reports NULL r², never
    DIVIDE_BY_ZERO.

    Returns one row per group: ``(group..., n, b1, b2, intercept,
    r2)``. Overflow bound: each A/C term is ≤ n²·max|x·y| and the
    integer arithmetic stops there — the det and SSE products are
    evaluated in DOUBLE — so daily-cents-scale inputs clear
    DECIMAL(38,0) by many digits.
    """
    groups = list(group_cols or [])
    x1 = F.col(x1_col).cast(_DEC)
    x2 = F.col(x2_col).cast(_DEC)
    y = F.col(y_col).cast(_DEC)
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    agg = df.groupBy(*groups).agg(
        F.count("*").cast("long").alias("n"),
        dec(F.sum(x1)).alias("s1"),
        dec(F.sum(x2)).alias("s2"),
        dec(F.sum(y)).alias("sy"),
        dec(F.sum(x1 * x1)).alias("s11"),
        dec(F.sum(x2 * x2)).alias("s22"),
        dec(F.sum(x1 * x2)).alias("s12"),
        dec(F.sum(x1 * y)).alias("s1y"),
        dec(F.sum(x2 * y)).alias("s2y"),
        dec(F.sum(y * y)).alias("syy"),
    )
    n = F.col("n").cast(_DEC)
    a11 = dec(n * F.col("s11") - F.col("s1") * F.col("s1"))
    a22 = dec(n * F.col("s22") - F.col("s2") * F.col("s2"))
    a12 = dec(n * F.col("s12") - F.col("s1") * F.col("s2"))
    c1 = dec(n * F.col("s1y") - F.col("s1") * F.col("sy"))
    c2 = dec(n * F.col("s2y") - F.col("s2") * F.col("sy"))
    syy_c = dec(n * F.col("syy") - F.col("sy") * F.col("sy"))
    det = a11.cast("double") * a22.cast("double") - a12.cast(
        "double"
    ) * a12.cast("double")
    b1 = (
        c1.cast("double") * a22.cast("double")
        - c2.cast("double") * a12.cast("double")
    ) / det
    b2 = (
        a11.cast("double") * c2.cast("double")
        - a12.cast("double") * c1.cast("double")
    ) / det
    intercept = (
        F.col("sy").cast("double")
        - b1 * F.col("s1").cast("double")
        - b2 * F.col("s2").cast("double")
    ) / F.col("n").cast("double")
    # centered R² = (b1·C1 + b2·C2) / SYYc — one double expression of
    # the same integers (SSR/SST on the n-scaled centered system)
    r2 = (b1 * c1.cast("double") + b2 * c2.cast("double")) / syy_c.cast(
        "double"
    )
    # relative collinearity guard: det/(A11·A22) = 1 − ρ₁₂², so this
    # NULLs groups whose features are >99.9999999999% correlated (and
    # any zero-variance feature, where A11·A22 = 0) instead of trusting
    # a rounding-level det
    ok = F.abs(det) > F.lit(1e-12) * a11.cast("double") * a22.cast(
        "double"
    )
    out = agg.select(
        *groups,
        "n",
        F.when(ok, F.round(b1, 9)).alias("b1"),
        F.when(ok, F.round(b2, 9)).alias("b2"),
        F.when(ok, F.round(intercept, 4)).alias("intercept"),
        F.when(ok & (syy_c > 0), F.round(r2, 6)).alias("r2"),
    )
    return out.orderBy(*groups) if groups else out


def _dual_series_input(
    df: DataFrame,
    groups: "list[str]",
    order_col: str,
    x_col: str,
    y_col: str,
    op_name: str,
) -> DataFrame:
    """Shared fail-loud projection for the two-series rank statistics
    (the _trend_input convention doubled): NULL x/y raise with the
    offending period named; NULL group keys raise (the psi
    convention)."""
    if groups:
        from .drift import _checked_keys

        df = _checked_keys(df, groups, op_name=op_name)

    def checked(c: str) -> Column:
        return F.when(
            F.col(c).isNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"{op_name}: NULL {c} value at "),
                    F.col(order_col).cast("string"),
                )
            ),
        ).otherwise(F.col(c).cast("long"))

    return df.select(
        *groups,
        F.col(order_col).alias("__o"),
        checked(x_col).alias("__x"),
        checked(y_col).alias("__y"),
    )


def kendall_tau(
    df: DataFrame,
    order_col: str,
    x_col: str,
    y_col: str,
    *,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Kendall's tau-b rank correlation between two integer series on
    one index — the two-series member of the Mann-Kendall family (MK
    IS Kendall tau of x against time):

        C − D = Σ_{i<j} sign(x_j − x_i) · sign(y_j − y_i)
        tau_b = (C − D) / sqrt((n0 − n1) · (n0 − n2))

    with n0 = n(n−1)/2 and n1/n2 the Σ t(t−1)/2 tie corrections of
    each series. Everything before tau is exact integer work over the
    pairwise join (concordant minus discordant is one integer sum;
    the tie terms are counts), and tau is ONE double expression — both
    engines agree bit-for-bit. Input contract: the per-period
    aggregate with both series as columns (the cross_correlation
    contract), so the pair join is calendar-bounded (days², fixed at
    any data volume). With ``group_cols`` every stage keys on the
    group; every group reports a row (pairless or fully-tied groups
    carry NULL tau under the denominator guard). NULL x/y/keys raise.
    Returns ``(group..., n_points, concordant_minus_discordant,
    tie_term_x, tie_term_y, tau_b)``."""
    groups = list(group_cols or [])
    d = _dual_series_input(df, groups, order_col, x_col, y_col, "kendall_tau")
    a = d.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("__o").alias("__oa"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
    )
    b = d.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("__o").alias("__ob"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
    )
    if groups:
        pairs = _pair_fanout_grouped(
            a, b, [f"__g_{g}" for g in groups], "__oa"
        ).filter(F.col("__oa") < F.col("__ob"))
    else:
        pairs = _pair_fanout_parallelism(a).join(
            F.broadcast(b), F.col("__oa") < F.col("__ob"), "inner"
        )
    s = pairs.groupBy(*[f"__g_{g}" for g in groups]).agg(
        F.sum(
            F.signum(F.col("__xb") - F.col("__xa")).cast("long")
            * F.signum(F.col("__yb") - F.col("__ya")).cast("long")
        )
        .cast("long")
        .alias("cd")
    )

    def tie_sum(col: str, alias: str) -> DataFrame:
        return (
            d.groupBy(*groups, col)
            .agg(F.count("*").cast("long").alias("__t"))
            .groupBy(*groups)
            .agg(
                F.sum(F.col("__t") * (F.col("__t") - 1))
                .cast("long")
                .alias(alias)
            )
        )

    n_pts = d.groupBy(*groups).agg(
        F.count("*").cast("long").alias("n_points")
    )
    tx = tie_sum("__x", "__tx2")
    ty = tie_sum("__y", "__ty2")
    if groups:
        base = (
            n_pts.join(tx, groups)
            .join(ty, groups)
            .join(
                s.select(
                    *[F.col(f"__g_{g}").alias(g) for g in groups], "cd"
                ),
                groups,
                "left",  # pairless groups report a row (the MK rule)
            )
        )
    else:
        base = (
            n_pts.crossJoin(F.broadcast(tx))
            .crossJoin(F.broadcast(ty))
            .crossJoin(F.broadcast(s))
        )
    base = base.withColumn(
        "cd", F.coalesce(F.col("cd"), F.lit(0)).cast("long")
    )
    n = F.col("n_points")
    # doubled to stay integer: 2·n0 = n(n−1), 2·n1 = Σt(t−1) (tie_sum
    # already returns the doubled form)
    den_x = (n * (n - 1) - F.col("__tx2")).cast("long")
    den_y = (n * (n - 1) - F.col("__ty2")).cast("long")
    tau = (F.lit(2.0) * F.col("cd").cast("double")) / F.sqrt(
        den_x.cast("double") * den_y.cast("double")
    )
    out = base.select(
        *groups,
        "n_points",
        F.col("cd").alias("concordant_minus_discordant"),
        # exact integer halving of the (even, nonnegative) doubled tie
        # sums — a `/ 2` would route through DOUBLE and silently round
        # above 2^53, breaking the module's exact-integer doctrine
        F.shiftright(F.col("__tx2"), 1).alias("tie_term_x"),
        F.shiftright(F.col("__ty2"), 1).alias("tie_term_y"),
        # ANSI: an all-tied series zeroes its denominator — NULL tau,
        # never DIVIDE_BY_ZERO (the MK var_num guard convention)
        F.when((den_x > 0) & (den_y > 0), F.round(tau, 6)).alias("tau_b"),
    )
    return out.orderBy(*groups) if groups else out


def pettitt_test(
    df: DataFrame,
    order_col: str,
    x_col: str,
    *,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Pettitt's nonparametric changepoint test — WHERE does the
    distribution shift, rank-based (the robust companion to the
    OLS-scored ``segmented_trend``):

        U_t = Σ_{i≤t} Σ_{j>t} sign(x_j − x_i),   K = max_t |U_t|
        p ≈ 2·exp(−6K² / (n³ + n²))

    Computed in O(n log n), not O(n²) pairs: the per-row sign mass
    V_t = Σ_{j≠t} sign(x_j − x_t) = (n − #{x ≤ x_t}) − #{x < x_t}
    comes from two cumulative-count windows over the VALUE order, and
    U_t is the running sum of V over the TIME order (the recurrence
    U_t = U_{t−1} + V_t) — all exact integers on the per-period
    aggregate (both windows see O(days) rows; the km_survival bounded-
    window argument), and the approximate p-value is ONE double.
    Ties contribute sign 0 exactly. With ``group_cols`` both windows
    partition by the key. Returns one row per group:
    ``(group..., n_points, k_stat, change_point, p_approx)`` with
    change_point the FIRST period attaining |U| = K (deterministic
    tie-break on the order column)."""
    from pyspark.sql import Window

    groups = list(group_cols or [])
    d = _trend_input(df, groups, order_col, x_col, "pettitt_test")
    if groups:
        w_le = (
            Window.partitionBy(*groups)
            .orderBy("__x")
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_lt = (
            Window.partitionBy(*groups)
            .orderBy("__x")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_n = Window.partitionBy(*groups)
        w_time = (
            Window.partitionBy(*groups)
            .orderBy("__o")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w_le = Window.orderBy("__x").rangeBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_lt = Window.orderBy("__x").rangeBetween(
            Window.unboundedPreceding, -1
        )
        w_n = Window.partitionBy()
        w_time = Window.orderBy("__o").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    ranked = d.select(
        *groups,
        "__o",
        (
            F.count("*").over(w_n).cast("long")
            - F.count("*").over(w_le).cast("long")
            - F.coalesce(F.count("*").over(w_lt).cast("long"), F.lit(0))
        ).alias("__v"),
        F.count("*").over(w_n).cast("long").alias("__n"),
    )
    u = ranked.select(
        *groups,
        "__o",
        "__n",
        F.sum("__v").over(w_time).cast("long").alias("__u"),
    )
    # argmax |U| with first-period tie-break: one grouped min over the
    # (−|U|, order) struct — no second pass over the series
    agg = u.groupBy(*groups).agg(
        F.max("__n").alias("n_points"),
        F.max(F.abs("__u")).cast("long").alias("k_stat"),
        F.min(
            F.struct(
                (-F.abs(F.col("__u"))).alias("__negk"),
                F.col("__o").alias("__cp"),
            )
        ).alias("__arg"),
    )
    n = F.col("n_points").cast("double")
    p = F.lit(2.0) * F.exp(
        F.lit(-6.0)
        * F.col("k_stat").cast("double")
        * F.col("k_stat").cast("double")
        / (n * n * n + n * n)
    )
    out = agg.select(
        *groups,
        "n_points",
        "k_stat",
        F.col("__arg.__cp").alias("change_point"),
        # p can exceed 1 for tiny K — clamp like the textbook does
        F.round(F.least(p, F.lit(1.0)), 6).alias("p_approx"),
    )
    return out.orderBy(*groups) if groups else out


def spearman_rho(
    df: DataFrame,
    order_col: str,
    x_col: str,
    y_col: str,
    *,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Spearman rank correlation with tie-average ranks — Pearson on
    the rank transform, the monotone-association companion to
    :func:`kendall_tau`. Average ranks are kept EXACT by doubling:
    2·avgrank(x_t) = 2·#{x < x_t} + #{x = x_t} + 1, an integer from
    two cumulative windows over the value order; the Pearson moments
    of the doubled ranks accumulate in DECIMAL(38,0) (the factor 2
    cancels in ρ), and ρ is ONE double expression of exact integers —
    bit-equal across engines. Both windows run on the per-period
    aggregate (O(days) rows). With ``group_cols`` everything keys on
    the group. Returns ``(group..., n_points, rho)`` with NULL rho
    when either series is constant (zero rank variance — the ANSI
    guard)."""
    from pyspark.sql import Window

    groups = list(group_cols or [])
    d = _dual_series_input(
        df, groups, order_col, x_col, y_col, "spearman_rho"
    )

    def dbl_rank(col: str, alias: str):
        if groups:
            w_lt = (
                Window.partitionBy(*groups)
                .orderBy(col)
                .rangeBetween(Window.unboundedPreceding, -1)
            )
            w_le = (
                Window.partitionBy(*groups)
                .orderBy(col)
                .rangeBetween(Window.unboundedPreceding, Window.currentRow)
            )
        else:
            w_lt = Window.orderBy(col).rangeBetween(
                Window.unboundedPreceding, -1
            )
            w_le = Window.orderBy(col).rangeBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        lt = F.coalesce(F.count("*").over(w_lt).cast("long"), F.lit(0))
        le = F.count("*").over(w_le).cast("long")
        # 2·avg = 2·lt + (le − lt) + 1 = lt + le + 1
        return (lt + le + 1).cast("long").alias(alias)

    r = d.select(
        *groups,
        dbl_rank("__x", "__rx"),
        dbl_rank("__y", "__ry"),
    )
    rx = F.col("__rx").cast(_DEC)
    ry = F.col("__ry").cast(_DEC)
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    agg = r.groupBy(*groups).agg(
        F.count("*").cast("long").alias("n_points"),
        dec(F.sum(rx)).alias("sx"),
        dec(F.sum(ry)).alias("sy"),
        dec(F.sum(rx * rx)).alias("sxx"),
        dec(F.sum(ry * ry)).alias("syy"),
        dec(F.sum(rx * ry)).alias("sxy"),
    )
    n = F.col("n_points").cast(_DEC)
    num = dec(n * F.col("sxy") - F.col("sx") * F.col("sy"))
    vx = dec(n * F.col("sxx") - F.col("sx") * F.col("sx"))
    vy = dec(n * F.col("syy") - F.col("sy") * F.col("sy"))
    rho = num.cast("double") / F.sqrt(
        vx.cast("double") * vy.cast("double")
    )
    out = agg.select(
        *groups,
        "n_points",
        F.when((vx > 0) & (vy > 0), F.round(rho, 6)).alias("rho"),
    )
    return out.orderBy(*groups) if groups else out


def normal_p_two_sided(z: Column) -> Column:
    """Two-sided normal p-value 2·(1 − Φ(|z|)) as ONE deterministic
    double expression — the Abramowitz & Stegun 7.1.26 rational
    polynomial for erf (|error| ≤ 1.5e-7), NOT a library call: both
    engines evaluate the identical op-order polynomial (no Spark or
    DuckDB erf builtin exists). The one non-exact op is exp(), whose
    JVM and libm implementations differ by ≤1 ulp (measured max 4e-16
    across a 500-point grid, 141 raw ulp mismatches, ZERO after
    round(·,9)) — so this carries the SAME contract as every psi/JSD
    ln()/exp() site: registry oracles must round the p at ≤9 dp before
    hashing. NULL z (the MK degenerate) propagates to NULL p.

        t = 1/(1 + p·x),  x = |z|/√2
        erf(x) ≈ 1 − (a1·t + a2·t² + a3·t³ + a4·t⁴ + a5·t⁵)·e^(−x²)
        p_two_sided = 1 − erf(x)   [since 2(1−Φ(|z|)) = erfc(|z|/√2)]

    The 1.5e-7 approximation error is far below the 1e-6 output
    rounding every registry query applies, so rounded p-values are
    exact for ranking/threshold purposes."""
    x = F.abs(z) / F.lit(math.sqrt(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * t * t
        + F.lit(1.421413741) * t * t * t
        - F.lit(1.453152027) * t * t * t * t
        + F.lit(1.061405429) * t * t * t * t * t
    )
    return poly * F.exp(-(x * x))


NORMAL_P_TWO_SIDED_SQL = (
    # the identical A&S 7.1.26 expression in DuckDB dialect — keep in
    # exact op-order lockstep with normal_p_two_sided (tests pin the
    # two bit-equal); {z} is the caller's z expression
    "(0.254829592 * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    " - 0.284496736 * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    " + 1.421413741 * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    " - 1.453152027 * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    " + 1.061405429 * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0))))"
    "   * (1.0 / (1.0 + 0.3275911 * (abs({z}) / sqrt(2.0)))))"
    " * exp(-((abs({z}) / sqrt(2.0)) * (abs({z}) / sqrt(2.0))))"
)


def bh_select(
    df: DataFrame,
    p_col: str,
    *,
    alpha: float = 0.05,
    tie_cols: "list[str] | None" = None,
) -> DataFrame:
    """Benjamini-Hochberg FDR selection over a p-value column — the
    multiple-testing companion for any grouped test battery (grouped
    MK/tau/Pettitt emit one p per key; testing 10⁴ keys at α=0.05
    uncorrected manufactures 500 false trends):

        sort p ascending, rank i of m;  i_max = max{i : p_i ≤ i·α/m}
        select ALL rows with rank ≤ i_max   (the step-up rule)

    One ordered rank window over the PER-KEY TEST RESULTS (O(groups)
    rows — the km_survival bounded-window argument: the fact table
    collapsed long before this) + one scalar max aggregate, broadcast
    back. ``tie_cols`` break p ties deterministically (the rank
    window needs a TOTAL order — pass the group key). Omitting
    ``tie_cols`` is only valid when the p-values are all distinct:
    tied p with no tie key makes ``p_rank`` (and ``selected`` near
    the cutoff) depend on partitioning, so that case FAILS LOUD at
    evaluation time rather than returning run-to-run-nondeterministic
    ranks (the module's determinism doctrine). NULL p (degenerate
    tests) never selects and does not count toward m. Returns the
    input rows plus ``(p_rank, m_tests, bh_threshold, selected)``."""
    from pyspark.sql import Window

    ties = list(tie_cols or [])
    nn = df.filter(F.col(p_col).isNotNull())
    w_rk = Window.orderBy(p_col, *ties)
    ranked = nn.withColumn(
        "p_rank", F.row_number().over(w_rk).cast("long")
    )
    m_agg = [F.count("*").cast("long").alias("m_tests")]
    if not ties:
        # no tie key given: assert the ordering is total. The check is
        # one extra countDistinct on the O(groups)-row test frame; the
        # raise is plan-embedded (bh_select is lazy) and fires only on
        # the offending input.
        m_agg.append(
            (F.count(p_col) - F.count_distinct(F.col(p_col)))
            .cast("long")
            .alias("__p_dups")
        )
    m = ranked.agg(*m_agg)
    based = ranked.crossJoin(F.broadcast(m))
    if not ties:
        based = based.withColumn(
            "p_rank",
            F.when(
                F.col("__p_dups") > 0,
                F.raise_error(
                    F.lit(
                        "bh_select: tied p-values with no tie_cols —"
                        " the rank ordering is not total, so p_rank"
                        " and the step-up selection near the cutoff"
                        " would be nondeterministic. Pass tie_cols"
                        " (e.g. the group key) to break ties"
                        " deterministically."
                    )
                ).cast("long"),
            ).otherwise(F.col("p_rank")),
        ).drop("__p_dups")
    # the comparison uses the SAME round(·,9) form the output column
    # publishes (and that p-values carry under the ln/exp contract) —
    # comparing unrounded internally while publishing rounded could
    # emit a row showing p <= bh_threshold with selected = false, and
    # a consumer recomputing the step-up rule from the published
    # columns would contradict the verdict
    thresh = F.round(
        F.col("p_rank").cast("double")
        * F.lit(float(alpha))
        / F.col("m_tests").cast("double"),
        9,
    )
    scored = based.withColumn("bh_threshold", thresh).withColumn(
        "__hit",
        F.when(F.col(p_col) <= thresh, F.col("p_rank")).otherwise(
            F.lit(None)
        ),
    )
    imax = scored.agg(
        F.coalesce(F.max("__hit"), F.lit(0)).cast("long").alias("__imax")
    )
    out = (
        scored.crossJoin(F.broadcast(imax))
        .withColumn("selected", F.col("p_rank") <= F.col("__imax"))
        .drop("__hit", "__imax")
    )
    nulls = df.filter(F.col(p_col).isNull())
    return out.unionByName(
        nulls.withColumn("p_rank", F.lit(None).cast("long"))
        .withColumn("m_tests", F.lit(None).cast("long"))
        .withColumn("bh_threshold", F.lit(None).cast("double"))
        .withColumn("selected", F.lit(False)),
        allowMissingColumns=False,
    )
