"""Population Stability Index (PSI) — the standard numeric-drift
monitor between a reference snapshot and a current one: bucket the
value by the REFERENCE distribution's quantile edges, compare the two
bucket share vectors,

    PSI = Σ_i (p_i − q_i) · ln(p_i / q_i)

(p = current share, q = reference share). Complements the token-level
Jensen-Shannon drift (``docs_source_jsd``): JSD watches a categorical
distribution, PSI watches a numeric column through a fixed bucketing,
which is what model-monitoring stacks alert on (< 0.1 stable, 0.1–0.25
shifting, > 0.25 drifted, the industry folklore thresholds).

Cross-engine exactness (the JSD/entropy recipe):
- Bucket edges are EXACT integer order statistics of the reference at
  ranks ``ceil(i·n/k)`` under a (value, id) total order — no
  interpolation, so both engines cut identically.
- Shares are Laplace-smoothed integers ``(c_i + 1) / (n + k)`` — the
  +1 keeps every bucket strictly positive (a raw 0 share makes PSI
  infinite and oracle-hostile) while remaining a pure integer ratio.
- Each bucket term is ONE double expression of those integers, rounded
  at 1e-9 and integer-summed, so the Σ over buckets is order-free.

Scale shape: one pass over the reference builds k edges (a bounded
TakeOrdered-class cut over the ranked aggregate); bucketing both sides
is a broadcast range join against the k-row edge table; counts are
map-side-combinable. Nothing data-scaled ever sits in one partition.

Every function takes ``group_cols`` for the per-key variant — ONE
shared implementation (the _km_steps/_holt_core/_segmented_core house
pattern), so the global and grouped paths can never diverge on the
edge/smoothing/term conventions; :func:`psi_grouped` is a thin alias.

NULLs are fail-loud (the ``holt_linear`` convention): a NULL value in
either snapshot — and, in the grouped variant, a NULL group key —
raises at execution rather than silently biasing (or silently
dropping) what the monitor reports. Drop or impute NULLs explicitly
before monitoring.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _checked_long(v: Column, where: str, op_name: str = "psi") -> Column:
    """Fail-loud NULL handling (the ``holt_linear`` convention): a NULL
    value would otherwise land silently in bucket 1 (``v > edge`` never
    matches, count(edge) = 0) and skew every share — raise instead, and
    let the caller filter NULLs explicitly if that is what they mean.
    ``op_name`` names the calling operator in the error (shared with
    the two-sample tests — same rule as ``_checked_keys``)."""
    return F.when(
        v.isNull(),
        F.raise_error(
            F.lit(
                f"{op_name}: NULL value in {where} — filter NULLs out "
                "explicitly before computing the statistic"
            )
        ),
    ).otherwise(v.cast("long"))


def _checked_keys(
    df: DataFrame, groups: "list[str]", op_name: str = "psi"
) -> DataFrame:
    """Fail-loud NULL group keys: every join/groupBy below is
    null-UNSAFE on the key, so a NULL-keyed row would silently vanish
    from the grouped monitor while the global one counts it — raise
    instead (same convention as the value check). ``op_name`` names the
    calling operator in the error (shared with cross_correlation — a
    CCF caller must not be told to fix its "psi" inputs)."""
    for g in groups:
        df = df.withColumn(
            g,
            F.when(
                F.col(g).isNull(),
                F.raise_error(
                    F.lit(
                        f"{op_name}: NULL group key in {g} — filter or"
                        " impute NULL keys explicitly before grouped"
                        f" {op_name} monitoring"
                    )
                ),
            ).otherwise(F.col(g)),
        )
    return df


def _ranked_distinct(
    ref: DataFrame,
    v: Column,
    groups: "list[str] | None" = None,
    *,
    where: str = "reference",
    op_name: str = "psi",
) -> DataFrame:
    """``(group..., __v, __c, __cum)`` — distinct values with counts
    and the cumulative count under the value order (per group when
    keyed). The ordered window runs on this DISTINCT-VALUE aggregate,
    never on raw rows (the docstring promise ``tests/test_plans.py``
    pins): raw rows reduce map-side in the groupBy first, so the sort
    the window implies only ever sees O(distinct values) rows. Shared
    with ``robust.trimmed_mean`` (``op_name`` names the caller in the
    fail-loud NULL error, the ``_checked_keys`` rule)."""
    groups = list(groups or [])
    vc = (
        ref.select(
            *groups, _checked_long(v, where, op_name).alias("__v")
        )
        .groupBy(*groups, "__v")
        .agg(F.count("*").cast("long").alias("__c"))
    )
    if groups:
        w = Window.partitionBy(*groups).orderBy("__v")
    else:
        w = Window.orderBy("__v")
    return vc.withColumn(
        "__cum",
        F.sum("__c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def psi_buckets(
    ref: DataFrame,
    value_col: str | Column,
    *,
    n_buckets: int = 10,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """The reference's bucket UPPER edges: ``(group..., bucket 1..k-1,
    edge)`` — exact integer order statistics at ranks ``ceil(i·n/k)``
    (per group when keyed, of the group's OWN distribution). The last
    bucket is unbounded above, so k-1 edges define k buckets.

    The edge at rank r is the smallest value whose cumulative count
    reaches r, so only the DISTINCT-VALUE aggregate is ever windowed —
    raw rows reduce map-side first. (An order statistic's value never
    depends on tie-breaking among equal values.) At 100 TB, where even
    distinct values may be huge, feed :func:`psi` edges from the
    mergeable quantile sketch instead — any (bucket, edge) table
    works; this exact builder is the oracle-checkable path."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    groups = list(group_cols or [])
    if groups:
        # direct callers (the sketch-fed-edges path) get the same
        # fail-loud NULL-key promise the psi() wrapper enforces
        ref = _checked_keys(ref, groups)
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    cum = _ranked_distinct(ref, v, groups).localCheckpoint(
        eager=False
    )  # reused: totals + the per-target min scan
    if groups:
        n_row = cum.groupBy(*groups).agg(
            F.max("__cum").cast("long").alias("__n")
        )
    else:
        n_row = cum.agg(F.max("__cum").cast("long").alias("__n"))
    b = F.explode(
        F.sequence(F.lit(1), F.lit(int(n_buckets) - 1))
    ).alias("bucket")
    targets = n_row.select(*groups, b, "__n").select(
        *groups,
        "bucket",
        F.ceil(
            F.col("bucket").cast("double")
            * F.col("__n").cast("double")
            / F.lit(float(n_buckets))
        )
        .cast("long")
        .alias("__r"),
    )
    if groups:
        joined = cum.join(F.broadcast(targets), groups)
    else:
        joined = cum.crossJoin(F.broadcast(targets))
    return (
        joined.filter(F.col("__cum") >= F.col("__r"))
        .groupBy(*groups, "bucket")
        .agg(F.min("__v").alias("edge"))
        .orderBy(*groups, "bucket")
    )


def _bucketize(
    df: DataFrame,
    value,
    edges: DataFrame,
    n_buckets: int,
    groups: "list[str] | None" = None,
    where: str = "input",
):
    groups = list(groups or [])
    v = _checked_long(
        F.col(value) if isinstance(value, str) else value, where
    )
    # reduce to distinct values map-side BEFORE the broadcast range
    # join: bucket = 1 + number of edges strictly below the value
    vc = df.select(*groups, v.alias("__v")).groupBy(*groups, "__v").agg(
        F.count("*").cast("long").alias("__cnt")
    )
    e = edges.select(
        *[F.col(g).alias(f"__eg_{g}") for g in groups],
        F.col("edge").alias("__edge"),
    )
    cond = reduce(
        lambda a, c: a & c,
        [F.col(g) == F.col(f"__eg_{g}") for g in groups]
        + [F.col("__v") > F.col("__edge")],
    )
    j = vc.join(F.broadcast(e), cond, "left")
    return (
        j.groupBy(*groups, "__v", "__cnt")
        .agg((F.lit(1) + F.count("__edge")).cast("int").alias("bucket"))
        .groupBy(*groups, "bucket")
        .agg(F.sum("__cnt").cast("long").alias("c"))
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str | Column,
    *,
    n_buckets: int = 10,
    edges: DataFrame | None = None,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """One row per bucket (per group when keyed) plus the totals
    needed to recompute it: ``(group..., bucket, edge, n_ref, n_cur,
    ref_share, cur_share, psi_term)`` and an aggregate ``psi``
    repeated on every row (so a single-pass reader gets both the
    verdict and its decomposition). Shares are Laplace-smoothed
    ``(c+1)/(n+k)``. Pass ``edges`` (any ``(group..., bucket, edge)``
    table, e.g. quantile-sketch estimates) to skip the exact edge
    build at scale.

    Grouped asymmetries, both deliberate: a group present in ``ref``
    but ABSENT from ``cur`` reports full rows with n_cur = 0 and
    n_cur_total = 0 (cur_share = 1/(0+k) — maximal drift made loud,
    exactly what the global operator reports for an empty cur); a
    group present only in ``cur`` produces no row (no reference ⇒ no
    edges — drift against nothing is undefined, matching the global
    empty-ref degenerate)."""
    k = int(n_buckets)
    groups = list(group_cols or [])
    if groups:
        ref = _checked_keys(ref, groups)
        cur = _checked_keys(cur, groups)
    if edges is None:
        edges = psi_buckets(
            ref, value_col, n_buckets=k, group_cols=groups or None
        )
    edges = edges.localCheckpoint(
        eager=False
    )  # reused: bucketize both sides + the output's edge column
    rc = _bucketize(ref, value_col, edges, k, groups, "reference")
    cc = _bucketize(cur, value_col, edges, k, groups, "input")
    if groups:
        nr = ref.select(*groups).groupBy(*groups).agg(
            F.count("*").cast("long").alias("n_ref_total")
        )
        nc = cur.select(*groups).groupBy(*groups).agg(
            F.count("*").cast("long").alias("n_cur_total")
        )
        grid = nr.select(*groups).crossJoin(
            ref.sparkSession.range(1, k + 1).select(
                F.col("id").cast("int").alias("bucket")
            )
        )
        base = (
            grid.join(
                rc.withColumnRenamed("c", "n_ref"),
                [*groups, "bucket"],
                "left",
            )
            .join(
                cc.withColumnRenamed("c", "n_cur"),
                [*groups, "bucket"],
                "left",
            )
            .join(F.broadcast(nr), groups)
            # LEFT: a group that vanished from cur is the loudest
            # drift signal there is — it must keep its rows
            .join(F.broadcast(nc), groups, "left")
        )
    else:
        nr = ref.agg(F.count("*").cast("long").alias("n_ref_total"))
        nc = cur.agg(F.count("*").cast("long").alias("n_cur_total"))
        grid = ref.sparkSession.range(1, k + 1).select(
            F.col("id").cast("int").alias("bucket")
        )
        base = (
            grid.join(rc.withColumnRenamed("c", "n_ref"), "bucket", "left")
            .join(cc.withColumnRenamed("c", "n_cur"), "bucket", "left")
            .crossJoin(F.broadcast(nr))
            .crossJoin(F.broadcast(nc))
        )
    return _psi_from_base(base, edges, groups, k)


def _psi_from_base(
    base: DataFrame, edges: DataFrame, groups: "list[str]", k: int
) -> DataFrame:
    """Shared PSI formula tail — Laplace-smoothed shares and the
    1e-9-rounded integer term sums — over a ``(group..., bucket,
    n_ref, n_cur, n_ref_total, n_cur_total)`` frame (NULL holes
    coalesced here). ONE implementation serves the batch operator AND
    the streaming twin (``streaming.start_streaming_psi`` folds bucket
    counts into exactly this frame shape), so the formula can never
    diverge between them — the psi_grouped house rule applied across
    the batch/streaming boundary."""
    base = base.select(
        *groups,
        "bucket",
        F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        "n_ref_total",
        F.coalesce("n_cur_total", F.lit(0))
        .cast("long")
        .alias("n_cur_total"),
    )
    q = (F.col("n_ref") + 1).cast("double") / (
        F.col("n_ref_total") + F.lit(k)
    ).cast("double")
    p = (F.col("n_cur") + 1).cast("double") / (
        F.col("n_cur_total") + F.lit(k)
    ).cast("double")
    term = (p - q) * F.log(p / q)
    terms = base.select(
        *groups,
        "bucket",
        "n_ref",
        "n_cur",
        F.round(q, 6).alias("ref_share"),
        F.round(p, 6).alias("cur_share"),
        F.round(term, 6).alias("psi_term"),
        F.round(term * F.lit(1000000000.0)).cast("long").alias("__tn"),
    ).localCheckpoint(eager=False)  # referenced by the total AND the output
    if groups:
        tot = terms.groupBy(*groups).agg(
            F.round(
                F.sum("__tn").cast("double") / F.lit(1000000000.0), 6
            ).alias("psi")
        )
        out = terms.join(
            F.broadcast(edges.select(*groups, "bucket", "edge")),
            [*groups, "bucket"],
            "left",
        ).join(F.broadcast(tot), groups)
    else:
        tot = terms.agg(F.sum("__tn").cast("long").alias("__s")).select(
            F.round(
                F.col("__s").cast("double") / F.lit(1000000000.0), 6
            ).alias("psi")
        )
        out = terms.join(
            F.broadcast(edges.select("bucket", "edge")), "bucket", "left"
        ).crossJoin(F.broadcast(tot))
    return out.select(
        *groups,
        "bucket",
        "edge",
        "n_ref",
        "n_cur",
        "ref_share",
        "cur_share",
        "psi_term",
        "psi",
    ).orderBy(*groups, "bucket")


def psi_grouped(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str | Column,
    group_cols: "list[str]",
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Per-key PSI — :func:`psi` with ``group_cols`` (one shared
    implementation; this alias only makes the keying mandatory).
    Differential-tested per group against the global operator, which
    carries the cross-engine-pinned oracle."""
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must name at least one column")
    return psi(
        ref, cur, value_col, n_buckets=n_buckets, group_cols=groups
    )
