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

NULLs are fail-loud (the ``holt_linear`` convention): a NULL value in
either snapshot raises at execution rather than silently biasing the
edges and shares — drop or impute NULLs explicitly before monitoring.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _checked_long(v: Column, where: str) -> Column:
    """Fail-loud NULL handling (the ``holt_linear`` convention): a NULL
    value would otherwise land silently in bucket 1 (``v > edge`` never
    matches, count(edge) = 0) and skew every share — raise instead, and
    let the caller filter NULLs explicitly if that is what they mean."""
    return F.when(
        v.isNull(),
        F.raise_error(
            F.lit(
                f"psi: NULL value in {where} — filter NULLs out "
                "explicitly before computing drift"
            )
        ),
    ).otherwise(v.cast("long"))


def _ranked_distinct(ref: DataFrame, v: Column) -> DataFrame:
    """``(__v, __c, __cum)`` — distinct values with counts and the
    cumulative count under the value order. The ordered window runs on
    this DISTINCT-VALUE aggregate, never on raw rows (the docstring
    promise ``tests/test_plans.py`` pins): raw rows reduce map-side in
    the groupBy first, so the single-partition sort the unpartitioned
    window implies only ever sees O(distinct values) rows."""
    vc = (
        ref.select(_checked_long(v, "reference").alias("__v"))
        .groupBy("__v")
        .agg(F.count("*").cast("long").alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return vc.withColumn("__cum", F.sum("__c").over(w))


def psi_buckets(
    ref: DataFrame,
    value_col: str | Column,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """The reference's bucket UPPER edges: ``(bucket 1..k-1, edge)``
    — exact integer order statistics at ranks ``ceil(i·n/k)``. The
    last bucket is unbounded above, so k-1 edges define k buckets.

    The edge at rank r is the smallest value whose cumulative count
    reaches r, so only the DISTINCT-VALUE aggregate is ever windowed —
    raw rows reduce map-side first. (An order statistic's value never
    depends on tie-breaking among equal values.) At 100 TB, where even
    distinct values may be huge, feed :func:`psi` edges from the
    mergeable quantile sketch instead — any (bucket, edge) table
    works; this exact builder is the oracle-checkable path."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    cum = _ranked_distinct(ref, v).localCheckpoint(
        eager=False
    )  # reused: totals + the per-target min scan
    n_row = cum.agg(F.max("__cum").cast("long").alias("__n"))
    b = F.explode(
        F.sequence(F.lit(1), F.lit(int(n_buckets) - 1))
    ).alias("bucket")
    targets = n_row.select(b, "__n").select(
        "bucket",
        F.ceil(
            F.col("bucket").cast("double")
            * F.col("__n").cast("double")
            / F.lit(float(n_buckets))
        )
        .cast("long")
        .alias("__r"),
    )
    return (
        cum.crossJoin(F.broadcast(targets))
        .filter(F.col("__cum") >= F.col("__r"))
        .groupBy("bucket")
        .agg(F.min("__v").alias("edge"))
        .orderBy("bucket")
    )


def _bucketize(df: DataFrame, value, edges: DataFrame, n_buckets: int):
    v = _checked_long(
        F.col(value) if isinstance(value, str) else value, "input"
    )
    # reduce to distinct values map-side BEFORE the broadcast range
    # join: bucket = 1 + number of edges strictly below the value
    vc = df.select(v.alias("__v")).groupBy("__v").agg(
        F.count("*").cast("long").alias("__cnt")
    )
    j = vc.join(F.broadcast(edges), F.col("__v") > F.col("edge"), "left")
    return (
        j.groupBy("__v", "__cnt")
        .agg((F.lit(1) + F.count("edge")).cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.sum("__cnt").cast("long").alias("c"))
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str | Column,
    *,
    n_buckets: int = 10,
    edges: DataFrame | None = None,
) -> DataFrame:
    """One row per bucket plus the totals needed to recompute it:
    ``(bucket, edge, n_ref, n_cur, ref_share, cur_share, psi_term)``
    and an aggregate ``psi`` repeated on every row (so a single-pass
    reader gets both the verdict and its decomposition). Shares are
    Laplace-smoothed ``(c+1)/(n+k)``. Pass ``edges`` (any
    ``(bucket, edge)`` table, e.g. quantile-sketch estimates) to skip
    the exact edge build at scale."""
    k = int(n_buckets)
    if edges is None:
        edges = psi_buckets(ref, value_col, n_buckets=k)
    edges = edges.localCheckpoint(
        eager=False
    )  # reused: bucketize both sides + the output's edge column
    rc = _bucketize(ref, value_col, edges, k)
    cc = _bucketize(cur, value_col, edges, k)
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
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
            "n_ref_total",
            "n_cur_total",
        )
    )
    q = (F.col("n_ref") + 1).cast("double") / (
        F.col("n_ref_total") + F.lit(k)
    ).cast("double")
    p = (F.col("n_cur") + 1).cast("double") / (
        F.col("n_cur_total") + F.lit(k)
    ).cast("double")
    term = (p - q) * F.log(p / q)
    terms = base.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round(q, 6).alias("ref_share"),
        F.round(p, 6).alias("cur_share"),
        F.round(term, 6).alias("psi_term"),
        F.round(term * F.lit(1000000000.0)).cast("long").alias("__tn"),
    ).localCheckpoint(eager=False)  # referenced by the total AND the output
    tot = terms.agg(F.sum("__tn").cast("long").alias("__s")).select(
        F.round(F.col("__s").cast("double") / F.lit(1000000000.0), 6).alias(
            "psi"
        )
    )
    upper = edges.select("bucket", "edge")
    return (
        terms.join(F.broadcast(upper), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "edge",
            "n_ref",
            "n_cur",
            "ref_share",
            "cur_share",
            "psi_term",
            "psi",
        )
        .orderBy("bucket")
    )


def psi_grouped(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str | Column,
    group_cols: "list[str]",
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Per-key PSI — one drift verdict per segment/type: the exact
    :func:`psi` construction with every stage keyed by ``group_cols``
    (edges are per-group order statistics of the group's OWN reference
    distribution, the windows partition by the key, the bucketize join
    adds the group equality to the range condition). Output is
    ``psi``'s row shape prefixed by the group columns; a group present
    only in ``cur`` produces no row (no reference ⇒ no edges — drift
    against nothing is undefined, matching the global operator's
    empty-ref degenerate). Differential-tested per group against the
    global operator, which carries the cross-engine-pinned oracle."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must name at least one column")
    k = int(n_buckets)
    v = F.col(value_col) if isinstance(value_col, str) else value_col

    def ranked(df: DataFrame) -> DataFrame:
        vc = (
            df.select(*groups, _checked_long(v, "reference").alias("__v"))
            .groupBy(*groups, "__v")
            .agg(F.count("*").cast("long").alias("__c"))
        )
        w = Window.partitionBy(*groups).orderBy("__v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return vc.withColumn("__cum", F.sum("__c").over(w))

    cum = ranked(ref).localCheckpoint(eager=False)
    n_row = cum.groupBy(*groups).agg(
        F.max("__cum").cast("long").alias("__n")
    )
    b = F.explode(F.sequence(F.lit(1), F.lit(k - 1))).alias("bucket")
    targets = n_row.select(*groups, b, "__n").select(
        *groups,
        "bucket",
        F.ceil(
            F.col("bucket").cast("double")
            * F.col("__n").cast("double")
            / F.lit(float(k))
        )
        .cast("long")
        .alias("__r"),
    )
    edges = (
        cum.join(F.broadcast(targets), groups)
        .filter(F.col("__cum") >= F.col("__r"))
        .groupBy(*groups, "bucket")
        .agg(F.min("__v").alias("edge"))
    ).localCheckpoint(eager=False)  # bucketize both sides + output

    def bucketize(df: DataFrame, where: str) -> DataFrame:
        vc = (
            df.select(*groups, _checked_long(v, where).alias("__v"))
            .groupBy(*groups, "__v")
            .agg(F.count("*").cast("long").alias("__cnt"))
        )
        e = edges.select(
            *[F.col(g).alias(f"__eg_{g}") for g in groups],
            F.col("edge").alias("__edge"),
        )
        cond = [F.col(g) == F.col(f"__eg_{g}") for g in groups] + [
            F.col("__v") > F.col("__edge")
        ]
        j = vc.join(
            F.broadcast(e), reduce(lambda a, c: a & c, cond), "left"
        )
        return (
            j.groupBy(*groups, "__v", "__cnt")
            .agg((F.lit(1) + F.count("__edge")).cast("int").alias("bucket"))
            .groupBy(*groups, "bucket")
            .agg(F.sum("__cnt").cast("long").alias("c"))
        )

    rc = bucketize(ref, "reference")
    cc = bucketize(cur, "input")
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
        grid.join(rc.withColumnRenamed("c", "n_ref"), [*groups, "bucket"], "left")
        .join(cc.withColumnRenamed("c", "n_cur"), [*groups, "bucket"], "left")
        .join(F.broadcast(nr), groups)
        .join(F.broadcast(nc), groups)
        .select(
            *groups,
            "bucket",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
            "n_ref_total",
            "n_cur_total",
        )
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
    ).localCheckpoint(eager=False)
    tot = terms.groupBy(*groups).agg(
        F.round(
            F.sum("__tn").cast("double") / F.lit(1000000000.0), 6
        ).alias("psi")
    )
    return (
        terms.join(F.broadcast(edges.select(*groups, "bucket", "edge")),
                   [*groups, "bucket"], "left")
        .join(F.broadcast(tot), groups)
        .select(
            *groups,
            "bucket",
            "edge",
            "n_ref",
            "n_cur",
            "ref_share",
            "cur_share",
            "psi_term",
            "psi",
        )
        .orderBy(*groups, "bucket")
    )
