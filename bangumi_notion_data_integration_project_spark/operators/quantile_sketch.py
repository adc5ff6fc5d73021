"""Mergeable quantile sketch: bottom-k-by-hash uniform sampling (KMV
style), the distributed building block for approximate percentiles over
columns too large to sort.

Why not a literal KLL? KLL's compactors are sequential (each compaction
decision depends on every earlier item), which fights Spark's execution
model and makes results depend on partition boundaries. The bottom-k
sketch keeps the property that actually matters for a pipeline —
**exact mergeability** — while staying 100% JVM-side:

- Each row gets a deterministic 64-bit hash of its identity columns
  (``xxhash64(id..., seed)``); the sketch is the k rows with the
  smallest hashes. A uniform hash makes this a simple random sample
  without replacement of size k, so the sample's empirical q-quantile
  estimates the true q-quantile with rank error ~ sqrt(q(1-q)/k)
  (k=2048 → ~1.1% at the median); callers that need KLL's O(1/k) rate
  should raise k quadratically — at bounded-driver-memory scale that is
  still only ~10^6 rows for 0.1% error on 10^12 input rows.
- **Merge is union + bottom-k and is EXACT**: for disjoint row sets,
  ``merge(sketch(A), sketch(B)) == sketch(A ∪ B)`` row-for-row (the k
  smallest hashes of a union are a subset of the union of each side's k
  smallest). Sketches can be built per partition / per day / per file
  and folded in any order or tree shape — the semilattice property
  streaming and incremental rollups need.
- Everything is built-in expressions: the bottom-k is
  ``orderBy(hash, value).limit(k)``, which Spark executes as
  TakeOrderedAndProject — per-partition partial top-k, then a k-row
  merge, never a full sort or a Python UDF. The cut is a TOTAL order
  ((hash, value), everywhere: build, merge, grouped windows) so a
  64-bit hash collision at the k-th boundary resolves identically in
  every code path — without it, build and merge could keep different
  boundary rows and break the exact row-for-row merge contract.

Scale shape (100 TB): one scan, no shuffle of the input (partial top-k
reduces each partition to ≤ k rows before anything moves), result is
k rows. The grouped variant shuffles once on the group key and keeps
≤ k rows per group via a ranked window. Quantile EXTRACTION sorts only
the ≤ k-row sketch, so its single-partition window is bounded by
construction.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_H = "__qs_h"


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_cols: Iterable[str],
    *,
    k: int = 2048,
    seed: int = 2024,
) -> DataFrame:
    """Build the sketch: the ``k`` rows of ``df`` whose
    ``xxhash64(id_cols..., seed)`` is smallest, as ``(value, __qs_h)``.

    ``id_cols`` must uniquely identify rows (a primary key); the hash of
    a unique identity is what makes the sample uniform over ROWS and the
    merge exact. Hashing the value itself would sample distinct VALUES
    instead and skew every estimate toward the tail of rare values.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    ids = [F.col(c) for c in id_cols]
    if not ids:
        raise ValueError("id_cols must name at least one column")
    h = F.xxhash64(*ids, F.lit(seed))
    return (
        df.select(F.col(value_col).alias("value"), h.alias(_H))
        .orderBy(_H, "value")
        .limit(k)
    )


def merge_quantile_sketches(sketches: Sequence[DataFrame], *, k: int) -> DataFrame:
    """Fold sketches into the sketch of their input union: dedup on
    (hash, value), then bottom-k.

    The dedup makes the merge a true SEMILATTICE join — idempotent,
    commutative, associative — so besides disjoint shards (exact: same
    rows as sketching the union directly) it also absorbs OVERLAPPING
    inputs: re-merging a sketch already folded in is a no-op, because a
    replayed row re-derives the identical (hash, value) pair. That is
    what lets the streaming twin survive checkpoint replay with no
    batch-id watermark or transactional commit at all — the property
    the sum-fold rollups have to buy with ``__batch_id`` guards and
    manifest swaps. Requires the build contract (``id_cols`` unique per
    row): duplicate identities collide on hash and collapse here.
    """
    if not sketches:
        raise ValueError("need at least one sketch")
    # unionByName: a stored sketch re-selected in a different column
    # order must not cross-pair hashes into the value slot
    return (
        reduce(DataFrame.unionByName, sketches)
        .dropDuplicates([_H, "value"])
        .orderBy(_H, "value")
        .limit(k)
    )


def sketch_quantiles(sketch: DataFrame, probs: Sequence[float]) -> DataFrame:
    """Extract quantile estimates from a sketch: one row per prob,
    ``(prob, est)`` where ``est`` is the sample's ceil(q·m)-th smallest
    value (m = sketch size, the classic lower empirical quantile).

    The window below is single-partition ON PURPOSE: a sketch is ≤ k
    rows by construction, so sorting it is driver-scale work wherever
    it runs; do not feed raw tables to this function.
    """
    for q in probs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"probs must be in (0, 1], got {q}")
    spark = sketch.sparkSession
    # the plan below references the sketch twice (count + ranked join);
    # checkpoint so a live build plan executes once, not twice
    sketch = sketch.localCheckpoint(eager=False)
    m_row = sketch.agg(F.count("*").alias("__m"))
    ranked = sketch.withColumn(
        "__r", F.row_number().over(Window.orderBy("value", _H))
    )
    pdf = spark.createDataFrame([(float(q),) for q in probs], "prob double")
    # target rank ceil(q*m), clamped to >= 1; join on equality of ranks
    tgt = pdf.crossJoin(F.broadcast(m_row)).select(
        "prob",
        F.greatest(F.lit(1), F.ceil(F.col("prob") * F.col("__m")).cast("int")).alias("__r"),
    )
    return (
        tgt.join(ranked.select("__r", "value"), "__r")
        .select("prob", F.col("value").alias("est"))
        .orderBy("prob")
    )


def grouped_quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_cols: Iterable[str],
    group_cols: Iterable[str],
    *,
    k: int = 2048,
    seed: int = 2024,
) -> DataFrame:
    """Per-group bottom-k sketch: ≤ k sample rows per group, same
    determinism and mergeability per group key. One shuffle on the
    group columns; the rank window is per-group so no single partition
    ever holds more than one group's rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    groups = list(group_cols)
    ids = [F.col(c) for c in id_cols]
    if not ids:
        raise ValueError("id_cols must name at least one column")
    h = F.xxhash64(*ids, F.lit(seed))
    w = Window.partitionBy(*groups).orderBy(_H, "value")
    return (
        df.select(*groups, F.col(value_col).alias("value"), h.alias(_H))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def merge_grouped_quantile_sketches(
    sketches: Sequence[DataFrame],
    group_cols: Iterable[str],
    *,
    k: int,
) -> DataFrame:
    """Per-group semilattice merge: union, dedup on (group, hash,
    value), keep each group's bottom-k. Same algebra as the global
    merge — exact over disjoint shards, idempotent over replays —
    applied per key; groups present in only some inputs pass through.
    One shuffle on the group columns, state is ≤ k rows per group."""
    if not sketches:
        raise ValueError("need at least one sketch")
    groups = list(group_cols)
    u = reduce(DataFrame.unionByName, sketches).dropDuplicates([*groups, _H, "value"])
    w = Window.partitionBy(*groups).orderBy(_H, "value")
    return (
        u.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def grouped_sketch_quantiles(
    sketch: DataFrame,
    group_cols: Iterable[str],
    probs: Sequence[float],
) -> DataFrame:
    """Per-group quantile estimates: one row per (group, prob). Ranks
    are per-group windows over ≤ k sample rows, so no partition ever
    holds more than one group's sketch."""
    for q in probs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"probs must be in (0, 1], got {q}")
    groups = list(group_cols)
    spark = sketch.sparkSession
    sketch = sketch.localCheckpoint(eager=False)  # referenced twice below
    w = Window.partitionBy(*groups).orderBy("value", _H)
    ranked = sketch.withColumn("__r", F.row_number().over(w))
    m = sketch.groupBy(*groups).agg(F.count("*").alias("__m"))
    pdf = spark.createDataFrame([(float(q),) for q in probs], "prob double")
    tgt = m.crossJoin(F.broadcast(pdf)).select(
        *groups,
        "prob",
        F.greatest(F.lit(1), F.ceil(F.col("prob") * F.col("__m")).cast("int")).alias("__r"),
    )
    return (
        tgt.join(ranked.select(*groups, "__r", "value"), [*groups, "__r"])
        .select(*groups, "prob", F.col("value").alias("est"))
        .orderBy(*groups, "prob")
    )


def rank_error_bound(k: int, q: float, *, n_sigma: float = 5.0) -> float:
    """The test/monitoring companion: an ``n_sigma``-standard-deviation
    bound on |empirical rank − q| for a uniform size-k sample."""
    return n_sigma * math.sqrt(q * (1.0 - q) / k)
