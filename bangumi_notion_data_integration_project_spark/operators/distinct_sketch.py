"""Mergeable per-key distinct-count sketches: Spark's built-in Apache
DataSketches HLL aggregates (``hll_sketch_agg`` / ``hll_union_agg``),
stored as binary columns so counts compose across days / shards /
micro-batches without ever re-scanning history.

This is the cardinality sibling of ``operators/quantile_sketch``: both
are SEMILATTICE sketches — merge is idempotent, commutative and
associative — which is the property that makes (a) sharded building
coordination-free and (b) the streaming twin
(``streaming/incremental.start_streaming_distinct_sketch``) replay-exact
with no transactional machinery. HLL union keeps the per-register max
(dense mode) or the coupon-set union (sparse mode); re-presenting rows
already absorbed cannot change either, so a replayed batch is a no-op
by algebra.

Everything is JVM-side built-in aggregates: one shuffle on the key
columns per build/merge, sketch payloads are ~``2^lg_k`` bytes per key
(lg_k=12 → 4 KB, ~1.6% relative standard error), and the long tail of
values never leaves the executors — only sketches move.

Unlike ``approx_count_distinct`` (used by ``sketch_distinct_counts``),
the sketch VALUE is first-class: it can be stored, unioned across
arbitrary groupings later (re-aggregate per-day sketches to per-month
without the raw data), and only collapsed to a number at read time via
``hll_sketch_estimate``.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SK = "__hll"


def distinct_sketch(
    df: DataFrame,
    key_cols: Iterable[str],
    id_col: str,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key HLL sketch of distinct ``id_col`` values:
    ``(key..., __hll binary)``. All sketches in one table must share
    ``lg_k`` or later unions will refuse to merge them."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must name at least one column")
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias(_SK)
    )


def merge_distinct_sketches(sketches: Sequence[DataFrame]) -> DataFrame:
    """Union sketch tables per key. Keys present on only one side pass
    through; keys on several sides get the register-max union. Exact
    over disjoint row sets AND idempotent over replayed ones."""
    if not sketches:
        raise ValueError("need at least one sketch table")
    u = reduce(DataFrame.unionByName, sketches)
    keys = [c for c in u.columns if c != _SK]
    return u.groupBy(*keys).agg(F.hll_union_agg(F.col(_SK)).alias(_SK))


def sketch_estimates(sketch: DataFrame) -> DataFrame:
    """Collapse a sketch table to ``(key..., distinct_est long)``."""
    keys = [c for c in sketch.columns if c != _SK]
    return sketch.select(
        *keys, F.hll_sketch_estimate(F.col(_SK)).cast("long").alias("distinct_est")
    )


def sketch_intersection_estimates(
    a: DataFrame, b: DataFrame, key_cols: Iterable[str]
) -> DataFrame:
    """Audience-overlap estimates from two STORED sketch tables via
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A ∪ B), where
    the union sketch is the exact register-max union (``hll_union``) —
    no raw data touched. Returns (key..., est_a, est_b, est_union,
    est_intersection) for keys present in BOTH tables.

    Honesty note: HLL supports union natively; intersection by
    inclusion-exclusion inherits the ABSOLUTE error of the three
    estimates, so the RELATIVE error blows up when |A∩B| is small
    compared to |A ∪ B| (a 1% RSE on a 10M-user union is ±100k — useless
    for a 50k overlap). Use it for overlaps that are a material
    fraction of the union; below that, compute the intersection
    exactly from raw data or keep a theta-sketch pipeline instead.
    """
    keys = list(key_cols)
    aa = a.select(*keys, F.col(_SK).alias("__a"))
    bb = b.select(*keys, F.col(_SK).alias("__b"))
    j = aa.join(bb, keys)
    est_a = F.hll_sketch_estimate("__a").cast("long")
    est_b = F.hll_sketch_estimate("__b").cast("long")
    est_u = F.hll_sketch_estimate(F.hll_union("__a", "__b")).cast("long")
    return j.select(
        *keys,
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        # clamp: three noisy estimates can difference below zero when
        # the true overlap is tiny — never emit a negative cardinality
        F.greatest(F.lit(0).cast("long"), est_a + est_b - est_u).alias(
            "est_intersection"
        ),
    )
