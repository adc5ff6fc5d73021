"""Mergeable KMV (k-minimum-values / bottom-k) set sketch: distinct
counts, union, intersection, and Jaccard estimates from k-row samples.

The sibling of ``operators/quantile_sketch`` applied to SET algebra:
keep the k smallest ``xxhash64`` values of the distinct ids per key.
Because the kept set is a pure function of the input's distinct-hash
SET, the sketch is a semilattice — ``merge(sketch(A), sketch(B)) ==
sketch(A ∪ B)`` row-for-row — so 1000 executors (or a streaming fold)
build shards independently and the k-row merges are exact, the same
coordination-free story the quantile sketch proved.

Estimators (Beyer et al. 2007, "On Synopses for Distinct-Value
Estimation Under Multiset Operations"):

- distinct: with u_k the k-th smallest hash mapped to (0,1),
  ``D ≈ (k-1)/u_k`` (unbiased); a sketch holding fewer than k rows IS
  the complete distinct-hash set, so the count is exact.
- intersection of A and B: take the union sketch M = bottom-k of
  KA ∪ KB; with c = |{h ∈ M : h ∈ KA and h ∈ KB}|,
  ``|A∩B| ≈ (c/k) · U`` where U is M's union estimate. Unlike HLL
  inclusion-exclusion (whose error is the sum of three ABSOLUTE
  errors), the KMV ratio c/k is a direct binomial sample of the
  Jaccard index, so Jaccard comes out at ±~1/√k regardless of scale
  and small overlaps degrade gracefully.

Determinism: the hash is seeded xxhash64 and the kept set is a bottom-k
under the total signed-hash order (signed order == unsigned order with
the sign bit flipped, and the unit mapping below is affine in the
signed value, so "k smallest signed" IS "k smallest unit values") —
every column downstream is reproducible bit-for-bit on any
partitioning. Registry entries over this operator are rows-only
self-validating (DuckDB has no Spark-compatible xxhash64).

Scale shape: the only shuffle is the map-side-combinable distinct on
(key, hash); the per-key bottom-k is one window over the distinct
hashes; every estimate reads k-row state. Same class as
quantile_sketch — probe in tools/ if registered.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_H = "__ss_h"
# affine signed-long -> [0, 1) unit mapping: u = h/2^64 + 0.5, clamped
# to >= 2^-64 — h = Long.MIN maps to exactly 0.0 (a "+1 ulp" literal is
# not representable in double), and a zero u would turn the (k-1)/u
# estimate into Infinity and the long cast into an ANSI overflow.
_TWO64 = 18446744073709551616.0
_U_MIN = 5.421010862427522e-20  # 2^-64


def _unit(col):
    return F.greatest(
        col.cast("double") / F.lit(_TWO64) + F.lit(0.5), F.lit(_U_MIN)
    )


def set_sketch(
    df: DataFrame,
    key_cols: Iterable[str],
    id_cols: Iterable[str],
    *,
    k: int = 4096,
    seed: int = 2024,
) -> DataFrame:
    """Per-key bottom-k sketch of the distinct ``id_cols`` values:
    ``(key..., __ss_h)``, ≤ k rows per key. ``key_cols`` may be empty
    for one global sketch. All sketches to be merged must share ``k``
    and ``seed``."""
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator divides by k-1)")
    keys = list(key_cols)
    ids = [F.col(c) for c in id_cols]
    if not ids:
        raise ValueError("id_cols must name at least one column")
    h = F.xxhash64(*ids, F.lit(seed))
    distinct = df.select(*keys, h.alias(_H)).groupBy(*keys, _H).agg(
        F.lit(1).alias("__one")
    )
    if keys:
        w = Window.partitionBy(*keys).orderBy(_H)
        return (
            distinct.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .select(*keys, _H)
        )
    # global: TakeOrderedAndProject — only k rows ever move
    return distinct.select(_H).orderBy(_H).limit(k)


def merge_set_sketches(
    sketches: Sequence[DataFrame],
    key_cols: Iterable[str],
    *,
    k: int,
) -> DataFrame:
    """Semilattice merge: union, dedup on (key, hash), keep each key's
    bottom-k. Exact over disjoint shards AND idempotent over replays —
    the kept set only depends on the union of the input hash sets."""
    if not sketches:
        raise ValueError("need at least one sketch")
    keys = list(key_cols)
    u = reduce(DataFrame.unionByName, sketches).dropDuplicates([*keys, _H])
    if keys:
        w = Window.partitionBy(*keys).orderBy(_H)
        return (
            u.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )
    return u.orderBy(_H).limit(k)


def set_sketch_distinct(
    sketch: DataFrame, key_cols: Iterable[str], *, k: int
) -> DataFrame:
    """Collapse to ``(key..., n_kept, distinct_est)``. A key holding
    fewer than k rows kept its COMPLETE distinct-hash set, so the
    count is exact; at exactly k rows the KMV estimator applies."""
    keys = list(key_cols)
    agg = sketch.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max(_H).alias("__hk"),  # k-th smallest == max of the kept set
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) / _unit(F.col("__hk")))
    return agg.select(
        *keys, "n_kept", F.round(est).cast("long").alias("distinct_est")
    )


def set_sketch_overlap(
    a: DataFrame,
    b: DataFrame,
    key_cols: Iterable[str],
    *,
    k: int,
) -> DataFrame:
    """Union / intersection / Jaccard estimates per key:
    ``(key..., n_union_kept, est_union, est_intersection,
    jaccard_est)``. A key present in only one input reports its own
    union estimate with intersection 0.

    The union sample M is the (exact, semilattice) merge of the two
    kept sets cut back to bottom-k; c counts M's hashes present in
    both inputs. When M holds fewer than k rows both input sets were
    complete, so union AND intersection are exact counts, not
    estimates."""
    keys = list(key_cols)
    aa = a.select(*keys, _H)
    bb = b.select(*keys, _H)
    m = merge_set_sketches([aa, bb], keys, k=k)
    # membership flags via semi-join shape: one row per (key, h) in M
    in_a = m.join(aa.withColumn("__ina", F.lit(1)), [*keys, _H], "left")
    both = in_a.join(bb.withColumn("__inb", F.lit(1)), [*keys, _H], "left")
    agg = both.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_union_kept"),
        F.max(_H).alias("__hk"),
        F.sum(
            F.when(
                F.col("__ina").isNotNull() & F.col("__inb").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("__c"),
    )
    u_est = F.when(
        F.col("n_union_kept") < k, F.col("n_union_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) / _unit(F.col("__hk")))
    i_est = F.when(
        F.col("n_union_kept") < k, F.col("__c").cast("double")
    ).otherwise(
        F.col("__c").cast("double") / F.lit(float(k)) * u_est
    )
    jac = F.when(
        F.col("n_union_kept") > 0,
        F.col("__c").cast("double") / F.col("n_union_kept").cast("double"),
    )
    return agg.select(
        *keys,
        "n_union_kept",
        F.round(u_est).cast("long").alias("est_union"),
        F.round(i_est).cast("long").alias("est_intersection"),
        F.round(jac, 6).alias("jaccard_est"),
    )
