"""KMV bottom-k set sketch (operators/setsketch.py): determinism,
semilattice merge identity, exactness below k, and estimator accuracy
on synthetic sets with known overlap."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.setsketch import (
    merge_set_sketches,
    set_sketch,
    set_sketch_distinct,
    set_sketch_overlap,
)


def _ids(spark, lo, hi, key="x"):
    return spark.range(lo, hi).select(
        F.lit(key).alias("k"), F.col("id").alias("v")
    )


def _rows(sk):
    return sorted(r["__ss_h"] for r in sk.collect())


def test_deterministic_across_partitionings(spark):
    d = _ids(spark, 0, 5000)
    a = set_sketch(d, [], ["v"], k=256)
    b = set_sketch(d.repartition(13), [], ["v"], k=256)
    assert _rows(a) == _rows(b)
    assert a.count() == 256


def test_duplicates_never_inflate_the_sample(spark):
    d = _ids(spark, 0, 1000)
    dup = d.unionByName(d).unionByName(d)
    assert _rows(set_sketch(dup, [], ["v"], k=128)) == _rows(
        set_sketch(d, [], ["v"], k=128)
    )


def test_merge_semilattice_identity_and_idempotence(spark):
    whole = _ids(spark, 0, 8000)
    shards = [
        set_sketch(whole.filter(F.col("v") % 4 == i), [], ["v"], k=512)
        for i in range(4)
    ]
    merged = merge_set_sketches(shards, [], k=512)
    direct = set_sketch(whole, [], ["v"], k=512)
    assert _rows(merged) == _rows(direct)
    # replay a shard twice: idempotent by the dedup algebra
    again = merge_set_sketches([merged, shards[0]], [], k=512)
    assert _rows(again) == _rows(direct)


def test_exact_below_k(spark):
    d = _ids(spark, 0, 300)
    sk = set_sketch(d, [], ["v"], k=1024)
    [r] = set_sketch_distinct(sk, [], k=1024).collect()
    assert (r["n_kept"], r["distinct_est"]) == (300, 300)
    # exact overlap too: two sets of 300 with 100 common ids
    a = set_sketch(_ids(spark, 0, 300), [], ["v"], k=1024)
    b = set_sketch(_ids(spark, 200, 500), [], ["v"], k=1024)
    [o] = set_sketch_overlap(a, b, [], k=1024).collect()
    assert o["n_union_kept"] == 500
    assert o["est_union"] == 500
    assert o["est_intersection"] == 100
    assert o["jaccard_est"] == round(100 / 500, 6)


def test_distinct_estimator_within_bound(spark):
    n, k = 200_000, 2048
    sk = set_sketch(_ids(spark, 0, n), [], ["v"], k=k)
    [r] = set_sketch_distinct(sk, [], k=k).collect()
    # KMV RSE ~ 1/sqrt(k-2); allow 5 sigma
    tol = 5.0 / math.sqrt(k - 2)
    assert abs(r["distinct_est"] - n) / n <= tol


def test_overlap_estimators_within_bound(spark):
    # |A| = 60k, |B| = 60k, overlap 20k -> union 100k, jaccard 0.2
    k = 2048
    a = set_sketch(_ids(spark, 0, 60_000), [], ["v"], k=k)
    b = set_sketch(_ids(spark, 40_000, 100_000), [], ["v"], k=k)
    [o] = set_sketch_overlap(a, b, [], k=k).collect()
    assert abs(o["est_union"] - 100_000) / 100_000 <= 5.0 / math.sqrt(k - 2)
    # jaccard is a binomial sample of p=0.2 at k draws: 5 sigma
    p = 0.2
    jtol = 5.0 * math.sqrt(p * (1 - p) / k)
    assert abs(o["jaccard_est"] - p) <= jtol
    # intersection inherits union err + jaccard err; be generous
    assert abs(o["est_intersection"] - 20_000) / 20_000 <= 0.15


def test_grouped_sketch_and_single_side_keys(spark):
    d1 = _ids(spark, 0, 400, key="p").unionByName(_ids(spark, 0, 50, key="q"))
    d2 = _ids(spark, 300, 700, key="p").unionByName(
        _ids(spark, 1000, 1100, key="r")
    )
    a = set_sketch(d1, ["k"], ["v"], k=1024)
    b = set_sketch(d2, ["k"], ["v"], k=1024)
    got = {
        r["k"]: (r["est_union"], r["est_intersection"])
        for r in set_sketch_overlap(a, b, ["k"], k=1024).collect()
    }
    assert got["p"] == (700, 100)  # below k -> exact
    assert got["q"] == (50, 0)  # only in a
    assert got["r"] == (100, 0)  # only in b


def test_parameter_validation(spark):
    import pytest

    d = _ids(spark, 0, 10)
    with pytest.raises(ValueError, match="k must be >= 2"):
        set_sketch(d, [], ["v"], k=1)
    with pytest.raises(ValueError, match="id_cols"):
        set_sketch(d, [], [], k=16)
    with pytest.raises(ValueError, match="at least one sketch"):
        merge_set_sketches([], [], k=16)
