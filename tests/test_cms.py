"""Count-min sketch (operators/cms.py): the deterministic never-
underestimate guarantee, python differential on the cell matrix,
disjoint-shard merge exactness (monoid), bound quality on real data,
and absent-item zero estimates."""

from __future__ import annotations

import random

import pytest

from bangumi_notion_data_integration_project_spark.operators.cms import (
    cms_build,
    cms_error_bound,
    cms_lookup,
    cms_merge,
)


def _items_df(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "item long")


def test_never_underestimates_and_exact_when_wide(spark):
    rng = random.Random(5)
    xs = [rng.randrange(0, 50) for _ in range(2000)]
    true = {v: xs.count(v) for v in set(xs)}
    df = _items_df(spark, xs)
    # width far above the 50-item cardinality: no collisions likely,
    # but the >= guarantee must hold REGARDLESS
    sk = cms_build(df, ["item"], depth=4, width=4096)
    est = {
        r["item"]: r["est"]
        for r in cms_lookup(
            sk, _items_df(spark, sorted(true)), ["item"], depth=4, width=4096
        ).collect()
    }
    assert set(est) == set(true)
    for v, t in true.items():
        assert est[v] >= t
    # at this width the estimates should in fact be exact
    assert est == true


def test_tight_width_overestimates_within_bound(spark):
    rng = random.Random(6)
    xs = [rng.randrange(0, 3000) for _ in range(20000)]
    true = {v: xs.count(v) for v in set(xs)}
    df = _items_df(spark, xs)
    sk = cms_build(df, ["item"], depth=4, width=256)  # forced collisions
    probe = _items_df(spark, sorted(true))
    est = {
        r["item"]: r["est"]
        for r in cms_lookup(sk, probe, ["item"], depth=4, width=256).collect()
    }
    bound = cms_error_bound(256, len(xs))
    n_over = 0
    for v, t in true.items():
        assert est[v] >= t, v  # the deterministic guarantee
        if est[v] > t + bound:
            n_over += 1
    # P(over bound) <= e^-4 ~ 1.8% per item; allow 3x slack on 3000
    assert n_over <= 0.06 * len(true), n_over


def test_matches_python_cell_matrix(spark):
    """The stored rows equal a python replay of the same xxhash64
    placement (via Spark's own hash on the driver-collected items, so
    the test pins the (d, w) layout and the counting, not the hash)."""
    from pyspark.sql import functions as F

    xs = [1, 1, 2, 3, 3, 3, 42]
    df = _items_df(spark, xs)
    hashed = df.select(
        "item",
        *[
            F.pmod(F.xxhash64("item", F.lit(2024 + d)), F.lit(64))
            .cast("int")
            .alias(f"w{d}")
            for d in range(3)
        ],
    ).collect()
    want: dict[tuple, int] = {}
    for r in hashed:
        for d in range(3):
            key = (d, r[f"w{d}"])
            want[key] = want.get(key, 0) + 1
    got = {
        (r["__d"], r["__w"]): r["cnt"]
        for r in cms_build(df, ["item"], depth=3, width=64).collect()
    }
    assert got == want


def test_disjoint_shard_merge_equals_direct(spark):
    rng = random.Random(7)
    xs = [rng.randrange(0, 500) for _ in range(6000)]
    df = _items_df(spark, xs)
    direct = {
        (r["__d"], r["__w"]): r["cnt"]
        for r in cms_build(df, ["item"], depth=4, width=512).collect()
    }
    shards = [
        cms_build(_items_df(spark, xs[i::3]), ["item"], depth=4, width=512)
        for i in range(3)
    ]
    merged = {
        (r["__d"], r["__w"]): r["cnt"]
        for r in cms_merge(shards).collect()
    }
    assert merged == direct


def test_absent_items_estimate_zero_or_collision(spark):
    xs = [10, 10, 20]
    sk = cms_build(_items_df(spark, xs), ["item"], depth=4, width=2048)
    est = {
        r["item"]: r["est"]
        for r in cms_lookup(
            sk, _items_df(spark, [99, 10]), ["item"], depth=4, width=2048
        ).collect()
    }
    assert est[10] == 2
    assert est[99] == 0  # no collision at this width


def test_parameter_validation(spark):
    df = _items_df(spark, [1])
    with pytest.raises(ValueError):
        cms_build(df, ["item"], depth=0)
    with pytest.raises(ValueError):
        cms_build(df, ["item"], width=1)
    with pytest.raises(ValueError):
        cms_build(df, [])
    with pytest.raises(ValueError):
        cms_merge([])


def test_null_item_fails_loud_in_build_and_lookup(spark):
    # r9 ADVICE: xxhash64 SKIPS null arguments, so ('a', NULL) and
    # (NULL, 'a') hash identically and conflate counts — NULL items
    # raise (the psi/hampel/trend convention) instead
    rows = [("a", None), (None, "a"), ("a", "b")]
    df = spark.createDataFrame(rows, "k1 string, k2 string")
    with pytest.raises(Exception, match="cms_build: NULL item value"):
        cms_build(df, ["k1", "k2"], depth=2, width=16).collect()
    sk = cms_build(
        df.filter("k1 IS NOT NULL AND k2 IS NOT NULL"),
        ["k1", "k2"],
        depth=2,
        width=16,
    )
    with pytest.raises(Exception, match="cms_lookup: NULL item value"):
        cms_lookup(sk, df, ["k1", "k2"], depth=2, width=16).collect()


def test_state_size_is_bounded(spark):
    rng = random.Random(8)
    xs = [rng.randrange(0, 100000) for _ in range(30000)]
    sk = cms_build(_items_df(spark, xs), ["item"], depth=4, width=256)
    assert sk.count() <= 4 * 256


def test_parameter_mismatch_fails_loud(spark):
    """A sketch probed or merged under different depth/width/seed would
    silently underestimate (cells misalign) — both paths must raise
    instead; an EMPTY sketch passes the lookup gate with honest 0s."""
    xs = [1, 1, 2]
    sk = cms_build(_items_df(spark, xs), ["item"], depth=4, width=2048)
    with pytest.raises(Exception, match="cms_lookup: depth/width/seed"):
        cms_lookup(
            sk, _items_df(spark, [1]), ["item"], depth=4, width=256
        ).collect()
    with pytest.raises(Exception, match="cms_lookup: depth/width/seed"):
        cms_lookup(
            sk, _items_df(spark, [1]), ["item"], depth=4, width=2048, seed=7
        ).collect()
    other = cms_build(_items_df(spark, xs), ["item"], depth=4, width=256)
    with pytest.raises(Exception, match="cms_merge: sketches built"):
        cms_merge([sk, other]).collect()
    empty = cms_build(
        spark.createDataFrame([], "item long"), ["item"], depth=2, width=64
    )
    est = {
        r["item"]: r["est"]
        for r in cms_lookup(
            empty, _items_df(spark, [5]), ["item"], depth=2, width=64
        ).collect()
    }
    assert est == {5: 0}
