"""Mergeable HLL distinct-count sketches (operators/distinct_sketch.py):
estimate accuracy vs exact countDistinct, exact shard-merge equality,
idempotent re-merge, and pass-through of keys absent from one side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.distinct_sketch import (
    distinct_sketch,
    merge_distinct_sketches,
    sketch_estimates,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_orderkey", "l_partkey", "l_linenumber"
    )


def _est(sk):
    return {r["l_returnflag"]: r["distinct_est"] for r in sketch_estimates(sk).collect()}


def test_estimates_within_hll_error(lineitem):
    est = _est(distinct_sketch(lineitem, ["l_returnflag"], "l_partkey"))
    exact = {
        r["l_returnflag"]: r["c"]
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("c"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:
        # lg_k=12 → ~1.6% RSE; 5 sigma ≈ 8%
        assert abs(est[k] - exact[k]) <= 0.08 * exact[k] + 1, (k, est[k], exact[k])


def test_shard_merge_equals_direct_and_is_idempotent(lineitem):
    lo = lineitem.filter(F.col("l_orderkey") % 2 == 0)
    hi = lineitem.filter(F.col("l_orderkey") % 2 == 1)
    keys = ["l_returnflag"]
    merged = merge_distinct_sketches(
        [
            distinct_sketch(lo, keys, "l_partkey"),
            distinct_sketch(hi, keys, "l_partkey"),
        ]
    )
    direct = distinct_sketch(lineitem, keys, "l_partkey")
    assert _est(merged) == _est(direct)
    # idempotence: folding one shard's sketch in AGAIN changes nothing
    again = merge_distinct_sketches([merged, distinct_sketch(lo, keys, "l_partkey")])
    assert _est(again) == _est(direct)


def test_keys_missing_from_one_side_pass_through(spark):
    a = spark.createDataFrame([("x", 1), ("x", 2)], "k string, v int")
    b = spark.createDataFrame([("y", 7)], "k string, v int")
    merged = merge_distinct_sketches(
        [distinct_sketch(a, ["k"], "v"), distinct_sketch(b, ["k"], "v")]
    )
    est = {r["k"]: r["distinct_est"] for r in sketch_estimates(merged).collect()}
    assert est == {"x": 2, "y": 1}


def test_regroup_without_raw_data(spark):
    """The point of storing sketches: per-day sketches union to
    per-month counts with no raw-data re-scan."""
    rows = [(d, m, i) for m in (1, 2) for d in (1, 2, 3) for i in range(m * 50 + d)]
    df = spark.createDataFrame(rows, "day int, month int, user int")
    per_day = distinct_sketch(df, ["month", "day"], "user")
    per_month = per_day.groupBy("month").agg(
        F.hll_union_agg(F.col("__hll")).alias("__hll")
    )
    est = {r["month"]: r["distinct_est"] for r in sketch_estimates(per_month).collect()}
    # users 0..(m*50+3-1) per month — small enough for HLL to be exact
    assert est == {1: 53, 2: 103}


def test_validation(spark):
    df = spark.createDataFrame([("x", 1)], "k string, v int")
    with pytest.raises(ValueError):
        distinct_sketch(df, [], "v")
    with pytest.raises(ValueError):
        merge_distinct_sketches([])


def test_intersection_estimates(spark):
    from bangumi_notion_data_integration_project_spark.operators.distinct_sketch import (
        sketch_intersection_estimates,
    )

    # users 0..799 in A, 400..1199 in B → overlap 400 of union 1200
    a = spark.createDataFrame([("k", i) for i in range(800)], "k string, u int")
    b = spark.createDataFrame(
        [("k", i) for i in range(400, 1200)] + [("only_b", 1)], "k string, u int"
    )
    out = sketch_intersection_estimates(
        distinct_sketch(a, ["k"], "u"), distinct_sketch(b, ["k"], "u"), ["k"]
    ).collect()
    assert len(out) == 1 and out[0]["k"] == "k"  # only shared keys
    r = out[0]
    # lg_k=12: exact-ish at this cardinality; allow the 5-sigma envelope
    assert abs(r["est_a"] - 800) <= 0.08 * 800 + 1
    assert abs(r["est_union"] - 1200) <= 0.08 * 1200 + 1
    assert abs(r["est_intersection"] - 400) <= 0.08 * 1200 * 3 + 1


def test_intersection_estimate_never_negative(spark):
    # disjoint sets: the raw inclusion-exclusion difference is noise
    # around zero and must clamp at 0, never a negative cardinality
    from bangumi_notion_data_integration_project_spark.operators.distinct_sketch import (
        sketch_intersection_estimates,
    )

    a = spark.createDataFrame([("k", i) for i in range(50_000)], "k string, u int")
    b = spark.createDataFrame(
        [("k", i) for i in range(100_000, 150_000)], "k string, u int"
    )
    r = sketch_intersection_estimates(
        distinct_sketch(a, ["k"], "u"), distinct_sketch(b, ["k"], "u"), ["k"]
    ).collect()[0]
    assert r["est_intersection"] >= 0
    assert r["est_intersection"] <= 0.08 * r["est_union"]
