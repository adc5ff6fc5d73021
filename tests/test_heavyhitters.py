"""Unit tests for two-pass Misra-Gries exact heavy hitters."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.heavyhitters import (
    _mg_partition,
    frequent_items,
)


def _exact(rows, threshold):
    c = Counter(rows)
    n = len(rows)
    return {v: k for v, k in c.items() if k > threshold * n}


def test_frequent_items_exact_vs_counter(spark):
    rng = random.Random(13)
    # zipf-ish: a few hot values over a long uniform tail
    rows = [f"hot{i % 3}" for i in range(3000)] + [
        f"tail{rng.randrange(5000)}" for _ in range(7000)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame([(v,) for v in rows], "token: string").repartition(8)
    got = {
        r["token"]: r["n_occurrences"]
        for r in frequent_items(df, "token", threshold=0.05).collect()
    }
    assert got == _exact(rows, 0.05)


def test_frequent_items_threshold_is_strict(spark):
    # value at EXACTLY threshold*n must be excluded (strict >)
    rows = ["a"] * 10 + ["b"] * 30 + [f"t{i}" for i in range(60)]
    df = spark.createDataFrame([(v,) for v in rows], "v: string")
    got = {r["v"] for r in frequent_items(df, "v", threshold=0.10).collect()}
    assert got == {"b"}  # a is exactly 10% of 100 -> excluded


def test_frequent_items_adversarial_partitioning(spark):
    # all copies of the hot value in ONE partition: the averaging
    # argument says its home partition must retain it
    hot = [("hot",)] * 400
    tail = [(f"t{i}",) for i in range(4000)]
    df = spark.createDataFrame(hot, "v: string").repartition(1).unionAll(
        spark.createDataFrame(tail, "v: string").repartition(7)
    )
    got = {r["v"] for r in frequent_items(df, "v", threshold=0.05).collect()}
    assert got == {"hot"}


def test_mg_summary_is_bounded_and_superset():
    import pandas as pd

    rng = random.Random(5)
    rows = ["x"] * 500 + [f"t{rng.randrange(2000)}" for _ in range(4500)]
    rng.shuffle(rows)
    fn = _mg_partition("v", capacity=40)
    out = list(fn(iter([pd.DataFrame({"v": rows})])))
    cands = set(out[0]["v"])
    assert len(cands) <= 40
    # any value with frequency > n/(capacity+1) must survive
    assert "x" in cands


def test_frequent_items_validates_threshold(spark):
    df = spark.createDataFrame([("a",)], "v: string")
    with pytest.raises(ValueError):
        frequent_items(df, "v", threshold=0.0)
    with pytest.raises(ValueError):
        frequent_items(df, "v", threshold=1.5)


def test_ewma_dyadic_terms_are_exact(spark):
    # the 2^-gap weights make the windowed sums exact binary fractions:
    # the Spark result must equal a from-scratch Fraction computation
    from fractions import Fraction

    from bangumi_notion_data_integration_project_spark.queries import QUERIES

    out = QUERIES["events_ewma"](spark, "/root/testdata/sf0.001").collect()
    by_type: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["event_type"], r["day"])):
        by_type.setdefault(r["event_type"], []).append(r)
    checked = 0
    for rows in by_type.values():
        for i, r in enumerate(rows):
            num = Fraction(0)
            den = Fraction(0)
            for p in rows[: i + 1]:
                gap = (r["day"] - p["day"]).days
                if gap <= 13:
                    w = Fraction(1, 2**gap)
                    num += p["n_events"] * w
                    den += w
            expect = round(float(num / den), 6)
            assert r["ewma"] == expect, (r, expect)
            checked += 1
    assert checked >= 30


def test_frequent_items_survives_empty_partitions(spark):
    # over-partitioned tiny input: empty partitions must yield an
    # empty STRING summary, not an int64 RangeIndex Arrow crash
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "v: string").repartition(16)
    got = {r["v"] for r in frequent_items(df, "v", threshold=0.5).collect()}
    assert got == {"a"}


def test_frequent_items_rejects_guarantee_voiding_capacity(spark):
    df = spark.createDataFrame([("a",)], "v: string")
    with pytest.raises(ValueError, match="superset guarantee"):
        frequent_items(df, "v", threshold=0.001, capacity=50)
