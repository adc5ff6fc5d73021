"""Deterministic sampling / split / packing operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.sampling import (
    group_quota,
    hash_sample,
    pack_into_bins,
    slot_threshold,
    train_test_split,
)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "key")


def test_slot_threshold_bounds():
    assert slot_threshold(0.0) == "0000"
    # 'g' sorts above every 4-hex slot; '10000' would sort BELOW 'ffff'
    assert slot_threshold(1.0) == "g"
    assert slot_threshold(0.25) == "4000"


def test_hash_sample_is_deterministic_and_close_to_fraction(spark):
    df = _ids(spark)
    a = {r["key"] for r in hash_sample(df, "key", 0.25).collect()}
    b = {r["key"] for r in hash_sample(df, "key", 0.25).collect()}
    assert a == b  # re-run → identical membership
    assert 0.20 <= len(a) / 2000 <= 0.30  # uniform-ish

    salted = {r["key"] for r in hash_sample(df, "key", 0.25, salt="v2").collect()}
    assert salted != a  # salt decorrelates


def test_hash_sample_nested_fractions(spark):
    # a 10% sample is a subset of the 25% sample (same salt: prefix property)
    df = _ids(spark)
    small = {r["key"] for r in hash_sample(df, "key", 0.10).collect()}
    big = {r["key"] for r in hash_sample(df, "key", 0.25).collect()}
    assert small <= big


def test_train_test_split_partitions_everything(spark):
    df = _ids(spark)
    out = train_test_split(df, "key", test_fraction=0.2)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["test"] + counts["train"] == 2000
    assert 0.15 <= counts["test"] / 2000 <= 0.25


def test_group_quota_caps_each_group(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(100)], "key: long, grp: string"
    )
    out = group_quota(df, "grp", "key", k=10)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert all(v == 10 for v in counts.values())
    # deterministic pick
    again = group_quota(df, "grp", "key", k=10)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


def test_pack_into_bins_respects_capacity(spark):
    df = spark.createDataFrame(
        [(i, 30) for i in range(10)], "key: long, sz: long"
    )
    out = pack_into_bins(
        df, size_col="sz", order_col="key", capacity=100, allow_global=True
    ).collect()
    bins = {}
    for r in sorted(out, key=lambda r: r["key"]):
        bins.setdefault(r["bin_id"], []).append(r["sz"])
    # exclusive-cumsum binning: priors 0,30,..,270 → floor(prior/100)
    # gives 4 rows in bin 0 (prior<100), then 3 and 3
    assert [len(v) for k, v in sorted(bins.items())] == [4, 3, 3]


def test_pack_into_bins_partitioned(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 5 else "b", 50) for i in range(10)],
        "key: long, shard: string, sz: long",
    )
    out = pack_into_bins(
        df, size_col="sz", order_col="key", capacity=100, partition_col="shard"
    )
    per_shard = (
        out.groupBy("shard", "bin_id").agg(F.count("*").alias("n")).collect()
    )
    # each shard restarts bin numbering: 5 rows of 50 → bins of 2,2,1
    got = sorted((r["shard"], r["bin_id"], r["n"]) for r in per_shard)
    assert got == [
        ("a", 0, 2), ("a", 1, 2), ("a", 2, 1),
        ("b", 0, 2), ("b", 1, 2), ("b", 2, 1),
    ]


def test_pack_into_bins_global_mode_is_guarded(spark):
    import pytest

    df = spark.createDataFrame([(1, 10)], "key: long, sz: long")
    with pytest.raises(ValueError, match="ONE task"):
        pack_into_bins(df, size_col="sz", order_col="key", capacity=100)


def test_pack_into_bins_sharded_window_has_multiple_partitions(spark):
    """The scale contract: with shard_col, the cumsum window partitions
    by (partition_col, shard) — the physical plan must NOT contain an
    unpartitioned window, and bins restart per shard."""
    df = spark.createDataFrame(
        [(i, "en", 50) for i in range(8)], "key: long, lang: string, sz: long"
    )
    out = pack_into_bins(
        df,
        size_col="sz",
        order_col="key",
        capacity=100,
        partition_col="lang",
        shard_col=F.pmod(F.col("key"), F.lit(4)),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # Spark prints an empty partition spec as "windowspecdefinition(<order>"
    # with no partition exprs; assert our keys made it into the spec.
    assert "lang" in plan and "pmod" in plan
    rows = sorted(
        (r["shard"], r["bin_id"], r["key"]) for r in out.collect()
    )
    # shard s owns keys {s, s+4}: 2 rows of 50 fit one 100-capacity bin
    assert rows == [
        (0, 0, 0), (0, 0, 4), (1, 0, 1), (1, 0, 5),
        (2, 0, 2), (2, 0, 6), (3, 0, 3), (3, 0, 7),
    ]


def test_stratified_sample_rates_and_determinism(spark):
    from bangumi_notion_data_integration_project_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(20)]
    df = spark.createDataFrame(rows, "key: long, grp: string")
    out = stratified_sample(df, "grp", "key", target_per_group=50)
    by_grp = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # small group is under target → kept whole ('g' sentinel path)
    assert by_grp.get("small") == 20
    # big group sampled at ~50/400 = 12.5% → roughly 50, definitely < 400
    assert 20 <= by_grp.get("big", 0) <= 90
    # deterministic: same membership on re-run
    again = stratified_sample(df, "grp", "key", target_per_group=50)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_stratified_sample_no_shuffle_of_rows(spark):
    """Rows must not move: the filter rides on a plan-literal map, so
    the physical plan has no Exchange between scan and filter."""
    from bangumi_notion_data_integration_project_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(90)], "key: long, grp: string"
    )
    out = stratified_sample(df, "grp", "key", target_per_group=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
