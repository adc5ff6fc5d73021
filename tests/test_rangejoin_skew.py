"""Unit tests for the bucketed range join and the salted skew join."""

from __future__ import annotations

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.rangejoin import range_join
from bangumi_notion_data_integration_project_spark.operators.skew import salted_join


def _events(spark):
    return spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00"),
            (2, "u1", "2024-01-01 10:30:00"),
            (3, "u1", "2024-01-01 13:00:00"),
            (4, "u2", "2024-01-01 10:15:00"),
        ],
        "eid: long, uid: string, ts: string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_range_join_exact_bounds(spark):
    points = _events(spark)
    intervals = spark.createDataFrame(
        [
            ("u1", 100, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),  # eids 1,2
            ("u1", 101, "2024-01-01 12:59:00", "2024-01-01 13:00:00"),  # eid 3 (end-inclusive)
            ("u2", 102, "2024-01-01 11:00:00", "2024-01-01 12:00:00"),  # none
        ],
        "uid: string, win_id: long, s: string, e: string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn("e", F.col("e").cast("timestamp"))

    out = range_join(points, intervals, "uid", "ts", "s", "e", bucket_seconds=600)
    got = sorted((r["win_id"], r["eid"]) for r in out.collect())
    assert got == [(100, 1), (100, 2), (101, 3)]


def test_range_join_interval_spanning_many_buckets(spark):
    points = _events(spark)
    intervals = spark.createDataFrame(
        [("u1", 200, "2024-01-01 00:00:00", "2024-01-02 00:00:00")],
        "uid: string, win_id: long, s: string, e: string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn("e", F.col("e").cast("timestamp"))
    # tiny bucket → interval explodes over many bins; matches must not duplicate
    out = range_join(points, intervals, "uid", "ts", "s", "e", bucket_seconds=60)
    assert sorted(r["eid"] for r in out.collect()) == [1, 2, 3]


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(200)],
        "rid: long, k: string, v: double",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("cold", 2.0)], "k: string, w: double"
    )
    plain = big.join(small, "k").select("rid", "w")
    salted = salted_join(big, small, "k", n_salts=4, tiebreaker="rid").select("rid", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "zzz")], "rid: long, k: string")
    small = spark.createDataFrame([("a", 10)], "k: string, w: long")
    out = salted_join(big, small, "k", n_salts=3, tiebreaker="rid", how="left")
    got = {r["rid"]: r["w"] for r in out.collect()}
    assert got == {1: 10, 2: None}


def test_salted_topk_matches_plain_on_hot_key(spark):
    from bangumi_notion_data_integration_project_spark.operators.topk import (
        top_k_per_group,
        top_k_per_group_salted,
    )

    # group 'hot' holds 90% of rows — the shape where one window task
    # would serialize; the salted form must return the IDENTICAL top-k
    rows = [(i, "hot" if i % 10 else "cold", float((i * 37) % 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id: long, grp: string, score: double")
    order = [F.col("score").desc(), F.col("id").asc()]
    plain = top_k_per_group(df, ["grp"], order, 5).select("grp", "id", "score", "rn")
    salted = top_k_per_group_salted(
        df, ["grp"], order, 5, n_salts=8, tiebreaker="id"
    ).select("grp", "id", "score", "rn")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_topk_phase1_partitions_by_salt(spark):
    from bangumi_notion_data_integration_project_spark.operators.topk import (
        top_k_per_group_salted,
    )

    df = spark.createDataFrame([(1, "a", 1.0)], "id: long, grp: string, score: double")
    out = top_k_per_group_salted(
        df, ["grp"], [F.col("score").desc(), F.col("id")], 3, n_salts=4, tiebreaker="id"
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # phase 1 must window over (grp, __salt) — that is where the hot
    # key's parallelism comes from; phase 2 re-windows over grp alone
    assert "__salt" in plan
    assert plan.count("Window") >= 2
