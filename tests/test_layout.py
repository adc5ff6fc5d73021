"""Physical-layout tests: partitioned writes prune directories, bucketed
tables remove the join/agg exchange on the bucket key."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.catalog import (
    load_table,
    write_bucketed,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def _executed(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "orders_part")
    o = load_table(spark, SF_DIR, "orders")
    write_partitioned(o, path, partition_by=["o_orderstatus"])

    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = _executed(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), "partition filter not applied at scan"
    # pruned scan reads only the matching directory's rows
    expected = o.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_partitioned_readback_roundtrips(spark, tmp_path):
    path = str(tmp_path / "li_part")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    write_partitioned(li, path, partition_by=["l_returnflag"])
    assert spark.read.parquet(path).count() == li.count()


def test_bucketed_join_skips_exchange(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(
        o, "b_orders", bucket_by="o_orderkey", n_buckets=8,
        sort_by="o_orderkey", path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", bucket_by="o_orderkey", n_buckets=8,
        sort_by="o_orderkey", path=str(tmp_path / "b_lineitem"),
    )
    try:
        # joining two tables bucketed on the key: no shuffle on either side
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = _executed(joined)
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join still shuffles:\n" + plan[:2000]
        )
        # same join on plain parquet shuffles both sides
        plain = o.join(li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        assert "Exchange hashpartitioning" in _executed(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
