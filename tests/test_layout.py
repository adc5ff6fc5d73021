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


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    from bangumi_notion_data_integration_project_spark.catalog import zorder_key

    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = {(r.x, r.y): r.z for r in df.withColumn("z", zorder_key("x", "y")).collect()}
    for x, y in pts:
        assert got[(x, y)] == _py_morton(x, y), (x, y)


def test_zordered_write_skips_on_both_dimensions(spark, tmp_path):
    """The property data skipping actually uses: for a quarter-domain
    predicate on EITHER dimension, at least half the files' min/max
    stats exclude it. A single-column sort gives zero skippable files
    on the unsorted dimension; the z-curve buys skipping on both. (Per-
    file spans aren't asserted exactly — repartitionByRange samples its
    cut points, so a file can straddle a curve-quadrant boundary and
    briefly span one full dimension.)"""
    import pyarrow.parquet as pq
    import glob

    from bangumi_notion_data_integration_project_spark.catalog import write_zordered

    grid = spark.range(64 * 64).selectExpr("id % 64 AS x", "id DIV 64 AS y")
    path = str(tmp_path / "zordered")
    write_zordered(grid, path, x="x", y="y", bits=6, n_files=4)

    stats = []
    for f in glob.glob(f"{path}/*.parquet"):
        t = pq.read_table(f)
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        stats.append((min(xs), max(xs), min(ys), max(ys)))
    assert len(stats) == 4
    # predicate x <= 15: skippable files have min_x > 15; same for y
    assert sum(1 for s in stats if s[0] > 15) >= 2, f"x skipping too weak: {stats}"
    assert sum(1 for s in stats if s[2] > 15) >= 2, f"y skipping too weak: {stats}"


def test_sql_api_parity_on_registered_views(spark):
    """catalog.register_views exposes every table to the pure-SQL
    surface; a spark.sql query over the views must match the DataFrame
    formulation row-for-row (same engine, two front-ends — this guards
    the view registration itself: names, schemas, ts normalization)."""
    from bangumi_notion_data_integration_project_spark.catalog import register_views
    from bangumi_notion_data_integration_project_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    register_views(spark, sf_dir)

    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               cast(count(*) AS bigint) AS fetched_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    df_rows = (
        QUERIES["category_summary"](spark, sf_dir)
        .select("l_returnflag", "l_linestatus", "fetched_items", "sum_qty")
        .collect()
    )
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in df_rows]

    # events view must carry the normalized plain-TIMESTAMP ts (the SQL
    # surface hits the same NTZ landmine otherwise)
    [(t,)] = spark.sql("SELECT max(unix_micros(ts)) FROM events LIMIT 1").collect()
    assert t is not None
