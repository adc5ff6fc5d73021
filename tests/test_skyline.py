"""2-D skyline operator tests against hand-computed frontiers."""

from __future__ import annotations

from bangumi_notion_data_integration_project_spark.operators.skyline import skyline_2d


def test_skyline_basic_frontier(spark):
    # (price, size): frontier = (1,5), (3,7), (6,9); (3,5) and (7,8) dominated
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 3.0, 5), (3, 3.0, 7), (4, 7.0, 8), (5, 6.0, 9)],
        "id: long, price: double, size: long",
    )
    got = sorted(r["id"] for r in skyline_2d(df, minimize="price", maximize="size").collect())
    assert got == [1, 3, 5]


def test_skyline_keeps_duplicate_optimal_points(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 4)], "id: long, price: double, size: long"
    )
    got = sorted(r["id"] for r in skyline_2d(df, minimize="price", maximize="size").collect())
    assert got == [1, 2]  # equal pair not strictly dominated; (3) is


def test_skyline_single_row_and_monotone(spark):
    df = spark.createDataFrame([(1, 5.0, 1)], "id: long, price: double, size: long")
    assert skyline_2d(df, minimize="price", maximize="size").count() == 1

    mono = spark.createDataFrame(
        [(i, float(i), i) for i in range(1, 6)], "id: long, price: double, size: long"
    )
    # strictly increasing on both → every row is Pareto-optimal
    assert skyline_2d(mono, minimize="price", maximize="size").count() == 5
