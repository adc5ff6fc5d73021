"""Connected-components / transitive dedup cluster tests."""

from __future__ import annotations

from bangumi_notion_data_integration_project_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def test_chain_collapses_to_min_label(spark):
    # 1-2, 2-3, 3-4 chain (diameter 3) + separate pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a: long, id_b: long"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_star_and_cycle(spark):
    edges = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)], "id_a: long, id_b: long"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert {got[5], got[1], got[2], got[3]} == {1}
    assert {got[7], got[8], got[9]} == {7}


def test_dedup_clusters_keep_one_per_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id: long")
    pairs = spark.createDataFrame([(1, 2), (2, 5), (3, 6)], "id_a: long, id_b: long")
    clustered = dedup_clusters(pairs, docs, id_col="doc_id")
    got = {r["doc_id"]: r["cluster_id"] for r in clustered.collect()}
    assert got == {1: 1, 2: 1, 5: 1, 3: 3, 6: 3, 4: 4, 7: 7}
    keepers = sorted(
        r["doc_id"] for r in clustered.filter("doc_id = cluster_id").collect()
    )
    assert keepers == [1, 3, 4, 7]
