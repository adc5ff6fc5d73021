"""Connected-components / transitive dedup cluster tests."""

from __future__ import annotations

import pytest

from bangumi_notion_data_integration_project_spark.operators.components import (
    ConvergenceError,
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


def _chain(spark, n):
    """Path graph 0-1-...-n: label 0 travels one hop per round, so the
    fixpoint needs exactly ``n`` (diameter) iterations."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a: long, id_b: long"
    )


def test_nonconverged_raises_loudly(spark):
    # diameter 8 > budget 3: silent partial labels would select wrong
    # keepers downstream — the default must be a hard error
    with pytest.raises(ConvergenceError, match="did not converge within 3"):
        connected_components(_chain(spark, 8), max_iterations=3).collect()


def test_nonconverged_flag_mode_marks_rows(spark):
    got = connected_components(
        _chain(spark, 8), max_iterations=3, on_nonconverged="flag"
    )
    rows = got.collect()
    assert "converged" in got.columns
    assert rows and all(r["converged"] is False for r in rows)
    # partial labels are still the 3-round propagation state, not garbage
    labels = {r["node"]: r["component"] for r in rows}
    assert labels[0] == 0 and labels[8] == 5  # label 8-3 hops away


def test_exact_budget_converges_without_error(spark):
    # diameter 4 chain with budget 5: converges (needs one extra round
    # to observe changed == 0) and must NOT raise or grow a flag column
    got = connected_components(_chain(spark, 4), max_iterations=5)
    assert got.columns == ["node", "component"]
    assert {r["component"] for r in got.collect()} == {0}


def test_dedup_clusters_propagates_nonconvergence(spark):
    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id: long")
    with pytest.raises(ConvergenceError):
        dedup_clusters(
            _chain(spark, 9), docs, id_col="doc_id", max_iterations=2
        ).collect()
    flagged = dedup_clusters(
        _chain(spark, 9),
        docs,
        id_col="doc_id",
        max_iterations=2,
        on_nonconverged="flag",
    )
    by_id = {r["doc_id"]: r for r in flagged.collect()}
    assert by_id[5]["converged"] is False  # chain member: unproven
    assert by_id[11]["converged"] is True  # singleton outside any pair


# ---------------------------------------------------------------------------
# Large-star/small-star variant: same contract, O(log^2) rounds
# ---------------------------------------------------------------------------


def _star(spark, edges, **kw):
    from bangumi_notion_data_integration_project_spark.operators.components import (
        connected_components_star,
    )

    return connected_components_star(edges, **kw)


def test_star_matches_minlabel_on_random_graphs(spark):
    import random

    for seed in (3, 17, 41):
        rng = random.Random(seed)
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(35)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a: long, id_b: long")
        want = {
            r["node"]: r["component"] for r in connected_components(df).collect()
        }
        got = {r["node"]: r["component"] for r in _star(spark, df).collect()}
        assert got == want, f"seed {seed}: {got} != {want}"


def test_star_converges_where_minlabel_budget_fails(spark):
    # diameter-63 chain: min-label needs 63 rounds and RAISES at 15;
    # the star rounds rewire the graph and converge well inside 15
    chain = _chain(spark, 63)
    with pytest.raises(ConvergenceError):
        connected_components(chain, max_iterations=15).collect()
    got = _star(spark, chain, max_iterations=15)
    assert {r["component"] for r in got.collect()} == {0}


def test_star_nonconverged_is_loud(spark):
    with pytest.raises(ConvergenceError, match="fixpoint"):
        _star(spark, _chain(spark, 40), max_iterations=1).collect()
    flagged = _star(
        spark, _chain(spark, 40), max_iterations=1, on_nonconverged="flag"
    )
    assert "converged" in flagged.columns


def test_dedup_clusters_star_algorithm_matches_minlabel(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id: long")
    pairs = spark.createDataFrame([(1, 2), (2, 5), (3, 6)], "id_a: long, id_b: long")
    a = dedup_clusters(pairs, docs, id_col="doc_id")
    b = dedup_clusters(pairs, docs, id_col="doc_id", algorithm="star")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
