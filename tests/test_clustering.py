"""Deterministic k-means (operators/clustering.py) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.clustering import kmeans_lite


def test_kmeans_assigns_every_vector_once(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = kmeans_lite(emb, k=8, iterations=1)
    n = emb.count()
    rows = out.collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    assert {r["cluster"] for r in rows} <= set(range(8))
    assert all(r["dist2"] >= 0 for r in rows)


def test_kmeans_is_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(map(tuple, kmeans_lite(emb, k=4, iterations=1).collect()))
    b = sorted(map(tuple, kmeans_lite(emb, k=4, iterations=1).collect()))
    assert a == b


def test_kmeans_lloyd_update_does_not_increase_cost(spark, sf_dir):
    # Lloyd's algorithm is monotone in total within-cluster squared
    # distance; 6-dp centroid rounding perturbs by <= ~1e-6 per term
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def cost(iters):
        out = kmeans_lite(emb, k=8, iterations=iters)
        return out.agg(F.sum("dist2")).first()[0]

    c1, c2 = cost(1), cost(2)
    assert c2 <= c1 + 1e-3, (c1, c2)


def test_kmeans_separated_clusters_recovered(spark):
    # two tight blobs far apart; k=2 must split them exactly.
    # ids chosen so the %7 init picks one seed from EACH blob (0, 70)
    blob_a = [(i, [0.0 + 0.01 * i] * 8) for i in range(0, 5)]
    blob_b = [(70 + i, [100.0 + 0.01 * i] * 8) for i in range(0, 5)]
    df = spark.createDataFrame(blob_a + blob_b, "vec_id: long, embedding: array<double>")
    out = kmeans_lite(df, k=2, iterations=1).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert sorted(map(sorted, by_cluster.values())) == [
        [0, 1, 2, 3, 4],
        [70, 71, 72, 73, 74],
    ]


def test_kmeans_empty_seed_sample_returns_empty(spark):
    # no id is ≡ 0 (mod 7) → deterministic init has no seeds; the old
    # crossJoin+window form returned an empty frame, and the literal-
    # argmin form must guard (array_min over zero structs is a NullType
    # analysis error) — the pq_encode empty-codebook guard, mirrored
    df = spark.createDataFrame(
        [(1, [0.0] * 8), (8, [1.0] * 8)], "vec_id: long, embedding: array<double>"
    )
    out = kmeans_lite(df, k=2, iterations=1)
    assert out.columns == ["vec_id", "cluster", "dist2"]
    assert out.count() == 0


def test_pq_encode_matches_python(spark, sf_dir):
    """PQ encode vs a pure-Python re-derivation: same seeds, slicing,
    rounding, and lowest-cell tie-break."""
    import numpy as np

    from bangumi_notion_data_integration_project_spark.catalog import load_table
    from bangumi_notion_data_integration_project_spark.operators.clustering import (
        pq_encode,
    )

    e = load_table(spark, sf_dir, "embeddings")
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in e.collect()}
    seeds = [rows[i] for i in sorted(v for v in rows if v % 7 == 0)[:4]]
    got = pq_encode(e, dim=64, m=4, k=4).collect()
    assert len(got) == 4 * len(rows)
    for r in got:
        vec = rows[r["vec_id"]]
        s = int(r["subspace"])
        sv = np.array(vec[s * 16 : (s + 1) * 16])
        dists = [
            round(float(((sv - np.array(seed[s * 16 : (s + 1) * 16])) ** 2).sum()), 6)
            for seed in seeds
        ]
        best = min(range(4), key=lambda c: (dists[c], c))
        assert r["code"] == best
        assert r["dist2"] == dists[best]


def test_pq_encode_rejects_uneven_split(spark, sf_dir):
    import pytest as _pytest

    from bangumi_notion_data_integration_project_spark.catalog import load_table
    from bangumi_notion_data_integration_project_spark.operators.clustering import (
        pq_encode,
    )

    e = load_table(spark, sf_dir, "embeddings")
    with _pytest.raises(ValueError):
        pq_encode(e, dim=64, m=5, k=4)


def test_pq_adc_topk_matches_python(spark, sf_dir):
    """ADC ranking vs numpy: LUT distances, summed lookups, tie on id."""
    import numpy as np

    from bangumi_notion_data_integration_project_spark.catalog import load_table
    from bangumi_notion_data_integration_project_spark.operators.clustering import (
        pq_adc_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    rows = {r["vec_id"]: np.array([float(x) for x in r["embedding"]]) for r in e.collect()}
    seeds = [rows[i] for i in sorted(v for v in rows if v % 7 == 0)[:4]]

    def codes_for(vec):
        out = []
        for s in range(4):
            sv = vec[s * 16 : (s + 1) * 16]
            d = [round(float(((sv - seed[s * 16 : (s + 1) * 16]) ** 2).sum()), 6) for seed in seeds]
            out.append(min(range(4), key=lambda c: (d[c], c)))
        return out

    queries = e.filter("vec_id in (0, 1, 2)")
    got = pq_adc_topk(e, queries, dim=64, m=4, k=4, topk=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["approx_dist2"]))
    all_codes = {v: codes_for(vec) for v, vec in rows.items()}
    for q in (0, 1, 2):
        qv = rows[q]
        lut = {
            (s, c): round(float(((qv[s * 16 : (s + 1) * 16] - seeds[c][s * 16 : (s + 1) * 16]) ** 2).sum()), 6)
            for s in range(4)
            for c in range(4)
        }
        approx = {
            v: round(sum(lut[(s, code)] for s, code in enumerate(cs)), 6)
            for v, cs in all_codes.items()
            if v != q
        }
        want = sorted(approx.items(), key=lambda kv: (kv[1], kv[0]))[:10]
        got_q = sorted(by_q[q])
        assert [(v, d) for _, v, d in got_q] == want
