"""Unit tests for the distributed PCA split (exact Gram + driver eig)."""

from __future__ import annotations

import numpy as np
import pytest

from bangumi_notion_data_integration_project_spark.operators.pca import (
    QUANT_SCALE,
    _round_half_away,
    covariance_matrix,
    pca_eig,
)


def _vec_frame(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id: long, embedding: array<float>",
    )


def test_round_half_away_matches_sql_round():
    x = np.array([2.5, -2.5, 1.4, -1.4, 0.5, -0.5, 3.0])
    assert _round_half_away(x).tolist() == [3.0, -3.0, 1.0, -1.0, 1.0, -1.0, 3.0]


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(4)
    X = rng.normal(size=(200, 8)).astype(np.float32)
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(_vec_frame(spark, X), "embedding", 8).collect()
    }
    Xq = _round_half_away(X.astype(np.float64) * QUANT_SCALE) / QUANT_SCALE
    C = np.cov(Xq.T, bias=True)
    for (i, j), v in got.items():
        assert v == pytest.approx(C[i, j], abs=1e-15), (i, j)


def test_covariance_partition_invariant(spark):
    rng = np.random.default_rng(9)
    X = rng.normal(size=(300, 8)).astype(np.float32)
    df = _vec_frame(spark, X)
    one = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df.coalesce(1), "embedding", 8).collect()
    }
    many = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df.repartition(16), "embedding", 8).collect()
    }
    assert one == many  # exact equality: integer-valued partials


def test_pca_eig_matches_numpy_full_pca(spark):
    rng = np.random.default_rng(2)
    # anisotropic data: leading component carries most variance
    base = rng.normal(size=(400, 6))
    base[:, 0] *= 5.0
    X = base.astype(np.float32)
    rows = covariance_matrix(_vec_frame(spark, X), "embedding", 6).collect()
    comps = pca_eig(rows, 6, 3)
    Xq = _round_half_away(X.astype(np.float64) * QUANT_SCALE) / QUANT_SCALE
    evs = np.linalg.eigvalsh(np.cov(Xq.T, bias=True))[::-1]
    total = evs.sum()
    for k, (c, ev, ratio, cum) in enumerate(comps):
        assert c == k
        assert ev == pytest.approx(evs[k], rel=1e-9)
        assert ratio == pytest.approx(evs[k] / total, rel=1e-9)
    assert comps[0][2] > 0.6  # leading axis dominates by construction


def test_pca_eig_degenerate_and_overlong_topk(spark):
    X = np.ones((50, 4), dtype=np.float32)  # zero variance everywhere
    rows = covariance_matrix(_vec_frame(spark, X), "embedding", 4).collect()
    comps = pca_eig(rows, 4, 10)  # top_k > dim must clamp, not IndexError
    assert len(comps) == 4
    assert all(ratio == 0.0 for _, _, ratio, _ in comps)
