"""Distributed PCA: exact fixed-point covariance + tiny-matrix eig.

The scale decomposition every production PCA uses: the only data-sized
work is accumulating the d×d Gram matrix, which is embarrassingly
map-side — each partition computes its own ``Xᵀ·X`` with one BLAS call
over the Arrow batch and emits a single (count, Σx, Gram) row; the
reduce adds ≤ #partitions tiny rows. The eigendecomposition then runs
on the driver over a constant-size (d², not n) matrix. Nothing
data-sized ever shuffles; adding executors scales the Gram pass
linearly.

Exactness contract (same trick as operators/stats.py, adapted to
floats): embeddings are quantized to a 2⁻¹⁰ fixed-point grid
(half-away-from-zero, matching Spark's and DuckDB's ``round``), so
every Gram product is an integer ≤ 2²⁴ and every partial sum stays an
exact integer-valued float64 (< 2⁵³ for corpora up to ~5·10⁸ rows per
partition) — summation ORDER cannot change the result, making the
covariance bit-identical across partitionings and engines. The
quantization step (‖ε‖∞ ≤ 2⁻¹¹) is part of the operator's declared
semantics, not an error source: the oracle applies the identical grid.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1024.0  # 2^10 fixed-point grid


def _round_half_away(x: np.ndarray) -> np.ndarray:
    # Spark round() and DuckDB round() are HALF_UP (away from zero);
    # np.rint is half-even — replicate the SQL behavior exactly
    return np.copysign(np.floor(np.abs(x) + 0.5), x)


def _gram_partials(vec_col: str, dim: int):
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((dim, dim), dtype=np.float64)
        s = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xq = _round_half_away(x * QUANT_SCALE)
            g += xq.T @ xq
            s += xq.sum(axis=0)
            n += len(pdf)
        yield pd.DataFrame(
            {"n": [n], "sums": [s.tolist()], "gram": [g.reshape(-1).tolist()]}
        )

    return compute


def covariance_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Population covariance of a ``array<float>`` column on the 2⁻¹⁰
    grid: returns the upper triangle as (i, j, cov) rows — i, j are
    0-based dims, cov = (n·Σxᵢxⱼ − Σxᵢ·Σxⱼ)/n² in ORIGINAL units.

    One map-only Gram pass (see module docstring) + a #partitions-row
    reduce; the (i, j) explode happens on the single reduced row.
    """
    partials = df.select(vec_col).mapInPandas(
        _gram_partials(vec_col, dim), schema="n long, sums array<double>, gram array<double>"
    )
    # collect the ≤ #partitions partial rows into ONE row, then fold
    # arrays element-wise with zip_with — a constant-size expression
    # tree (the naive per-cell d²/2 aggregate-column formulation plans
    # in minutes at d=64; this plans in milliseconds). Fold order is
    # whatever collect_list saw, which is fine: every partial is an
    # exact integer-valued float64, so addition order cannot matter.
    one = partials.agg(
        F.sum("n").alias("n"),
        F.collect_list("sums").alias("ss"),
        F.collect_list("gram").alias("gs"),
    )
    zeros = lambda k: F.array_repeat(F.lit(0.0), k)  # noqa: E731
    fold = lambda col, k: F.aggregate(  # noqa: E731
        col, zeros(k), lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
    )
    summed = one.select(
        F.col("n").cast("double").alias("n"),
        fold(F.col("ss"), dim).alias("s"),
        fold(F.col("gs"), dim * dim).alias("g"),
    )
    cells = summed.select("n", "s", F.posexplode("g").alias("idx", "gij"))
    return (
        cells.withColumn("i", (F.col("idx") / dim).cast("int"))
        .withColumn("j", (F.col("idx") % dim).cast("int"))
        .filter(F.col("j") >= F.col("i"))
        .select(
            "i",
            "j",
            (
                (
                    F.col("n") * F.col("gij")
                    - F.element_at("s", F.col("i") + 1) * F.element_at("s", F.col("j") + 1)
                )
                / (F.col("n") * F.col("n"))
                / F.lit(QUANT_SCALE * QUANT_SCALE)
            ).alias("cov"),
        )
    )


def pca_eig(cov_rows: list, dim: int, top_k: int) -> list[tuple[int, float, float, float]]:
    """Driver-side eigendecomposition of the collected covariance
    triangle (constant-size d×d work — the distributed part of PCA is
    the Gram pass, not this). Returns (component, eigenvalue,
    explained_ratio, cumulative_ratio) for the top_k components,
    eigenvalues descending."""
    m = np.zeros((dim, dim))
    for r in cov_rows:
        m[r["i"], r["j"]] = r["cov"]
        m[r["j"], r["i"]] = r["cov"]
    vals = np.linalg.eigvalsh(m)[::-1]  # descending
    total = float(vals.sum())
    out = []
    cum = 0.0
    # degenerate corpus (all vectors on one grid point) has zero total
    # variance: report a defined all-zero spectrum, not a ZeroDivision
    for k in range(min(top_k, dim)):
        ratio = float(vals[k]) / total if total > 0 else 0.0
        cum += ratio
        out.append((k, float(vals[k]), ratio, cum))
    return out
