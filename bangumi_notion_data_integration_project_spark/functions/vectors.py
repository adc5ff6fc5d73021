"""Dense-vector math over `array<float>` embedding columns.

Native higher-order functions (`zip_with` + `aggregate`) keep the dot
product JVM-side; elements are cast to double before summation so the
result is bit-identical to an ANSI-SQL oracle that does the same.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right sum of elementwise products (double)."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_product_arrow(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched pair dot product: one vectorized einsum per batch.

    The higher-order-function form above never enters whole-stage
    codegen — every pair pays ~2·dim interpreted expression
    evaluations, which is the wall-clock of the similarity verify stage
    at production dims (768–1024). This variant ships both vectors to
    Python once per Arrow batch and reduces them with a single
    `einsum('ij,ij->i')`; see tools/bench_dot.py + SCALING.md for the
    measured crossover. Floating-point note: numpy's pairwise
    summation differs from the sequential fold in the last ulp, so
    oracle-hash-checked queries keep the HOF form (6-dp rounding makes
    a mismatch astronomically unlikely but the bench path needn't risk
    it); use this in throughput-bound verify stages.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(va, vb):
        # untyped signature + explicit SCALAR semantics: the module uses
        # postponed annotations, under which pandas_udf cannot resolve
        # `pd.Series` hints from a nested scope
        import numpy as np
        import pandas as pd

        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(va.to_numpy())
        B = np.stack(vb.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", A.astype("float64"), B.astype("float64")))

    return _dot(_col(a), _col(b))


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(
        _col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))
