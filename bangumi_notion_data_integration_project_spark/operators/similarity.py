"""Approximate-nearest-neighbor search over embedding columns (M5).

Two strategies:

- brute-force: broadcast the query vector(s), one pass over the corpus,
  window top-k. Linear scan — the correct baseline, and at 100 TB the
  broadcast side is the query set, so no shuffle of the corpus at all.
- LSH (random hyperplanes): sign-bit bucket key per vector; candidates
  only meet inside a bucket → sub-linear candidate generation for
  large query sets, at recall cost. The hyperplanes are generated from
  a seeded RNG on the driver and folded into the plan as literals.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    query: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    `query` has (query_id, embedding). The query side is broadcast —
    the corpus never shuffles; the only exchange is the final top-k
    window on query_id (tiny).
    """
    q = query.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q))
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(cosine_similarity(vec_col, "__qvec"), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_key(vec_col: str, planes: list[list[float]]):
    """Sign-bit bucket id from dot products against fixed hyperplanes."""
    bits = []
    for i, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0)))
    key = bits[0]
    for b in bits[1:]:
        key = key + b
    return key


def lsh_topk(
    corpus: DataFrame,
    query: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    Recall < 1.0 by design (rows-only correctness check). Scale path:
    the corpus is hashed once (narrow projection), shuffled on the
    8-bit bucket key, and each query probes exactly one bucket.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    ck = corpus.withColumn("__bucket", lsh_bucket_key(vec_col, planes))
    qk = query.withColumn("__bucket", lsh_bucket_key(vec_col, planes)).select(
        query_id_col, F.col(vec_col).alias("__qvec"), "__bucket"
    )
    joined = ck.join(F.broadcast(qk), "__bucket")
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(cosine_similarity(vec_col, "__qvec"), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )
