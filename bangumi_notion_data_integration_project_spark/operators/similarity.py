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

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot_product, l2_norm


def _paired_cosine(query_id_col: str, id_col: str) -> "F.Column":
    """Cosine from per-row precomputed norms (``__cnorm``/``__qnorm``)
    and the pair dot product. Factoring the norms out of the pair loop
    is algebraically (and bitwise) identical to computing the full
    cosine per pair, but evaluates each 64-element norm aggregate once
    per ROW instead of once per PAIR — ~3× fewer interpreted
    higher-order-function evaluations, the hot cost of this operator."""
    denom = F.col("__cnorm") * F.col("__qnorm")
    cos = F.when(denom > 0, dot_product("__vec", "__qvec") / denom).otherwise(F.lit(0.0))
    return F.round(cos, 6).alias("cosine_sim")


def _topk_by_sim(scored: DataFrame, query_id_col: str, id_col: str, k: int) -> DataFrame:
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )


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
    window on query_id (tiny). Norms are precomputed per row, not per
    pair (see ``_paired_cosine``).
    """
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        l2_norm(vec_col).alias("__cnorm"),
    )
    q = query.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        l2_norm(vec_col).alias("__qnorm"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, _paired_cosine(query_id_col, id_col)
    )
    return _topk_by_sim(scored, query_id_col, id_col, k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _sql_double(x: float) -> str:
    return f"cast('{float(x)!r}' as double)"


def _sql_dot(vec_col: str, vector: list[float]) -> str:
    arr = "array(" + ", ".join(_sql_double(x) for x in vector) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {arr}, (a, b) -> cast(a as double) * b), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def lsh_bucket_key(vec_col: str, planes: list[list[float]]):
    """Sign-bit bucket id from dot products against fixed hyperplanes.

    Emitted as one SQL expression (a single driver-side parse) — the
    per-element Column form costs one py4j round-trip per literal,
    ~1.4 s of pure plan-construction for 6×64-dim planes."""
    bits = [
        f"if({_sql_dot(vec_col, plane)} >= 0.0, {1 << i}L, 0L)"
        for i, plane in enumerate(planes)
    ]
    return F.expr(" + ".join(bits))


def srp_near_dup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via signed-random-projection
    buckets — the scale path for embedding dedup.

    All-pairs cosine is O(N²) and dead at 100 TB. Here the corpus is
    hashed once into 2^n_planes sign-bit buckets (narrow projection, the
    hyperplanes are plan literals), the self-join runs on the bucket key
    — so candidate pairs only materialize inside a bucket — and the
    cosine threshold is applied to candidates only. Vectors with cosine
    ≥ threshold tend to agree on most sign bits, so high-similarity
    pairs land in the same bucket with high probability; union several
    seeds to raise recall. Output: (id_a, id_b, cosine_sim) with
    id_a < id_b, rounded to 6dp BEFORE thresholding so the cut is
    engine-stable.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    h = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        l2_norm(vec_col).alias("__n"),
        lsh_bucket_key(vec_col, planes).alias("__bucket"),
    )
    a = h.select(
        F.col(id_col).alias("id_a"),
        F.col("__vec").alias("__va"),
        F.col("__n").alias("__na"),
        "__bucket",
    )
    b = h.select(
        F.col(id_col).alias("id_b"),
        F.col("__vec").alias("__vb"),
        F.col("__n").alias("__nb"),
        "__bucket",
    )
    denom = F.col("__na") * F.col("__nb")
    cos = F.when(denom > 0, dot_product("__va", "__vb") / denom).otherwise(F.lit(0.0))
    return (
        a.join(b, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def srp_near_dup_topk(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """PRODUCTION-SAFE bounded variant of :func:`srp_near_dup`: per
    vector, its top-``k`` same-bucket neighbors by cosine — output is
    O(N·k) BY CONSTRUCTION, never background-density quadratic.

    The threshold variant's output on independent data grows with the
    number of pairs above the cosine cut — inherently quadratic in
    bucket occupancy (SCALING.md measured 123× pairs at 10× data).
    Capping at k per vector makes the output contract linear no matter
    how dense the similarity graph gets, which is the form a 100 TB
    dedup pipeline actually consumes (each doc keeps its best
    near-dup candidates; clustering happens downstream). Candidates
    still come only from the vector's own SRP bucket, the window
    partitions by vector id (no global sort), and ties break on
    neighbor id after 6-dp rounding so the cut is engine-stable.

    Returns (vec_id, neighbor_id, cosine_sim, rank), directed.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    h = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        l2_norm(vec_col).alias("__n"),
        lsh_bucket_key(vec_col, planes).alias("__bucket"),
    )
    a = h.select(
        F.col(id_col).alias("vec_id_q"),
        F.col("__vec").alias("__va"),
        F.col("__n").alias("__na"),
        "__bucket",
    )
    b = h.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec").alias("__vb"),
        F.col("__n").alias("__nb"),
        "__bucket",
    )
    denom = F.col("__na") * F.col("__nb")
    cos = F.when(denom > 0, dot_product("__va", "__vb") / denom).otherwise(F.lit(0.0))
    return (
        a.join(b, "__bucket")
        .filter(F.col("vec_id_q") != F.col("neighbor_id"))
        .select(
            F.col("vec_id_q").alias("vec_id"),
            "neighbor_id",
            F.round(cos, 6).alias("cosine_sim"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
                )
            ),
        )
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer routes vectors
    into cells; each query scans only its ``n_probe`` nearest cells.

    Centroids are a deterministic sample of the corpus (every
    ``id % step == 0`` row, first ``n_cells``), collected once at plan
    build and folded into the plan as literals — so cell assignment is
    a pure projection (no shuffle, no Python), exactly like the LSH
    hyperplanes. At 100 TB the assignment pass is embarrassingly
    parallel; the only exchange is the final per-query top-k window.
    Recall < 1.0 by design → rows-only correctness check; pair with
    ``brute_force_topk`` to measure recall.
    """
    sample = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .filter(F.pmod(F.col(id_col), F.lit(7)) == 0)
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    )
    centroids = [[float(x) for x in row[vec_col]] for row in sample]
    norms = [math.sqrt(sum(x * x for x in c)) for c in centroids]

    def _sims(col_name: str):
        # routing only needs argmax over centroids; the row norm is a
        # positive constant across them, so dot/|centroid| ranks cells
        # identically to full cosine — one SQL parse, no per-row sqrt
        sims = [
            "cast(0.0 as double)"
            if norms[i] == 0.0
            else f"{_sql_dot(col_name, c)} / {_sql_double(norms[i])}"
            for i, c in enumerate(centroids)
        ]
        return F.expr("array(" + ", ".join(sims) + ")")

    # corpus: one cell per vector (argmax similarity, first wins on tie)
    ck = corpus.withColumn("__sims", _sims(vec_col)).withColumn(
        "__cell", F.array_position(F.col("__sims"), F.array_max("__sims")).cast("int")
    ).drop("__sims")

    # query: its n_probe best cells
    qs = query.withColumn("__sims", _sims(vec_col)).select(
        query_id_col,
        F.col(vec_col).alias("__qvec"),
        F.posexplode("__sims").alias("__pos", "__csim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__csim").desc(), F.col("__pos"))
    qk = (
        qs.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select(query_id_col, "__qvec", (F.col("__pos") + 1).cast("int").alias("__cell"))
    )

    joined = ck.withColumn("__vec", F.col(vec_col)).withColumn(
        "__cnorm", l2_norm(vec_col)
    ).join(F.broadcast(qk.withColumn("__qnorm", l2_norm("__qvec"))), "__cell")
    scored = joined.select(query_id_col, id_col, _paired_cosine(query_id_col, id_col))
    return _topk_by_sim(scored, query_id_col, id_col, k)


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
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    Recall < 1.0 by design. Scale path: the corpus is hashed once
    (narrow projection) and shuffled on the bucket key — the
    ``multiprobe`` fan-out happens entirely on the (tiny, broadcast)
    QUERY side: each query probes its own bucket plus every bucket at
    Hamming distance 1 (one sign bit flipped), n_planes+1 probes total.
    A near neighbor missed by the primary bucket often differs in one
    borderline sign bit, so 1-bit multiprobe widens the net at zero
    corpus-side cost. Measured on the recall harness: ~2× recall@10 on
    the synthetic corpus — a worst case, since its vectors are
    near-uniform (true neighbors sit at cosine ≈ 0.3, flipping ~2-3 of
    6 sign bits); on clustered real embeddings, where neighbors agree
    on most bits, the same probe set recovers most single-bucket
    recall loss. Probed buckets are distinct and each corpus vector
    lives in exactly one bucket, so no candidate dedup is needed.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    ck = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        l2_norm(vec_col).alias("__cnorm"),
        lsh_bucket_key(vec_col, planes).alias("__bucket"),
    )
    qk = query.select(
        query_id_col,
        F.col(vec_col).alias("__qvec"),
        l2_norm(vec_col).alias("__qnorm"),
        lsh_bucket_key(vec_col, planes).alias("__bucket"),
    )
    if multiprobe:
        flips = [0] + [1 << i for i in range(n_planes)]
        qk = qk.withColumn(
            "__bucket",
            F.explode(
                F.array(*[F.col("__bucket").bitwiseXOR(F.lit(f)) for f in flips])
            ),
        )
    joined = ck.join(F.broadcast(qk), "__bucket")
    scored = joined.select(query_id_col, id_col, _paired_cosine(query_id_col, id_col))
    return _topk_by_sim(scored, query_id_col, id_col, k)
