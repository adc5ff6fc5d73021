"""Deterministic Lloyd k-means over embedding columns — the semantic
clustering primitive of the training-data pipeline (source balancing,
embedding-space curation, semantic dedup beyond pairwise cosine).

Iterative ML on Spark is usually rows-only for a SQL oracle; this
implementation is built so the WHOLE iteration is reproducible in ANSI
SQL and therefore hash-checkable:

- init centroids are a deterministic corpus sample (``id % 7 == 0``,
  first ``k`` by id — the same rule as ``ivf_topk``), not random;
- every Lloyd update rounds centroid components to 6 dp before the
  next assignment, so cross-engine float drift cannot compound;
- assignment ties break on the lowest cell index.

Scale shape: assignment is corpus ⨯ broadcast(k centroids) — the
corpus never shuffles; the update is one partial+final aggregate per
(cell, idx) whose result (k·dim doubles) is collected and re-broadcast
as plan literals, exactly like the IVF centroid fold. Iterations are
driver-driven but each costs ONE pass over the corpus; k·dim stays
tiny (the collected state is kilobytes at production k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _assign(corpus: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest centroid by squared L2 (rounded 6 dp; ties → lowest
    cell). Window argmin keeps the formulation identical to the ANSI
    oracle; swap for ``min_by`` at production scale (same result, one
    aggregate instead of a per-id window)."""
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("cvec"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    scored = corpus.crossJoin(F.broadcast(cents)).select(
        F.col(id_col), F.col("cell"), d2.alias("dist2")
    )
    w = Window.partitionBy(id_col).orderBy("dist2", "cell")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def kmeans_lite(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 1,
) -> DataFrame:
    """Run ``iterations`` Lloyd updates from the deterministic init and
    return the final assignment (id, cluster, dist2 — squared L2 to the
    final centroid, 6 dp). Fully reproducible across engines; the
    DuckDB oracle re-derives init, update, and assignment relationally.
    """
    spark = corpus.sparkSession
    init_rows = (
        corpus.select(id_col, vec_col)
        .filter(F.pmod(F.col(id_col), F.lit(7)) == 0)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    cents_data = [
        (i, [float(x) for x in row[vec_col]]) for i, row in enumerate(init_rows)
    ]
    cents = spark.createDataFrame(cents_data, "cell int, cvec array<double>")

    for _ in range(iterations):
        assigned = _assign(corpus, cents, id_col, vec_col)
        members = assigned.join(corpus.select(id_col, vec_col), id_col)
        upd = (
            members.select("cell", F.posexplode(vec_col).alias("idx", "x"))
            .groupBy("cell", "idx")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("cx"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("idx", "cx"))).alias("s"))
            .select("cell", F.col("s.cx").alias("cvec"))
            .collect()
        )
        new_map = {r["cell"]: list(r["cvec"]) for r in upd}
        # empty cells keep their previous centroid (no members → no mean)
        cents_data = [
            (cell, new_map.get(cell, vec)) for cell, vec in cents_data
        ]
        cents = spark.createDataFrame(cents_data, "cell int, cvec array<double>")

    final = _assign(corpus, cents, id_col, vec_col)
    return final.select(
        F.col(id_col),
        F.col("cell").cast("long").alias("cluster"),
        "dist2",
    )


def pq_codebook(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    k: int = 4,
) -> DataFrame:
    """Deterministic PQ codebook: the seed sample (``id % 7 == 0``,
    first ``k`` by id) sliced into ``m`` subspaces → (subspace, cell,
    cvec) rows, m·k total — broadcast-sized at any corpus scale."""
    if dim % m != 0:
        raise ValueError("dim must divide evenly into m subspaces")
    sub_dim = dim // m
    seeds = (
        corpus.select(id_col, vec_col)
        .filter(F.pmod(F.col(id_col), F.lit(7)) == 0)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    cb_rows = []
    for cell, row in enumerate(seeds):
        vec = [float(x) for x in row[vec_col]]
        for s in range(m):
            cb_rows.append((s, cell, vec[s * sub_dim : (s + 1) * sub_dim]))
    return corpus.sparkSession.createDataFrame(
        cb_rows, "subspace int, cell int, cvec array<double>"
    )


def pq_encode(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    k: int = 4,
) -> DataFrame:
    """Product-quantization ENCODE: split each vector into ``m``
    sub-vectors and assign each to its nearest codeword — the storage
    layer of an IVF-PQ ANN index (a dim-64 float vector compresses to
    m codes, here 4 bytes).

    The codebook is the deterministic seed sample (``id % 7 == 0``,
    first ``k`` by id — the same rule as ``kmeans_lite``/``ivf_topk``),
    sliced per subspace; production would refine it with per-subspace
    Lloyd rounds exactly as ``kmeans_lite`` does. Determinism makes the
    encode hash-checkable against an ANSI oracle.

    Scale shape: the corpus is read once, sub-vectors explode narrowly
    (m rows per vector, never shuffled), the codebook (m·k tiny rows)
    broadcasts, and the argmin is a per-(id, subspace) window. Returns
    ``(id, subspace, code, dist2)``.
    """
    codebook = pq_codebook(corpus, id_col=id_col, vec_col=vec_col, dim=dim, m=m, k=k)
    sub_dim = dim // m
    slices = F.array(
        *[F.slice(vec_col, s * sub_dim + 1, sub_dim) for s in range(m)]
    )
    subs = corpus.select(
        id_col, F.posexplode(slices).alias("subspace", "svec")
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("svec"),
                F.col("cvec"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    scored = subs.join(F.broadcast(codebook), "subspace").select(
        id_col, "subspace", "cell", d2.alias("dist2")
    )
    w = Window.partitionBy(id_col, "subspace").orderBy("dist2", "cell")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            F.col("subspace").cast("long").alias("subspace"),
            F.col("cell").cast("long").alias("code"),
            "dist2",
        )
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    k: int = 4,
    topk: int = 10,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — how an IVF-PQ
    index actually answers queries: per query, a lookup table of
    query-subvector → codeword distances (m·k entries) is built once,
    and each corpus vector's approximate distance is the SUM of m table
    lookups — no float vector is ever touched during the scan.

    Scale shape: the corpus is represented only by its codes (m small
    ints per vector); the per-query LUT (|queries|·m·k rows) broadcasts
    to the codes, and the only shuffle is the (query, id) partial-sum
    aggregate. Returns (query_id, vec_id, approx_dist2, rank), self
    matches excluded.
    """
    sub_dim = dim // m
    codebook = pq_codebook(corpus, id_col=id_col, vec_col=vec_col, dim=dim, m=m, k=k)
    codes = pq_encode(corpus, id_col=id_col, vec_col=vec_col, dim=dim, m=m, k=k)
    slices = F.array(
        *[F.slice(vec_col, s * sub_dim + 1, sub_dim) for s in range(m)]
    )
    qsubs = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(slices).alias("subspace", "qvec"),
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("qvec"),
                F.col("cvec"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    lut = qsubs.join(F.broadcast(codebook), "subspace").select(
        "query_id", "subspace", F.col("cell").alias("code"), d2.alias("d2")
    )
    approx = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("d2"), 6).alias("approx_dist2"))
    )
    w = Window.partitionBy("query_id").orderBy("approx_dist2", id_col)
    return (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", id_col, "approx_dist2", F.col("rank").cast("long").alias("rank"))
    )
