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

Scale shape: the centroids are driver-side data between Lloyd rounds
(one bounded k·dim collect per round), so assignment is a NARROW
projection — each row computes its k distances against plan-literal
centroids and takes ``array_min`` over (dist2, cell) structs; the
corpus is never shuffled, never crossJoined, never windowed. The
update is one partial+final aggregate per (cell, idx) whose result
(k·dim doubles) is collected and becomes the next round's literals,
exactly like the IVF centroid fold. Iterations are driver-driven but
each costs ONE pass over the corpus; k·dim stays tiny (the collected
state is kilobytes at production k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lit_vec(vec: "list[float]") -> F.Column:
    # one py4j call for the whole array literal (an F.lit per element
    # costs dim round-trips per centroid at plan-build time)
    return F.lit([float(x) for x in vec])


def _d2_to(vec: F.Column, cvec: F.Column) -> F.Column:
    """Squared L2, rounded 6 dp — the exact expression the window
    formulation used, so the chosen cell and reported dist2 are
    bit-identical."""
    return F.round(
        F.aggregate(
            F.zip_with(
                vec,
                cvec,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _nearest_cell(cents_data: "list[tuple[int, list[float]]]", vec_col: str) -> F.Column:
    """Nearest centroid by squared L2 (rounded 6 dp; ties → lowest
    cell) as ONE narrow projection: the k centroids are driver-side
    data already (they arrive via collect between Lloyd rounds), so
    they ride as plan literals and the argmin is
    ``array_min(array<struct<dist2, cell>>)`` — struct ordering is
    lexicographic, so ties on dist2 break to the lowest cell exactly
    like the previous ``Window.orderBy(dist2, cell)`` formulation.
    This removes, PER ASSIGNMENT PASS, the corpus×k crossJoin row
    expansion and the full-corpus hash shuffle + sort the per-id
    window needed (guide §2.4: remove shuffles outright) — the corpus
    is never shuffled at all, which is also the only assignment shape
    that survives 100 TB (the k·N window shuffle was the scale
    hazard). Returns a struct column (dist2, cell)."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _d2_to(F.col(vec_col), _lit_vec(vec)).alias("dist2"),
                    F.lit(int(cell)).cast("int").alias("cell"),
                )
                for cell, vec in cents_data
            ]
        )
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
    if not cents_data:
        # empty seed sample (no ids with id%7==0) → no clusters to
        # assign; the old crossJoin+window formulation returned an
        # empty frame here, and _nearest_cell over zero structs would
        # fail at analysis time (the pq_encode guard, mirrored)
        return corpus.select(
            F.col(id_col),
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("double").alias("dist2"),
        ).filter(F.lit(False))

    for _ in range(iterations):
        # assignment is a narrow projection (no crossJoin, no window
        # shuffle) and the member vectors ride in the same row — the
        # old assigned⋈corpus re-join is gone with them; the ONLY
        # shuffle per Lloyd round is the (cell, idx) partial+final
        # aggregate, whose k·dim result is the next round's literals
        best = _nearest_cell(cents_data, vec_col)
        upd = (
            corpus.select(best.getField("cell").alias("cell"), F.col(vec_col))
            .select("cell", F.posexplode(vec_col).alias("idx", "x"))
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

    # bind the argmin struct ONCE in its own projection: two direct
    # getField references would re-evaluate the whole k×dim distance
    # array per field (HOF expressions sit outside codegen subexpr
    # elimination); CollapseProject keeps the split because the struct
    # is non-cheap and referenced twice
    scored = corpus.select(F.col(id_col), _nearest_cell(cents_data, vec_col).alias("__b"))
    return scored.select(
        F.col(id_col),
        F.col("__b.cell").cast("long").alias("cluster"),
        F.col("__b.dist2").alias("dist2"),
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
    cb_rows = _pq_codebook_rows(
        corpus, id_col=id_col, vec_col=vec_col, dim=dim, m=m, k=k
    )
    return corpus.sparkSession.createDataFrame(
        cb_rows, "subspace int, cell int, cvec array<double>"
    )


def _pq_codebook_rows(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int,
    k: int,
) -> "list[tuple[int, int, list[float]]]":
    """The (subspace, cell, cvec) codebook rows as driver-side data —
    m·k rows, one bounded collect. ``pq_codebook`` wraps them as a
    DataFrame (the LUT join path); ``pq_encode`` embeds them as plan
    literals (the kmeans literal-argmin path)."""
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
    return cb_rows


def pq_encode(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    k: int = 4,
    codebook_rows: "list[tuple[int, int, list[float]]] | None" = None,
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

    Scale shape: the corpus is read once and NEVER shuffled — the
    codebook is driver-side data (one bounded m·k collect), so each
    subspace's argmin is a literal ``array_min(array<struct<dist2,
    cell>>)`` exactly like the kmeans assignment (struct ordering
    breaks dist2 ties to the lowest cell, identical to the previous
    per-(id, subspace) window's ``orderBy(dist2, cell)``), and the m
    per-row winners posexplode AFTER the argmin. The old shape
    (explode → broadcast-join the codebook → window) shuffled and
    sorted N·m·k rows per encode; this one is map-only (guide §2.4).
    Returns ``(id, subspace, code, dist2)``.
    """
    cb_rows = (
        codebook_rows
        if codebook_rows is not None
        else _pq_codebook_rows(
            corpus, id_col=id_col, vec_col=vec_col, dim=dim, m=m, k=k
        )
    )
    if not cb_rows:
        # empty seed sample → no codewords to assign (the old
        # join-based shape produced zero rows here too)
        return corpus.select(
            F.col(id_col),
            F.lit(None).cast("long").alias("subspace"),
            F.lit(None).cast("long").alias("code"),
            F.lit(None).cast("double").alias("dist2"),
        ).filter(F.lit(False))
    by_sub: "dict[int, list[tuple[int, list[float]]]]" = {}
    for s, cell, cvec in cb_rows:
        by_sub.setdefault(s, []).append((cell, cvec))
    sub_dim = dim // m
    winners = F.array(
        *[
            F.array_min(
                F.array(
                    *[
                        F.struct(
                            _d2_to(
                                F.slice(vec_col, s * sub_dim + 1, sub_dim),
                                _lit_vec(cvec),
                            ).alias("dist2"),
                            F.lit(int(cell)).cast("int").alias("cell"),
                        )
                        for cell, cvec in sorted(by_sub.get(s, []))
                    ]
                )
            )
            for s in range(m)
        ]
    )
    return corpus.select(
        F.col(id_col), F.posexplode(winners).alias("subspace", "__b")
    ).select(
        F.col(id_col),
        F.col("subspace").cast("long").alias("subspace"),
        F.col("__b.cell").cast("long").alias("code"),
        F.col("__b.dist2").alias("dist2"),
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
    # ONE seed-sample collect serves both the LUT codebook and the
    # encode literals (each used to run its own TakeOrdered job over
    # the corpus at plan-build time — identical rows by construction)
    cb_rows = _pq_codebook_rows(
        corpus, id_col=id_col, vec_col=vec_col, dim=dim, m=m, k=k
    )
    codebook = corpus.sparkSession.createDataFrame(
        cb_rows, "subspace int, cell int, cvec array<double>"
    )
    codes = pq_encode(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        m=m,
        k=k,
        codebook_rows=cb_rows,
    )
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
