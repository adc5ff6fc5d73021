"""TextRank keyword extraction (Mihalcea & Tarau 2004): rank candidate
words by weighted PageRank over their co-occurrence graph.

The graph-based sibling of RAKE (``operators/keywords.py``): where RAKE
scores phrases by degree/frequency inside stopword-free runs, TextRank
builds an undirected word graph — an edge per pair of candidate words
within a sliding window of the candidate sequence, weighted by
co-occurrence count — and runs a fixed number of damped power
iterations, the pagerank recipe specialized to weighted edges:

    s(v) = (1 - d) + d * Σ_{u~v}  w(u,v) / wdeg(u) * s(u)

Scale design mirrors ``operators/graph.pagerank``: the window pairing
is per-document lead() windows (bounded by document length — no
self-join), edge weights are one map-side-combinable groupBy, and each
iteration is one node-sized join plus one aggregate on the destination
key. The iteration count is fixed, so the plan is bounded and an
unrolled-SQL oracle can replay it (the pagerank/k-core pattern);
ordering on the ROUNDED rank keeps a future registry top-k stable
across engines' FP summation orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS_EN, tokens


def word_graph(
    df: DataFrame,
    doc_id_col: str,
    text_col: str | Column,
    *,
    stopwords: "list[str] | None" = None,
    window: int = 2,
) -> DataFrame:
    """Canonical weighted co-occurrence edges ``(w1 < w2, weight)``.

    Candidates are the lowercased non-stopword tokens of each document
    in order (RAKE's tokenizer conventions: '' edge tokens filtered,
    case-insensitive stopword test). An edge joins candidates at
    distance ≤ ``window`` in the CANDIDATE sequence (the classic
    TextRank definition — stopwords don't block adjacency); its weight
    counts co-occurrences over the corpus. Self-loops (a word repeated
    within the window) are dropped.

    Input contract: ONE ROW PER DOCUMENT — ``doc_id_col`` must be
    unique, and that is asserted fail-loud at execution (a duplicated
    doc_id would imply a multi-row document whose token order this
    operator has no column to reconstruct; silently treating the rows
    as separate documents, or interleaving them, would both be wrong).
    Adjacency itself is keyed per row, which under the asserted
    contract IS per document."""
    if window < 1:
        raise ValueError("window must be >= 1")
    sw = [w.lower() for w in (stopwords or STOPWORDS_EN)]
    did = F.col(doc_id_col)
    # contract gate as a SCALAR aggregate (always exactly one row,
    # __dup NULL when clean): a doc_id-only map-side groupBy, never a
    # window over the text payload — the gate must not shuffle the
    # corpus it guards
    gate = (
        df.groupBy(did.alias("__did"))
        .agg(F.count("*").alias("__c"))
        .agg(
            # boolean sentinel, NOT the key itself: max(NULL key) would
            # read as "no duplicates" and let duplicated NULL doc_ids
            # slip through the fail-loud contract
            F.max(F.when(F.col("__c") > 1, F.lit(True))).alias("__dup"),
            F.max(
                F.when(F.col("__c") > 1, F.col("__did").cast("string"))
            ).alias("__dup_key"),
        )
    )
    toks = (
        df.crossJoin(F.broadcast(gate))
        .select(
            # per-ROW id: duplicate doc_id values must never interleave
            # token streams (the keywords.py lesson) — and the contract
            # check makes a duplicate loud instead of silently per-row
            F.monotonically_increasing_id().alias("__rid"),
            F.when(
                F.col("__dup").isNotNull(),
                F.raise_error(
                    F.concat(
                        F.lit("word_graph: duplicate doc_id "),
                        F.coalesce(F.col("__dup_key"), F.lit("NULL")),
                        F.lit(" — the contract is one row per document"),
                    )
                ),
            )
            .otherwise(tokens(text_col))
            .alias("__tk"),
        )
        .select("__rid", F.posexplode("__tk").alias("pos", "tok"))
        .filter(F.length("tok") > 0)
        .withColumn("tok", F.lower("tok"))
        .filter(~F.col("tok").isin(sw))
    )
    w_doc = Window.partitionBy("__rid").orderBy("pos")
    # ALL window leads ride one Window operator (same partition/order
    # spec), then explode: the old per-distance union shuffled and
    # sorted the full token stream once PER DISTANCE; this computes
    # the identical pair multiset from a single shuffle + sort
    leads = toks.select(
        F.col("tok").alias("wa"),
        F.array(
            *[F.lead("tok", d).over(w_doc) for d in range(1, window + 1)]
        ).alias("__wbs"),
    )
    allp = leads.select(
        "wa", F.explode("__wbs").alias("wb")
    ).filter(F.col("wb").isNotNull())
    return (
        allp.filter(F.col("wa") != F.col("wb"))
        .select(
            F.least("wa", "wb").alias("w1"),
            F.greatest("wa", "wb").alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def weighted_pagerank(
    edges: DataFrame,
    *,
    iterations: int = 10,
    damping: float = 0.85,
    per_iteration_round: "int | None" = None,
) -> DataFrame:
    """Fixed-iteration weighted PageRank over canonical undirected
    edges ``(w1, w2, weight)``; returns ``(node, rank)`` with ranks
    initialized at 1.0 (the TextRank convention — the stationary scale
    with the additive ``1-d`` term, no ``/N``).

    ``per_iteration_round`` rounds every rank to that many digits at
    the END of each iteration. This is the cross-engine-exactness
    switch: a float sum over a node's neighbors is shuffle-order-
    dependent at the last ulp, and over N iterations that drift
    compounds; re-snapping both engines to the same 1e-9 grid every
    round means each iteration carries only ONE aggregation's ~1e-15
    drift into a 1e-9 grid — vanishing mismatch odds, where
    final-round-only (the parts_pagerank recipe) leaves N rounds of
    accumulation. Registry queries against
    :func:`weighted_pagerank_unrolled_sql` must set it."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    sym = edges.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst"), "weight"
    ).unionByName(
        edges.select(
            F.col("w2").alias("src"), F.col("w1").alias("dst"), "weight"
        )
    ).localCheckpoint(eager=False)  # scanned every iteration
    # pinned like sym: every iteration's share step joins against the
    # weighted degree, and without the pin each iteration re-aggregates
    # the full symmetric edge list to rebuild it (the graph.pagerank
    # deg-pin rationale — node-sized state, one compute)
    wdeg = sym.groupBy("src").agg(
        F.sum("weight").cast("double").alias("wdeg")
    ).select(F.col("src").alias("deg_node"), "wdeg").localCheckpoint(eager=False)
    nodes = sym.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=False
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        shares = ranks.join(wdeg, ranks["node"] == F.col("deg_node")).select(
            F.col("deg_node").alias("src"),
            (F.col("rank") / F.col("wdeg")).alias("share"),
        )
        contrib = (
            shares.join(sym, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("share") * F.col("weight")).alias("incoming"))
        )
        # symmetric graph: every node has wdeg > 0, incoming never null
        new_rank = F.lit(1.0 - damping) + F.lit(damping) * F.col("incoming")
        if per_iteration_round is not None:
            new_rank = F.round(new_rank, int(per_iteration_round))
        ranks = contrib.select(
            F.col("dst").alias("node"), new_rank.alias("rank")
        )
    return ranks


def textrank_keywords(
    df: DataFrame,
    doc_id_col: str,
    text_col: str | Column,
    *,
    stopwords: "list[str] | None" = None,
    window: int = 2,
    iterations: int = 10,
    damping: float = 0.85,
    top_k: int = 25,
    per_iteration_round: "int | None" = None,
) -> DataFrame:
    """Corpus top-k keywords: ``(rank, token, score)`` under a
    (rounded-score desc, token) total order. Scores rounded at 1e-9 —
    the parts_pagerank convention that keeps the top-k boundary stable
    across engines' FP summation orders. Registry queries checked
    against :func:`weighted_pagerank_unrolled_sql` must pass
    ``per_iteration_round`` (normally 9) — see
    :func:`weighted_pagerank`."""
    g = word_graph(
        df, doc_id_col, text_col, stopwords=stopwords, window=window
    )
    ranks = weighted_pagerank(
        g,
        iterations=iterations,
        damping=damping,
        per_iteration_round=per_iteration_round,
    )
    scored = ranks.select(
        F.col("node").alias("token"), F.round("rank", 9).alias("score")
    )
    top = scored.orderBy(F.col("score").desc(), "token").limit(top_k)
    w_rank = Window.orderBy(F.col("score").desc(), "token")
    return (
        top.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .select("rank", "token", "score")
        .orderBy("rank")
    )


def textrank_keyphrases(
    df: DataFrame,
    doc_id_col: str,
    text_col: str | Column,
    *,
    stopwords: "list[str] | None" = None,
    window: int = 2,
    iterations: int = 10,
    damping: float = 0.85,
    top_word_count: int = 50,
    top_k: int = 25,
    per_iteration_round: "int | None" = None,
) -> DataFrame:
    """The full TextRank pipeline: rank words, keep the
    ``top_word_count`` best (rounded-score, token tie-break — a
    deterministic total order, where the classic n/3 fraction would
    make the cut data-dependent), then collapse ADJACENT top words in
    the original token stream into multiword keyphrases scored by the
    sum of member scores folded in phrase order.

    Returns ``(rank, phrase, n_words, n_occurrences, score)`` under a
    (score desc, phrase) total order. The adjacency pass reuses the
    run-split shape from RAKE (consecutive-position runs per row id);
    the top-word lookup broadcasts."""
    sw = [w.lower() for w in (stopwords or STOPWORDS_EN)]
    ranks = weighted_pagerank(
        word_graph(df, doc_id_col, text_col, stopwords=sw, window=window),
        iterations=iterations,
        damping=damping,
        per_iteration_round=per_iteration_round,
    )
    top_words = (
        ranks.select(
            F.col("node").alias("tok"), F.round("rank", 9).alias("wscore")
        )
        .orderBy(F.col("wscore").desc(), "tok")
        .limit(int(top_word_count))
    )
    toks = (
        df.select(
            F.monotonically_increasing_id().alias("__rid"),
            tokens(text_col).alias("__tk"),
        )
        .select("__rid", F.posexplode("__tk").alias("pos", "tok"))
        .filter(F.length("tok") > 0)
        .withColumn("tok", F.lower("tok"))
        .join(F.broadcast(top_words), "tok")
    )
    # consecutive ORIGINAL positions group into one phrase run: pos
    # minus the rank among the document's selected tokens is constant
    # exactly on consecutive-pos stretches
    w_sel = Window.partitionBy("__rid").orderBy("pos")
    runs = toks.withColumn(
        "__run", F.col("pos") - F.row_number().over(w_sel)
    )
    occ = (
        runs.groupBy("__rid", "__run")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "tok", "wscore"))
            ).alias("__m")
        )
        .select(
            F.concat_ws(
                " ", F.transform("__m", lambda s: s["tok"])
            ).alias("phrase"),
            F.size("__m").cast("long").alias("n_words"),
            F.aggregate(
                F.transform("__m", lambda s: s["wscore"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__score"),
        )
    )
    phrases = occ.groupBy("phrase", "n_words", "__score").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    top = phrases.orderBy(F.col("__score").desc(), "phrase").limit(top_k)
    w_rank = Window.orderBy(F.col("__score").desc(), "phrase")
    return (
        top.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .select(
            "rank",
            "phrase",
            "n_words",
            "n_occurrences",
            F.round("__score", 6).alias("score"),
        )
        .orderBy("rank")
    )


def weighted_pagerank_unrolled_sql(
    edges_sql: str,
    *,
    iterations: int,
    damping: float = 0.85,
    round_digits: int = 9,
) -> str:
    """Generate the DuckDB oracle for :func:`weighted_pagerank` run
    with ``per_iteration_round=round_digits``: the fixed iteration
    count unrolled into a CTE chain (the pacf_unrolled_sql /
    pagerank/k-core pattern). ``edges_sql`` must yield
    ``(w1, w2, weight)`` — normally the SQL restatement of
    :func:`word_graph`, so both engines consume identical integer
    edges.

    Float-op parity: each iteration computes
    ``round((1-d) + d * sum(rank / wdeg * weight), n)`` with the SAME
    literals (``1-d`` and ``d`` are the same Python floats emitted
    into both plans) and the same per-term op order; the per-iteration
    round re-snaps both engines to one grid, so summation-order drift
    (~1e-15) cannot accumulate across rounds."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    base = repr(float(1.0 - damping))
    d = repr(float(damping))
    n = int(round_digits)
    # __e/__sym/__wdeg are referenced from every unrolled iteration —
    # without AS MATERIALIZED DuckDB inlines a fresh copy of the whole
    # edge build per reference (the k-core/BPE oracle lesson)
    ctes = [
        f"__e AS MATERIALIZED ({edges_sql})",
        "__sym AS MATERIALIZED (SELECT w1 AS src, w2 AS dst, weight FROM __e"
        " UNION ALL SELECT w2 AS src, w1 AS dst, weight FROM __e)",
        "__wdeg AS MATERIALIZED (SELECT src, CAST(sum(weight) AS DOUBLE)"
        " AS wdeg FROM __sym GROUP BY src)",
        "__r0 AS (SELECT DISTINCT src AS node, 1.0 AS rank FROM __sym)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"__r{i} AS (SELECT s.dst AS node,"
            f" round({base} + {d} * sum(r.rank / w.wdeg * s.weight), {n})"
            f" AS rank"
            f" FROM __r{i - 1} r"
            f" JOIN __wdeg w ON r.node = w.src"
            f" JOIN __sym s ON s.src = r.node"
            f" GROUP BY s.dst)"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT node, rank FROM __r{iterations}"
    )
