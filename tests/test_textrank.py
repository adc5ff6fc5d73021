"""TextRank (operators/textrank.py): word-graph construction against a
hand-built reference, weighted power iteration against a pure-Python
replay, determinism across partitionings, and stopword/window
semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.textrank import (
    textrank_keywords,
    weighted_pagerank,
    word_graph,
)

DOCS = [
    (1, "spark runs fast and spark scales well"),
    (2, "fast spark jobs scale to large clusters"),
    (3, "the spark optimizer makes jobs fast"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_graph(rows, stopwords, window=2):
    from collections import Counter

    edges = Counter()
    for _, text in rows:
        cand = [
            t.lower()
            for t in text.split()
            if t and t.lower() not in stopwords
        ]
        for i, wa in enumerate(cand):
            for d in range(1, window + 1):
                if i + d < len(cand):
                    wb = cand[i + d]
                    if wa != wb:
                        edges[(min(wa, wb), max(wa, wb))] += 1
    return dict(edges)


def _py_pagerank(edges, iterations=10, d=0.85):
    wdeg: dict[str, float] = {}
    adj: dict[str, list[tuple[str, int]]] = {}
    for (a, b), w in edges.items():
        for u, v in ((a, b), (b, a)):
            wdeg[u] = wdeg.get(u, 0.0) + w
            adj.setdefault(u, []).append((v, w))
    ranks = {u: 1.0 for u in wdeg}
    for _ in range(iterations):
        shares = {u: ranks[u] / wdeg[u] for u in ranks}
        nxt = {}
        for u, nbrs in adj.items():
            for v, w in nbrs:
                nxt[v] = nxt.get(v, 0.0) + shares[u] * w
        ranks = {v: (1.0 - d) + d * s for v, s in nxt.items()}
    return ranks


STOP = {"and", "the", "to", "well"}


def test_word_graph_matches_reference(spark):
    got = {
        (r["w1"], r["w2"]): r["weight"]
        for r in word_graph(
            _docs(spark), "doc_id", "text", stopwords=list(STOP), window=2
        ).collect()
    }
    assert got == _py_graph(DOCS, STOP, window=2)


def test_stopwords_do_not_block_adjacency(spark):
    # "runs and fast": with 'and' a stopword, runs-fast are ADJACENT in
    # the candidate sequence (distance 1), the classic TextRank rule
    rows = [(1, "runs and fast")]
    got = {
        (r["w1"], r["w2"]): r["weight"]
        for r in word_graph(
            _docs(spark, rows), "doc_id", "text", stopwords=["and"], window=1
        ).collect()
    }
    assert got == {("fast", "runs"): 1}


def test_weighted_pagerank_matches_python_replay(spark):
    edges = _py_graph(DOCS, STOP, window=2)
    edf = spark.createDataFrame(
        [(a, b, w) for (a, b), w in edges.items()],
        "w1 string, w2 string, weight long",
    )
    got = {
        r["node"]: r["rank"]
        for r in weighted_pagerank(edf, iterations=10).collect()
    }
    want = _py_pagerank(edges, iterations=10)
    assert set(got) == set(want)
    for node, r in got.items():
        assert abs(r - want[node]) <= 1e-9 * max(1.0, abs(want[node])), node


def test_keywords_deterministic_and_total_ordered(spark):
    d = _docs(spark)
    a = textrank_keywords(
        d, "doc_id", "text", stopwords=list(STOP), iterations=8, top_k=5
    ).collect()
    b = textrank_keywords(
        d.repartition(7),
        "doc_id",
        "text",
        stopwords=list(STOP),
        iterations=8,
        top_k=5,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert [r["rank"] for r in a] == list(range(1, len(a) + 1))
    # 'spark' is the hub of this corpus
    assert a[0]["token"] == "spark"


def test_parameter_validation(spark):
    import pytest

    d = _docs(spark)
    with pytest.raises(ValueError, match="window"):
        word_graph(d, "doc_id", "text", window=0)
    with pytest.raises(ValueError, match="iterations"):
        weighted_pagerank(
            spark.createDataFrame(
                [("a", "b", 1)], "w1 string, w2 string, weight long"
            ),
            iterations=0,
        )


def test_keyphrases_match_python_replay(spark):
    """Full-pipeline keyphrases: adjacent top words in the ORIGINAL
    token stream merge into phrases (stopwords and non-top words break
    runs), phrase score = ordered sum of member word scores."""
    from bangumi_notion_data_integration_project_spark.operators.textrank import (
        textrank_keyphrases,
    )

    got = [
        (r["phrase"], r["n_words"], r["n_occurrences"], r["score"])
        for r in textrank_keyphrases(
            _docs(spark),
            "doc_id",
            "text",
            stopwords=list(STOP),
            iterations=8,
            top_word_count=4,
            top_k=10,
        ).collect()
    ]

    # python replay: same graph, same ranks, same adjacency merge
    edges = _py_graph(DOCS, STOP, window=2)
    ranks = _py_pagerank(edges, iterations=8)
    r9 = {w: round(r, 9) for w, r in ranks.items()}
    top4 = set(sorted(r9, key=lambda w: (-r9[w], w))[:4])
    from collections import Counter

    occ = Counter()
    score = {}
    for _, text in DOCS:
        stream = [t.lower() for t in text.split() if t]
        run = []
        for t in stream + ["\x00"]:  # sentinel flush
            if t in top4:
                run.append(t)
            else:
                if run:
                    p = " ".join(run)
                    occ[p] += 1
                    score[p] = (len(run), sum(r9[w] for w in run))
                run = []
    want = sorted(
        (
            (p, score[p][0], occ[p], round(score[p][1], 6))
            for p in occ
        ),
        key=lambda t: (-t[3], t[0]),
    )[:10]
    assert got == want
    # the corpus's hub bigram surfaces as a multiword phrase
    assert any(n_words >= 2 for _, n_words, _, _ in got)


def test_weighted_pagerank_unrolled_sql_matches_spark_cross_engine(spark):
    """The generated unrolled-iteration DuckDB oracle replays
    weighted_pagerank(per_iteration_round=9) bit-for-bit on the real
    documents table — the contract the future registry entry needs.
    Both engines consume identical integer edges (the word_graph SQL
    restatement) and re-snap ranks to the 1e-9 grid every iteration,
    so summation-order drift cannot accumulate."""
    import duckdb

    from bangumi_notion_data_integration_project_spark.functions.text import (
        STOPWORDS_EN,
    )
    from bangumi_notion_data_integration_project_spark.operators.textrank import (
        weighted_pagerank,
        weighted_pagerank_unrolled_sql,
        word_graph,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    g = word_graph(docs, "doc_id", "text", window=2)
    got = {
        r["node"]: r["rank"]
        for r in weighted_pagerank(
            g, iterations=4, per_iteration_round=9
        ).collect()
    }

    sw = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    edges_sql = rf"""
        WITH toks AS (
          SELECT doc_id, i AS pos, lower(tk[i]) AS tok
          FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
                FROM documents WHERE length(trim(text)) > 0) dd,
               unnest(range(1, len(tk) + 1)) AS t(i)
          WHERE length(tk[i]) > 0
        ), cand AS (
          SELECT doc_id, pos, tok FROM toks
          WHERE NOT list_contains([{sw}], tok)
        ), pairs AS (
          SELECT tok AS wa,
                 lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS wb
          FROM cand
          UNION ALL
          SELECT tok,
                 lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos)
          FROM cand
        )
        SELECT least(wa, wb) AS w1, greatest(wa, wb) AS w2,
               CAST(count(*) AS BIGINT) AS weight
        FROM pairs WHERE wb IS NOT NULL AND wa <> wb GROUP BY 1, 2
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    # the edge tables must agree exactly before the iteration starts
    want_edges = dict(
        ((a, b), w) for a, b, w in con.execute(edges_sql).fetchall()
    )
    got_edges = {
        (r["w1"], r["w2"]): r["weight"] for r in g.collect()
    }
    assert got_edges == want_edges

    want = dict(
        con.execute(
            weighted_pagerank_unrolled_sql(edges_sql, iterations=4)
        ).fetchall()
    )
    assert got == want


def test_duplicate_doc_id_raises(spark):
    # r8 ADVICE: doc_id_col was accepted but unused, so a document
    # spanning two rows with one doc_id silently became two documents.
    # The contract (one row per document) is now asserted fail-loud.
    import pytest

    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (1, "gamma delta epsilon")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="duplicate doc_id"):
        word_graph(d, "doc_id", "text", window=2).collect()


def test_duplicate_null_doc_id_also_raises(spark):
    # second-review finding: max(NULL key) read as "no duplicates" —
    # the sentinel gate must catch duplicated NULL ids too
    import pytest

    d = spark.createDataFrame(
        [(None, "alpha beta"), (None, "beta gamma")],
        "doc_id string, text string",
    )
    with pytest.raises(Exception, match="duplicate doc_id NULL"):
        word_graph(d, "doc_id", "text", window=2).collect()
