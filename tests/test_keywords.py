"""RAKE keyword extraction: independent pure-Python reference over the
same stopword list, run-splitting, degree/freq scores and ordered fold."""

from __future__ import annotations

import random
import re

from bangumi_notion_data_integration_project_spark.functions.text import STOPWORDS_EN
from bangumi_notion_data_integration_project_spark.operators.keywords import (
    phrase_occurrences,
    rake_keywords,
)


def _round_half_away(x, nd):
    import math

    scaled = abs(x) * 10**nd
    return math.copysign(math.floor(scaled + 0.5), x) / 10**nd


def _py_rake(texts, stopwords, max_len, top_k):
    sw = {w.lower() for w in stopwords}
    occs = []  # list of word tuples
    for t in texts:
        toks = re.split(r"\s+", t.strip()) if t and t.strip() else []
        toks = [w.lower() for w in toks if w]  # RAKE case-normalized
        run = []
        for tok in toks + ["the"]:  # sentinel stopword flushes the tail
            if tok.lower() in sw:
                if run and len(run) <= max_len:
                    occs.append(tuple(run))
                run = []
            else:
                run.append(tok)
    freq, degree = {}, {}
    for words in occs:
        for w in words:
            freq[w] = freq.get(w, 0) + 1
            degree[w] = degree.get(w, 0) + len(words)
    wscore = {w: degree[w] / freq[w] for w in freq}
    per_phrase = {}
    for words in occs:
        per_phrase[words] = per_phrase.get(words, 0) + 1
    scored = []
    for words, n in per_phrase.items():
        s = 0.0
        for w in words:
            s = s + wscore[w]
        scored.append((" ".join(words), n, len(words), s))
    scored.sort(key=lambda t: (-t[3], t[0]))
    return scored[:top_k]


def test_rake_matches_python_reference(spark):
    rng = random.Random(29)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = []
    for _ in range(40):
        n = rng.randint(3, 30)
        texts.append(
            " ".join(
                rng.choice(STOPWORDS_EN if rng.random() < 0.35 else vocab)
                for _ in range(n)
            )
        )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["phrase"], r["n_occurrences"], r["n_words"], r["score"])
        for r in rake_keywords(df, "doc_id", "text", top_k=25).collect()
    ]
    # half-away rounding mirrors Spark's round(); python round is
    # half-even and can diverge on decimal ties
    want = [
        (p, n, k, _round_half_away(s, 6))
        for p, n, k, s in _py_rake(texts, STOPWORDS_EN, 4, 25)
    ]
    assert got == want


def test_phrase_occurrences_splits_runs(spark):
    df = spark.createDataFrame(
        [(1, "big data and fast engines in the wild or not")],
        "doc_id long, text string",
    )
    occ = sorted(
        r["phrase"]
        for r in phrase_occurrences(df, "doc_id", "text").collect()
    )
    # stopwords: and, in, the, or -> runs: [big data] [fast engines]
    # [wild] [not]
    assert occ == ["big data", "fast engines", "not", "wild"]


def test_rake_long_runs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a one two three four five and short run")],
        "doc_id long, text string",
    )
    occ = [
        r["phrase"]
        for r in phrase_occurrences(df, "doc_id", "text", max_phrase_len=4).collect()
    ]
    assert "one two three four five" not in occ
    assert "short run" in occ


def test_rake_case_normalized_and_whitespace_hardened(spark):
    """'Data' and 'data' are one word; duplicate doc_id rows never
    interleave runs; tab/newline padding adds no phantom tokens."""
    df = spark.createDataFrame(
        [
            (1, "Data Mining and data mining"),
            (1, "quick brown and lazy dog"),  # same doc_id, second row
            (2, "\tbig data\n"),
        ],
        "doc_id long, text string",
    )
    occ = sorted(
        (r["phrase"], r["n_words"])
        for r in phrase_occurrences(df, "doc_id", "text").collect()
    )
    assert occ == [
        ("big data", 2),
        ("data mining", 2),
        ("data mining", 2),
        ("lazy dog", 2),
        ("quick brown", 2),
    ]
