"""RAKE-style keyword extraction (Rapid Automatic Keyword Extraction,
Rose et al. 2010) — corpus-level candidate phrases scored by word
co-occurrence degree/frequency. The classic cheap unsupervised keyword
pass a training-data pipeline runs to tag/route documents.

Shape: phrases are maximal stopword-free token runs (capped length).
For every word inside any phrase occurrence,

    freq(w)   = number of phrase occurrences containing w
    degree(w) = sum of the lengths of those phrases
    score(w)  = degree(w) / freq(w)

and a phrase's score is the sum of its member words' scores, folded in
phrase order (deterministic — never a shuffle-order float sum).

Scale notes: the run-splitting is one posexplode + one per-document
ordered window (partitioned by doc_id — bounded by document length,
never corpus length); word stats are map-side-combinable aggregates
joined back by broadcast (vocabulary ≪ corpus); the global top-k is
TakeOrdered under a (score, phrase) total order. Everything is exact
integer counts until the per-word division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS_EN, tokens


def phrase_occurrences(
    df: DataFrame,
    doc_id_col: str,
    text_col: str | Column,
    *,
    stopwords: "list[str] | None" = None,
    max_phrase_len: int = 4,
) -> DataFrame:
    """One row per candidate phrase OCCURRENCE:
    ``(doc_id, words array<string>, phrase string, n_words)``.

    A candidate is a maximal run of consecutive non-stopword tokens
    (runs longer than ``max_phrase_len`` are dropped — RAKE's guard
    against degenerate stopword-free walls of text)."""
    sw = [w.lower() for w in (stopwords or STOPWORDS_EN)]
    toks = (
        df.select(
            F.col(doc_id_col).alias("doc_id"),
            # per-ROW id: duplicate doc_id values (or rows) must never
            # interleave their token streams in the run window below
            F.monotonically_increasing_id().alias("__rid"),
            tokens(text_col).alias("__tk"),
        )
        .select(
            "doc_id", "__rid", F.posexplode("__tk").alias("pos", "tok")
        )
        # tokens() can emit '' edge tokens on tab/newline-padded text
        # (see its docstring); phantom words must not join phrases
        .filter(F.length("tok") > 0)
        # classic RAKE: case-normalized word identity, matching the
        # case-insensitive stopword test
        .withColumn("tok", F.lower("tok"))
        .withColumn("__sw", F.col("tok").isin(sw).cast("int"))
    )
    w = (
        Window.partitionBy("__rid")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        toks.withColumn("run", F.sum("__sw").over(w))
        .filter(F.col("__sw") == 0)
        .groupBy("doc_id", "__rid", "run")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "tok"))
                ),
                lambda s: s["tok"],
            ).alias("words")
        )
        .filter(F.size("words") <= max_phrase_len)
    )
    return runs.select(
        "doc_id",
        "words",
        F.concat_ws(" ", "words").alias("phrase"),
        F.size("words").cast("long").alias("n_words"),
    )


def rake_keywords(
    df: DataFrame,
    doc_id_col: str,
    text_col: str | Column,
    *,
    stopwords: "list[str] | None" = None,
    max_phrase_len: int = 4,
    top_k: int = 25,
) -> DataFrame:
    """Corpus top-k keywords: ``(rank, phrase, n_occurrences, n_words,
    score)`` ranked by the RAKE degree/frequency score under a
    (score desc, phrase) total order.

    Cross-engine determinism: freq/degree are exact integer
    aggregates; each word score is ONE long/long double division;
    the phrase score folds those doubles in phrase order (the ordered-
    fold oracle pattern — DuckDB replays it with list_reduce over the
    same values in the same order)."""
    occ = phrase_occurrences(
        df,
        doc_id_col,
        text_col,
        stopwords=stopwords,
        max_phrase_len=max_phrase_len,
    ).localCheckpoint(eager=False)  # feeds word stats AND phrase scoring
    member = occ.select(
        "phrase", "n_words", F.explode("words").alias("w")
    )
    stats = member.groupBy("w").agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("degree"),
    )
    scored_words = stats.select(
        "w",
        (F.col("degree").cast("double") / F.col("freq").cast("double")).alias(
            "wscore"
        ),
    )
    # fold member-word scores in phrase order: join scores, re-assemble
    # the ordered score list per phrase, then one deterministic fold
    per_word = (
        occ.groupBy("phrase", "words")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .select(
            "phrase",
            "n_occurrences",
            F.size("words").cast("long").alias("n_words"),
            F.posexplode("words").alias("wpos", "w"),
        )
        .join(F.broadcast(scored_words), "w")
    )
    phrase_scores = (
        per_word.groupBy("phrase", "n_occurrences", "n_words")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("wpos", "wscore"))
                    ),
                    lambda s: s["wscore"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__score")
        )
    )
    top = phrase_scores.orderBy(
        F.col("__score").desc(), F.col("phrase").asc()
    ).limit(top_k)
    w_rank = Window.orderBy(F.col("__score").desc(), F.col("phrase").asc())
    return (
        top.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .select(
            "rank",
            "phrase",
            "n_occurrences",
            "n_words",
            F.round("__score", 6).alias("score"),
        )
        .orderBy("rank")
    )
