"""BPE tokenizer training — the merge-learning inner loop, distributed.

``docs_bigram_counts`` computes one round of pair statistics (the
merge-SELECTION step); this operator runs the actual LOOP: per round,
count adjacent symbol pairs over the word-frequency table, pick the
most frequent pair, fuse it corpus-wide, repeat. The classic
single-machine implementation (Sennrich et al.'s ``learn_bpe``) keeps
the whole vocabulary in a dict; here each round is one explode+groupBy
over the word-frequency table — the corpus itself is touched ONCE (to
build word frequencies), and every round after that runs on the
|vocab|-sized table, which is what makes BPE training feasible on a
100 TB corpus (the word-frequency table of even a huge corpus is
millions of rows, not billions).

Determinism / cross-engine exactness:
- ties on pair count break on the pair string ascending — a total
  order, so both engines pick the same merge every round;
- the winning pair is collected to the driver (ONE bounded row per
  round, the k-means/PageRank plan-literal pattern) and fused with
  plain string ``replace`` on the space-joined symbol sequence;
  ``replace`` scans left-to-right non-overlapping IDENTICALLY in Spark
  and DuckDB (probed), and the fuse is applied in 3 passes so
  boundary-sharing occurrences (" a b a b ") reach the fixpoint;
- NOTE the pass-based fuse is deterministic but not strict
  leftmost-greedy for odd same-symbol runs ("aaaaa" → (aa)(a)(aa),
  canonical BPE gives (aa)(aa)(a)) — both engines implement the SAME
  semantics, which is what the hash check requires; pair counts use
  all adjacent occurrences (Sennrich-style).

Scope: words are lowercased [a-z]+ runs — BPE on the alphabetic core,
sidestepping Java-regex (UTF-16) vs RE2 (UTF-8) codepoint-splitting
divergence on astral characters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUSE_PASSES = 3  # boundary-sharing occurrences resolve in <= 2; margin


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over lowercased alphabetic tokens — the ONLY pass
    that touches the corpus."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _initial_seq() -> F.Column:
    # "abc" -> " a b c "  (one space between symbols, sentinel spaces)
    return F.concat(F.lit(" "), F.regexp_replace(F.col("w"), "([a-z])", "$1 "))


def _pair_counts(seqs: DataFrame) -> DataFrame:
    sym = F.split(F.trim(F.col("seq")), " ")
    pairs = F.when(
        F.size(sym) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(sym) - 1),
            lambda i: F.concat_ws(" ", F.element_at(sym, i), F.element_at(sym, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        seqs.select(F.col("freq"), F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def fuse(seq_col: F.Column, pair: str) -> F.Column:
    """Fuse one learned pair corpus-wide: ' p q ' -> ' pq ', repeated
    FUSE_PASSES times so occurrences sharing a boundary space all merge."""
    fused = pair.replace(" ", "")
    out = seq_col
    for _ in range(FUSE_PASSES):
        out = F.replace(out, F.lit(f" {pair} "), F.lit(f" {fused} "))
    return out


def learn_bpe_merges(
    df: DataFrame, text_col: str, n_merges: int
) -> list[tuple[int, str, int]]:
    """Run ``n_merges`` rounds; returns [(round, pair, pair_count)].

    Each round is one explode+groupBy over the word-frequency table
    plus ONE bounded driver collect (the winning pair). The word table
    is checkpointed eagerly so the corpus scan happens exactly once.
    """
    wf = word_frequencies(df, text_col).localCheckpoint(eager=True)
    seqs = wf.select("freq", _initial_seq().alias("seq"))
    merges: list[tuple[int, str, int]] = []
    for r in range(n_merges):
        top = (
            _pair_counts(seqs)
            .orderBy(F.col("pair_count").desc(), "pair")
            .first()
        )
        if top is None:
            break
        merges.append((r, top["pair"], top["pair_count"]))
        seqs = seqs.select("freq", fuse(F.col("seq"), top["pair"]).alias("seq"))
        # truncate the growing replace-expression lineage every round
        seqs = seqs.localCheckpoint(eager=True)
    return merges
