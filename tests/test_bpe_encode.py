"""BPE encode (operators/bpe.encode_bpe): the Python encoder must
reproduce the trainer's final segmentation symbol-for-symbol — the
JVM F.replace fuse chain is the reference — plus round-trip and
merge-format invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.bpe import (
    encode_bpe,
    fuse,
    learn_bpe_merges,
    word_frequencies,
)

SF_DIR = "/root/testdata/sf0.001"


def test_encoder_matches_trainer_segmentation(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(300)
    merges = learn_bpe_merges(docs, "text", n_merges=6)
    assert len(merges) == 6

    # reference: the trainer's own JVM fuse chain applied to each word
    wf = word_frequencies(docs, "text")
    seq = F.concat(F.lit(" "), F.regexp_replace(F.col("w"), "([a-z])", "$1 "))
    for _, pair, _ in merges:
        seq = fuse(seq, pair)
    want = {r["w"]: r["seq"].split() for r in wf.select("w", seq.alias("seq")).collect()}

    # encoder: one-word rows through mapInPandas
    words = spark.createDataFrame([(w,) for w in want], "w string")
    got = {
        r["w"]: list(r["tokens"])
        for r in encode_bpe(words, "w", merges).collect()
    }
    assert got == want


def test_tokens_concatenate_back_to_words(spark):
    df = spark.createDataFrame(
        [("the theme thesis then breathe",)], "text string"
    )
    merges = ["t h", "th e", "e s"]
    toks = list(encode_bpe(df, "text", merges).collect()[0]["tokens"])
    # concatenation restores the word stream
    assert "".join(toks) == "thethemethesisthenbreathe"
    # 'the' is fully fused by the first two merges
    assert toks[:1] == ["the"]


def test_merge_formats_and_order_matter(spark):
    df = spark.createDataFrame([("abab",)], "text string")
    # tuples from the batched trainer (round, pos, pair, count) work too
    got_t = list(
        encode_bpe(df, "text", [(0, 1, "a b", 9)]).collect()[0]["tokens"]
    )
    got_s = list(encode_bpe(df, "text", ["a b"]).collect()[0]["tokens"])
    assert got_t == got_s == ["ab", "ab"]
    # order: "a b" before "ab a" enables the second merge...
    two = list(
        encode_bpe(df, "text", ["a b", "ab ab"]).collect()[0]["tokens"]
    )
    assert two == ["abab"]
    # ...reversed, "ab ab" matches nothing yet
    rev = list(
        encode_bpe(df, "text", ["ab ab", "a b"]).collect()[0]["tokens"]
    )
    assert rev == ["ab", "ab"]


def test_word_rule_matches_trainer_and_nulls_are_empty(spark):
    # the trainer keeps only whole whitespace tokens matching ^[a-z]+$:
    # "ab3"/"cd!" are EXCLUDED (not split into runs), so the encoder
    # must exclude them too or it would tokenize material the merges
    # never saw; null text encodes to an empty array like the
    # trainer's null-dropping scan
    df = spark.createDataFrame(
        [(1, "Ab3 cD!  e"), (2, None), (3, "ok then")],
        "id int, text string",
    )
    got = {
        r["id"]: list(r["tokens"])
        for r in encode_bpe(df, "text", ["t h", "th e"]).collect()
    }
    assert got == {1: ["e"], 2: [], 3: ["o", "k", "the", "n"]}
