"""Unit tests for column-level functions on tiny literal DataFrames
(SURVEY §5.2 — per-operator-family unit tests, P/J groups)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.functions.scalar import (
    coalesce_nonempty,
    map_multikey_coalesce,
    parse_timestamp_naive,
    truncate_str,
)
from bangumi_notion_data_integration_project_spark.functions.semistructured import (
    array_join_nonnull,
    positional_pivot,
    tags_to_names,
)
from bangumi_notion_data_integration_project_spark.functions.text import (
    positional_fingerprint,
    punct_ratio,
    stopword_ratio,
    token_count,
)
from bangumi_notion_data_integration_project_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)


def test_coalesce_nonempty_skips_empty_string(spark):
    # reference parity: Python `name_cn or name` treats "" as missing
    # (bangumi_data_ingestion.py:438)
    df = spark.createDataFrame(
        [("", "fallback"), (None, "fb2"), ("keep", "no")], ["a", "b"]
    )
    out = [r[0] for r in df.select(coalesce_nonempty("a", "b")).collect()]
    assert out == ["fallback", "fb2", "keep"]


def test_map_multikey_coalesce(spark):
    df = spark.createDataFrame([({"導": "x"},), ({"导": "y", "導": "z"},), ({},)], ["m"])
    out = [r[0] for r in df.select(map_multikey_coalesce("m", "导", "導")).collect()]
    assert out == ["x", "y", None]


def test_truncate_str(spark):
    df = spark.createDataFrame([("abcdefgh",)], ["s"])
    assert df.select(truncate_str("s", 3)).first()[0] == "abc"


def test_parse_timestamp_naive_coerce(spark):
    # errors="coerce" parity: unparseable → NULL, not error
    df = spark.createDataFrame([("2023-04-01 12:30:00",), ("garbage",)], ["s"])
    out = [r[0] for r in df.select(parse_timestamp_naive("s")).collect()]
    assert out[0] is not None and out[1] is None


def test_tags_to_names_and_join(spark):
    df = spark.createDataFrame(
        [([("action", 10), ("drama", 5)],)],
        "tags: array<struct<name: string, count: long>>",
    )
    names = df.select(tags_to_names("tags").alias("n"))
    assert names.first()[0] == ["action", "drama"]
    assert names.select(array_join_nonnull("n")).first()[0] == "action, drama"


def test_array_join_nonnull_empty_is_null(spark):
    df = spark.createDataFrame([([],)], "a: array<string>")
    assert df.select(array_join_nonnull("a")).first()[0] is None


def test_positional_pivot_null_pads(spark):
    # 5-slot tag pivot parity (extract_top_tags :297-307): short arrays
    # null-pad instead of erroring
    df = spark.createDataFrame(
        [([("t1", 3)],)], "tags: array<struct<name: string, count: long>>"
    )
    cols = positional_pivot("tags", 2, ["name", "count"], "tag")
    row = df.select(*cols).first()
    assert row["tag_1_name"] == "t1" and row["tag_1_count"] == 3
    assert row["tag_2_name"] is None and row["tag_2_count"] is None


def test_token_count_empty_and_multispace(spark):
    df = spark.createDataFrame([("a  b   c",), ("",), ("   ",), (None,)], ["t"])
    out = [r[0] for r in df.select(token_count("t")).collect()]
    assert out == [3, 0, 0, None]


def test_stopword_and_punct_ratio(spark):
    df = spark.createDataFrame([("the cat, the hat!",)], ["t"])
    row = df.select(
        stopword_ratio("t").alias("sw"), punct_ratio("t").alias("p")
    ).first()
    assert abs(row["sw"] - 0.5) < 1e-9  # 2 of 4 tokens are stopwords
    assert row["p"] > 0


def test_positional_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a b",), ("b a",), ("",)], ["t"])
    out = [r[0] for r in df.select(positional_fingerprint("t")).collect()]
    assert out[0] != out[1]  # order matters
    assert out[2] == 0


def test_vector_math(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([3.0, 4.0], [3.0, 4.0])], ["a", "b"])
    rows = df.select(
        dot_product("a", "b").alias("d"),
        l2_norm("a").alias("n"),
        cosine_similarity("a", "b").alias("c"),
    ).collect()
    assert rows[0]["d"] == 0.0 and abs(rows[0]["c"]) < 1e-12
    assert rows[1]["n"] == 5.0 and abs(rows[1]["c"] - 1.0) < 1e-12


def test_dot_product_arrow_matches_hof(spark):
    import random

    from bangumi_notion_data_integration_project_spark.functions.vectors import (
        dot_product,
        dot_product_arrow,
    )

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)], [rng.uniform(-1, 1) for _ in range(64)])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id: long, a: array<double>, b: array<double>")
    got = df.select(
        "id",
        dot_product("a", "b").alias("hof"),
        dot_product_arrow("a", "b").alias("arrow"),
    ).collect()
    for r in got:
        assert abs(r["hof"] - r["arrow"]) < 1e-9, r


# --- BPE merge-training loop ---


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python reference with the SAME semantics as operators/bpe.py:
    Sennrich-style pair counts (all adjacent occurrences), total-order
    tie-break (count desc, pair asc), 3-pass replace-scan fuse."""
    seqs = {f" {' '.join(w)} ": f for w, f in word_freqs.items()}
    merges = []
    for r in range(n_merges):
        counts: dict[str, int] = {}
        for seq, f in seqs.items():
            sym = seq.strip().split(" ")
            for i in range(len(sym) - 1):
                p = f"{sym[i]} {sym[i + 1]}"
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((r, pair, counts[pair]))
        fused = pair.replace(" ", "")
        new: dict[str, int] = {}
        for seq, f in seqs.items():
            for _ in range(3):
                seq = seq.replace(f" {pair} ", f" {fused} ")
            new[seq] = new.get(seq, 0) + f
        seqs = new
    return merges


def test_bpe_merges_match_python_reference(spark):
    from bangumi_notion_data_integration_project_spark.operators.bpe import (
        learn_bpe_merges,
    )

    corpus = [
        "the cat sat on the mat",
        "the hat and the bat",
        "that cat that hat that",
        "aaaa aaaa baaa",
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    wf: dict[str, int] = {}
    for t in corpus:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    want = _py_bpe(wf, 5)
    got = learn_bpe_merges(df, "text", 5)
    assert got == want, (got, want)
    # sanity: 'at' dominates (cat/sat/mat/hat/bat/that all carry it)
    assert got[0][1] == "a t", got
    assert [m[1] for m in got[1:3]] == ["a a", "t h"], got


def test_bpe_fuse_handles_boundary_sharing_runs(spark):
    """' a b a b a b ' must fully fuse in the multi-pass replace —
    the single-pass form leaves the middle occurrence unmerged."""
    from pyspark.sql import functions as F

    from bangumi_notion_data_integration_project_spark.operators.bpe import fuse

    d = spark.createDataFrame([(" a b a b a b ",)], "seq string")
    [r] = d.select(fuse(F.col("seq"), "a b").alias("f")).collect()
    assert r["f"] == " ab ab ab "


def test_bpe_batched_equals_serial_at_batch_one(spark):
    """batch_size=1 must reproduce the serial merge loop EXACTLY: the
    rank-1 pair is never blocked, so each round's single selection is
    the serial arg-max and the fuse chain is identical."""
    from bangumi_notion_data_integration_project_spark.operators.bpe import (
        learn_bpe_merges,
        learn_bpe_merges_batched,
    )

    corpus = [
        "the cat sat on the mat",
        "the hat and the bat",
        "that cat that hat that",
        "aaaa aaaa baaa",
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    serial = learn_bpe_merges(df, "text", 5)
    batched = learn_bpe_merges_batched(df, "text", 5, batch_size=1, pool=8)
    assert [(r, 1, p, c) for r, p, c in serial] == batched, (serial, batched)


def test_bpe_batch_selection_is_disjoint_and_conservative(spark):
    from bangumi_notion_data_integration_project_spark.operators.bpe import (
        select_compatible,
    )

    cands = [("a t", 10), ("t h", 9), ("h e", 8), ("c d", 7), ("x y", 6)]
    got = select_compatible(cands, 3)
    # "t h" blocked by "a t" (shares t); "h e" blocked by "t h" even
    # though "t h" itself was blocked — the order-free rule is
    # deliberately conservative so SQL can replay it as an anti-join
    assert got == [("a t", 10), ("c d", 7), ("x y", 6)], got
    syms = [s for p, _ in got for s in p.split(" ")]
    assert len(syms) == len(set(syms))  # mutually non-interacting

    # fused-symbol interaction: fusing "a b" -> "ab" would CREATE new
    # "x ab" adjacencies mid-batch, so "x ab" must not share the batch
    # even though the operand symbols {a,b} and {x,ab} are disjoint
    got2 = select_compatible([("a b", 10), ("x ab", 9), ("p q", 8)], 3)
    assert got2 == [("a b", 10), ("p q", 8)], got2
