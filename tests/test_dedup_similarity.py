"""Tests for the M5 extension operators: dedup tiers + ANN search."""

from __future__ import annotations

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.dedup import (
    exact_dedup,
    inverted_index_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
    word_shingles,
)
from bangumi_notion_data_integration_project_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

DOC = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy cat again and again today"
OTHER = "completely different words in this sentence about spark engines"


def _docs(spark):
    return spark.createDataFrame(
        [(1, DOC), (2, DOC.upper()), (3, NEAR), (4, OTHER)], "doc_id: long, text: string"
    )


def test_exact_dedup_normalizes_case_and_ws(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4]  # doc 2 is a case-variant of doc 1


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["t"])
    sh = df.select(word_shingles("t", 3).alias("s")).first()["s"]
    assert sorted(sh) == ["a b c", "b c d"]


def test_minhash_lsh_finds_near_dups(spark):
    # 2-row bands: P(band hit) ≈ j² per band; 16 bands makes a j≈0.7
    # near-dup collide with p > 0.999
    cands = minhash_lsh_candidates(
        _docs(spark), "text", "doc_id", shingle_n=2, num_hashes=32, bands=16
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 3) in pairs  # one-word-changed near dup shares most bands
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_minhash_lsh_short_docs_never_bucket_together(spark):
    """Docs with fewer than shingle_n tokens have no shingles; before
    the size(__hashes)>0 guard their all-NULL signatures hashed to ONE
    shared band bucket → |bucket|² spurious pairs. They must produce no
    candidates at all (and not pair with each other)."""
    df = spark.createDataFrame(
        [
            (1, "one"),
            (2, "two"),
            (3, ""),
            (4, "totally unrelated short"),
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    cands = minhash_lsh_candidates(
        df, "text", "doc_id", shingle_n=4, num_hashes=32, bands=16
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert pairs == {(10, 11)}  # real dup found; no short-doc pairs


def test_ngram_jaccard_scores(spark):
    out = ngram_jaccard_pairs(_docs(spark), "text", "doc_id", shingle_n=2, threshold=0.5)
    scores = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert scores[(1, 2)] == 1.0
    assert 0.5 <= scores[(1, 3)] < 1.0


def test_simhash_near_dup_hamming(spark):
    df = _docs(spark).select("doc_id", simhash64("text").alias("sig"))
    sigs = {r["doc_id"]: r["sig"] for r in df.collect()}
    assert sigs[1] == sigs[2]

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(sigs[1], sigs[3]) < hamming(sigs[1], sigs[4])


def test_brute_force_topk_self_is_rank1(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, query, k=5).collect()
    assert len(out) == 5
    assert out[0]["vec_id"] == 0 and out[0]["cosine_sim"] == 1.0
    sims = [r["cosine_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_contains_self(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(emb, query, k=5).collect()
    assert out and out[0]["vec_id"] == 0  # query's own bucket contains itself


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from bangumi_notion_data_integration_project_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, query, k=10).collect()
    approx = ivf_topk(emb, query, k=10, n_cells=16, n_probe=4).collect()

    def by_q(rows):
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    ex, ap = by_q(exact), by_q(approx)
    # the query's own vector always lands in its probed cell
    for q, ids in ap.items():
        assert q in ids
    # aggregate recall@10 over the probed cells should be substantial
    hits = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    total = sum(len(ex[q]) for q in ex)
    assert hits / total >= 0.5, f"IVF recall too low: {hits}/{total}"


def test_srp_near_dup_identical_vectors_pair(spark):
    from bangumi_notion_data_integration_project_spark.operators.similarity import (
        srp_near_dup,
    )

    base = [float(i % 7) - 3.0 for i in range(64)]
    other = [float((i * 13) % 11) - 5.0 for i in range(64)]
    df = spark.createDataFrame(
        [(0, base), (1, list(base)), (2, other)],
        "vec_id: long, embedding: array<double>",
    )
    out = srp_near_dup(df, threshold=0.99).collect()
    # identical vectors share every sign bit -> same bucket, cosine 1.0
    assert [(r["id_a"], r["id_b"]) for r in out] == [(0, 1)]
    assert out[0]["cosine_sim"] == 1.0


def test_srp_near_dup_is_subset_of_all_pairs(spark, sf_dir):
    from bangumi_notion_data_integration_project_spark.operators.similarity import (
        srp_near_dup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    got = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in srp_near_dup(emb, threshold=0.3).collect()
    }
    # every reported pair must be a genuine >= threshold pair (no false
    # positives: the bucket only constrains candidates, cosine decides)
    all_pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in emb.alias("a")
        .crossJoin(emb.alias("b"))
        .selectExpr(
            "a.vec_id as id_a",
            "b.vec_id as id_b",
            "round(aggregate(zip_with(a.embedding, b.embedding, (x, y) -> cast(x as double) * y), cast(0.0 as double), (acc, v) -> acc + v) / (sqrt(aggregate(a.embedding, cast(0.0 as double), (acc, v) -> acc + v * v)) * sqrt(aggregate(b.embedding, cast(0.0 as double), (acc, v) -> acc + v * v))), 6) as cos",
        )
        .filter("id_a < id_b")
        .collect()
    }
    for id_a, id_b, cos in got:
        assert all_pairs[(id_a, id_b)] >= 0.3
        assert abs(all_pairs[(id_a, id_b)] - cos) < 1e-6


def test_word_shingles_short_docs_empty(spark):
    """Docs shorter than the shingle width yield [] (the oracle's
    range(1,1) semantics), not an element_at(0) crash."""
    from bangumi_notion_data_integration_project_spark.operators.dedup import word_shingles

    df = spark.createDataFrame(
        [(1, "one two"), (2, "solo"), (3, ""), (4, "a b c")],
        "id long, text string",
    )
    rows = {r.id: r.sh for r in df.select("id", word_shingles("text", 3).alias("sh")).collect()}
    assert rows[1] == []
    assert rows[2] == []
    assert rows[3] == []
    assert rows[4] == ["a b c"]


def test_simhash_bulk_matches_expression_form(spark):
    """simhash64_docs (explode+agg codegen path) must produce bit-for-
    bit the same signatures as the simhash64 per-row expression."""
    from bangumi_notion_data_integration_project_spark.operators.dedup import (
        simhash64,
        simhash64_docs,
    )

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content here"),
        (4, "solo"),
        (5, ""),
        (6, "a a a a a a"),
        # edge whitespace: trim() strips only spaces, so these diverge
        # if the bulk form splits without a full \s strip (regression:
        # "hello\n" must not grow a trailing empty token)
        (7, "hello\n"),
        (8, "\ta b\tc "),
        (9, "  x  y\r\n"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    expr_form = {
        r.doc_id: r.s for r in df.select("doc_id", simhash64("text").alias("s")).collect()
    }
    bulk_form = {
        r.doc_id: r.simhash for r in simhash64_docs(df, "text", "doc_id").collect()
    }
    assert expr_form == bulk_form


# ---------------------------------------------------------------------------
# Scale guard rails — these paths exist for 100 TB; the tests below make
# each one BIND at fixture scale with an asserted outcome.
# ---------------------------------------------------------------------------

BOILER = "subscribe to our newsletter for daily updates"  # 7 tokens, 5 shingles
DISTINCT_A = "graft engine rewrites logical plans before catalyst optimizes them"
DISTINCT_B = "graft engine rewrites logical plans before catalyst optimizes code"


def test_inverted_index_df_cap_drops_only_boilerplate_pairs(spark):
    # six docs that are NOTHING BUT the site-wide boilerplate sentence,
    # plus two genuinely near-duplicate docs (8 tokens, 6 shingles,
    # 5 shared → Jaccard 5/7 ≈ 0.71)
    rows = [(i, BOILER) for i in range(1, 7)]
    rows += [(10, DISTINCT_A), (11, DISTINCT_B)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")

    def pairs(df_cap):
        got = inverted_index_pairs(
            docs, "text", "doc_id", shingle_n=3, threshold=0.6, df_cap=df_cap
        ).collect()
        return {(r["id_a"], r["id_b"]) for r in got}

    boiler_pairs = {(a, b) for a in range(1, 7) for b in range(a + 1, 7)}
    uncapped = pairs(df_cap=100)
    assert uncapped == boiler_pairs | {(10, 11)}

    # every boilerplate shingle has df=6 > cap=3; the distinctive
    # shingles have df=2 ≤ 3. The cap must drop EXACTLY the pairs whose
    # entire overlap is boilerplate and keep the real near-dup.
    capped = pairs(df_cap=3)
    assert capped == {(10, 11)}
    assert uncapped - capped == boiler_pairs


def test_multiprobe_lsh_raises_recall_over_single_probe(spark, sf_dir):
    # the 1-bit-flip probe fan-out is the scale lever that buys back
    # single-bucket recall loss at zero corpus-side cost; prove it pays
    # on the fixture corpus (seeded hyperplanes → fully deterministic:
    # 23/80 multiprobe vs 10/80 single-probe at this SF)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def by_q(rows):
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    ex = by_q(brute_force_topk(emb, query, k=10).collect())
    total = sum(len(v) for v in ex.values())

    def recall(multiprobe):
        ap = by_q(
            lsh_topk(emb, query, k=10, n_planes=6, multiprobe=multiprobe).collect()
        )
        return sum(len(ex[q] & ap.get(q, set())) for q in ex) / total

    single, multi = recall(False), recall(True)
    assert multi > single, (single, multi)
    assert multi >= 1.5 * single, f"multiprobe gain collapsed: {single} -> {multi}"


# --- prefix-filter set-similarity join (PPJoin candidate rule) ---


def _bruteforce_setsim(spark, df, tau_num, tau_den, shingle_n=3):
    sh = df.select("doc_id", word_shingles("text", shingle_n).alias("sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    return {
        (r["id_a"], r["id_b"], r["n"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("n", inter)
        .filter(
            F.col("n") * (tau_den + tau_num)
            >= tau_num * (F.size("sa") + F.size("sb"))
        )
        .select("id_a", "id_b", "n")
        .collect()
    }


def test_setsim_prefix_equals_bruteforce(spark):
    """Losslessness: the prefix-filtered join must return exactly the
    all-pairs result at the same threshold — no false negatives from
    the pruned index, no false positives from the candidate join."""
    from bangumi_notion_data_integration_project_spark.operators.dedup import (
        setsim_prefix_pairs,
    )

    rows = [(1, DOC), (2, DOC + " extra tail"), (3, NEAR), (4, OTHER),
            (5, OTHER + " with a few more words"), (6, DOC)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    for tau_num, tau_den in ((1, 2), (7, 10), (9, 10)):
        got = {
            (r["id_a"], r["id_b"], r["n_common"])
            for r in setsim_prefix_pairs(
                df, "text", "doc_id", tau_num=tau_num, tau_den=tau_den
            ).collect()
        }
        want = _bruteforce_setsim(spark, df, tau_num, tau_den)
        assert got == want, (tau_num, tau_den)
        assert got, "threshold produced an empty fixture — test is vacuous"


def test_setsim_prefix_index_is_pruned(spark):
    """The scale claim: the prefix index must be strictly smaller than
    the full inverted index (≈ (1-tau) of it), not a rename of it."""
    from bangumi_notion_data_integration_project_spark.operators.dedup import (
        setsim_prefix_pairs,
    )

    rows = [(i, f"{DOC} suffix{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = setsim_prefix_pairs(df, "text", "doc_id", tau_num=9, tau_den=10)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # structural: row_number rank filter present (the prefix cut)
    assert "row_number" in plan
    # behavioral: each doc differs only in its final suffix token →
    # pairwise J = 11/13 ≈ 0.846, so tau=0.9 rejects all pairs and
    # tau=0.7 accepts all 28 — the threshold binds on both sides
    assert out.count() == 0
    out2 = setsim_prefix_pairs(df, "text", "doc_id", tau_num=7, tau_den=10)
    assert out2.count() == 8 * 7 // 2


def test_setsim_positional_filter_prunes_candidates_not_pairs(spark):
    """PPJoin's positional filter must strictly shrink the candidate
    set on a corpus with partial overlaps (shared prefix tokens whose
    positional overlap upper bound ``1 + min(|A|-i, |B|-j)`` falls
    short of the required overlap) while candidate generation stays
    LOSSLESS: every brute-force true pair survives the filter."""
    from bangumi_notion_data_integration_project_spark.operators.dedup import (
        setsim_prefix_candidates,
        word_shingles,
    )

    # A and B: 6 unique words + an 18-word shared block → 22 trigram
    # shingles each, 16 shared (J = 16/28 ≈ 0.57 < 0.7). The 6 df=1
    # shingles per doc rank 1-6 rarest-first, so the first shared
    # (df=2) shingle sits at prefix rank 7 of prefix length
    # 22 - ceil(0.7*22) + 1 = 7: a candidate without the positional
    # filter, pruned with it (ubound 1 + (22-7) = 16 < alpha =
    # ceil(0.7*44/1.7) = 19). C/D and E/F are true pairs that must
    # survive.
    shared = " ".join(f"s{i:02d}" for i in range(18))
    c_text = " ".join(f"c{i:02d}" for i in range(15))
    rows = [
        (1, "a1 a2 a3 a4 a5 a6 " + shared),
        (2, "b1 b2 b3 b4 b5 b6 " + shared),
        (3, c_text),
        (4, c_text + " tail"),
        (5, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"),
        (6, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sets = df.select(
        F.col("doc_id").alias("__did"), word_shingles("text", 3).alias("__set")
    )
    kw = dict(tau_num=7, tau_den=10, length_filter=True)
    loose = setsim_prefix_candidates(sets, positional_filter=False, **kw)
    tight = setsim_prefix_candidates(sets, positional_filter=True, **kw)
    n_loose, n_tight = loose.count(), tight.count()
    assert n_tight < n_loose, (n_tight, n_loose)
    surviving = {(r["id_a"], r["id_b"]) for r in tight.collect()}
    want = _bruteforce_setsim(spark, df, 7, 10)
    assert want, "fixture produced no true pairs — test is vacuous"
    assert {(a, b) for a, b, _ in want} <= surviving


# --- asymmetric containment ---


def test_containment_is_directed(spark):
    from bangumi_notion_data_integration_project_spark.operators.dedup import (
        containment_pairs,
    )

    small = DOC
    big = DOC + " plus twenty completely unrelated trailing words " + OTHER + " " + OTHER.upper()
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, OTHER)], "doc_id: long, text: string"
    )
    got = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in containment_pairs(df, "text", "doc_id").collect()
    }
    # both small docs are verbatim inside big — and big inside neither:
    # exactly the asymmetry Jaccard cannot express (J(1,2) = 11/28)
    assert set(got) == {(1, 2), (3, 2)}, got
    assert got[(1, 2)] == 1.0 and got[(3, 2)] == 1.0


# --- winnowing fingerprints ---


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The MOSS guarantee: any shared token run of length >= w + k - 1
    must contribute at least one IDENTICAL selected (hash) fingerprint
    to both documents — regardless of where the run sits in each doc.
    Probed over several placements and random surroundings."""
    import random

    from bangumi_notion_data_integration_project_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(50)]
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    rows = []
    for i in range(6):
        left = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20)))
        right = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20)))
        rows.append((i, f"{left} {shared} {right}".strip()))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sel = winnowing_fingerprints(df, "text", "doc_id", k=3, w=4)
    by_doc: dict[int, set] = {}
    for r in sel.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["sel_hash"])
    for a in range(6):
        for b in range(a + 1, 6):
            assert by_doc[a] & by_doc[b], (
                f"docs {a},{b} share a 6-token run but no fingerprint"
            )


def test_winnowing_density_near_theory(spark):
    """Expected selection density is 2/(w+1); on random text the
    measured density must land in a loose band around it (the bound
    guarantees density <= 1 window per position and ~2/(w+1) expected
    for random hashes)."""
    import random

    from bangumi_notion_data_integration_project_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    import string

    rng = random.Random(13)
    # the k-gram hash keys on (first char, length) per token — vary
    # BOTH, or ties dominate and tie-heavy selection inflates density
    vocab = [
        rng.choice(string.ascii_lowercase)
        + "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(0, 10)))
        for _ in range(500)
    ]
    text = " ".join(rng.choice(vocab) for _ in range(3000))
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    sel = winnowing_fingerprints(df, "text", "doc_id", k=3, w=4)
    rows = sel.collect()
    n_kgrams = rows[0]["n_kgrams"]
    density = len({r["sel_pos"] for r in rows}) / n_kgrams
    assert 0.3 <= density <= 0.5, density  # theory: 2/(4+1) = 0.4
