"""Randomized property tests: operators vs pure-Python reference
implementations on seeded random inputs (deterministic, no network,
no hypothesis shrink loop — each property runs a handful of seeds to
keep Spark job count bounded)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.merge import merge_snapshot
from bangumi_notion_data_integration_project_spark.operators.skyline import skyline_2d

SEEDS = [7, 42, 1234]


def _random_points(seed: int, n: int = 60):
    rng = random.Random(seed)
    return [
        (i, float(rng.randint(0, 20)), rng.randint(0, 20)) for i in range(n)
    ]


def _brute_skyline(pts):
    out = set()
    for i, p, s in pts:
        dominated = any(
            (q <= p and t >= s and (q < p or t > s)) for _, q, t in pts
        )
        if not dominated:
            out.add(i)
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_skyline_matches_bruteforce_dominance(spark, seed):
    pts = _random_points(seed)
    df = spark.createDataFrame(pts, "id: long, price: double, size: long")
    got = {r.id for r in skyline_2d(df, minimize="price", maximize="size").collect()}
    assert got == _brute_skyline(pts)


def _random_snapshot(rng, keys):
    return [(k, rng.randint(0, 5)) for k in keys]


@pytest.mark.parametrize("seed", SEEDS)
def test_merge_snapshot_idempotent_and_source_wins(spark, seed):
    rng = random.Random(seed)
    src_keys = rng.sample(range(30), 12)
    tgt_keys = rng.sample(range(30), 12)
    src = spark.createDataFrame(_random_snapshot(rng, src_keys), "k: long, v: long")
    tgt = spark.createDataFrame(_random_snapshot(rng, tgt_keys), "k: long, v: long")

    once = merge_snapshot(src, tgt, "k")
    # full-sync semantics: result is exactly the source snapshot
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, src.collect()))
    # idempotent: merging the same source into the result changes nothing
    twice = merge_snapshot(src, once, "k")
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))

    # upsert keeps target-only keys, source wins on common keys
    upsert = merge_snapshot(src, tgt, "k", delete_absent=False)
    got = dict(map(tuple, upsert.collect()))
    src_d = dict(map(tuple, src.collect()))
    tgt_d = dict(map(tuple, tgt.collect()))
    assert got == {**tgt_d, **src_d}


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@pytest.mark.parametrize("seed", SEEDS)
def test_zorder_key_bijective_on_random_sample(spark, seed):
    from bangumi_notion_data_integration_project_spark.catalog import zorder_key

    rng = random.Random(seed)
    pts = list({(rng.randint(0, 65535), rng.randint(0, 65535)) for _ in range(200)})
    df = spark.createDataFrame(pts, "x: long, y: long")
    rows = df.withColumn("z", zorder_key("x", "y")).collect()
    # matches the reference interleave and is injective over the sample
    assert all(r.z == _py_morton(r.x, r.y) for r in rows)
    assert len({r.z for r in rows}) == len(pts)


@pytest.mark.parametrize("seed", SEEDS)
def test_asof_join_matches_bisect_reference(spark, seed):
    import bisect

    from bangumi_notion_data_integration_project_spark.operators.asof import asof_join

    rng = random.Random(seed)
    left = [(k, rng.randint(0, 100)) for k in range(5) for _ in range(8)]
    # unique right timestamps per key so "latest at or before" is unambiguous
    right = [
        (k, t, rng.randint(0, 999))
        for k in range(5)
        for t in rng.sample(range(101), 6)
    ]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid: long, k: long, t: long"
    )
    rdf = spark.createDataFrame(right, "k: long, t: long, payload: long")

    got = {
        r.lid: r.payload_r
        for r in asof_join(
            ldf, rdf, "k", "t", "t", right_value_cols=["payload"], suffix="_r"
        ).collect()
    }

    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, t, p in right:
        by_key.setdefault(k, []).append((t, p))
    for k in by_key:
        by_key[k].sort()
    expected = {}
    for lid, (k, t) in enumerate(left):
        rows = by_key.get(k, [])
        idx = bisect.bisect_right([x[0] for x in rows], t)
        expected[lid] = rows[idx - 1][1] if idx else None
    assert set(got) == set(expected)
    mismatches = {
        lid: (got[lid], expected[lid])
        for lid in expected
        if got[lid] != expected[lid]
    }
    assert not mismatches, mismatches


def _py_chunks(toks, w, s):
    if not toks:
        return []
    n = len(toks)
    n_chunks = 1 + max(0, -(-(n - w) // s)) if n > w else 1
    return [toks[i * s : i * s + w] for i in range(n_chunks)]


@pytest.mark.parametrize("seed", SEEDS)
def test_chunking_matches_python_reference(spark, seed):
    from bangumi_notion_data_integration_project_spark.operators.chunking import (
        chunk_documents,
    )

    rng = random.Random(seed)
    docs = []
    for i in range(12):
        n = rng.choice([0, 1, 3, 15, 16, 17, 31, 64, 200])
        docs.append((i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    w, s = 16, 12  # chunk 16, overlap 4
    got = {
        (r.doc_id, r.chunk_id): r.chunk_text
        for r in chunk_documents(df, chunk_size=w, overlap=w - s).collect()
    }
    want = {}
    for i, text in docs:
        for ci, ch in enumerate(_py_chunks(text.split() if text else [], w, s)):
            want[(i, ci)] = " ".join(ch)
    assert got == want


def _py_scd2(history, source, effective):
    """Pure-Python SCD2 reference: history rows (k, attr, vf, vt) with
    vt None = open; source rows (k, attr). Returns the merged multiset."""
    out = [r for r in history if r[3] is not None]  # closed passthrough
    cur = {r[0]: r for r in history if r[3] is None}
    src = dict(source)
    for k, r in cur.items():
        if k not in src or src[k] == r[1]:
            out.append(r)  # absent or unchanged → stays open
        else:
            out.append((k, r[1], r[2], effective))  # close old version
            out.append((k, src[k], effective, None))  # reopen with new value
    for k, a in src.items():
        if k not in cur:
            out.append((k, a, effective, None))  # brand-new key
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_scd2_matches_python_reference(spark, seed):
    from bangumi_notion_data_integration_project_spark.operators.merge import merge_scd2

    rng = random.Random(seed)
    hist = []
    for k in rng.sample(range(25), 15):
        t = 0
        for _ in range(rng.randint(0, 2)):  # closed back-versions
            hist.append((k, rng.randint(0, 3), t, t + 1))
            t += 1
        if rng.random() < 0.85:  # some keys carry ONLY closed history
            hist.append((k, rng.randint(0, 3), t, None))
    source = [(k, rng.randint(0, 3)) for k in rng.sample(range(30), 12)]
    effective = 100

    h = spark.createDataFrame(
        hist, "k: long, attr: long, valid_from: long, valid_to: long"
    )
    s = spark.createDataFrame(source, "k: long, attr: long")
    got = sorted(
        [
            (r.k, r.attr, r.valid_from, r.valid_to)
            for r in merge_scd2(h, s, "k", ["attr"], effective).collect()
        ],
        key=lambda t: tuple((x is None, x) for x in t),
    )
    want = sorted(_py_scd2(hist, source, effective),
                  key=lambda t: tuple((x is None, x) for x in t))
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_merge_scoped_matches_python_reference(spark, seed):
    from bangumi_notion_data_integration_project_spark.operators.merge import merge_scoped

    rng = random.Random(seed)
    parts = ["p1", "p2", "p3", "p4"]
    tgt = [(k, rng.randint(0, 5), rng.choice(parts)) for k in rng.sample(range(40), 20)]
    touched = set(rng.sample(parts, 2))
    # keys stay in their target partition (the operator's contract)
    part_of = {k: p for k, _, p in tgt}
    src = [
        (k, rng.randint(0, 5), part_of.get(k, rng.choice(sorted(touched))))
        for k in rng.sample(range(40), 15)
        if part_of.get(k, rng.choice(sorted(touched))) in touched
    ]
    if not src:  # guarantee at least one touched row
        src = [(99, 1, sorted(touched)[0])]
    sdf = spark.createDataFrame(src, "k: long, v: long, p: string")
    tdf = spark.createDataFrame(tgt, "k: long, v: long, p: string")
    got = sorted((r.k, r.v, r.p) for r in merge_scoped(sdf, tdf, "k", "p").collect())
    actually_touched = {p for _, _, p in src}
    want = sorted(src + [(k, v, p) for k, v, p in tgt if p not in actually_touched])
    assert got == want


# --- inverted-index near-dup pairs vs brute-force Jaccard ------------------


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.strip().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute_jaccard_pairs(docs, threshold, n=3):
    out = set()
    for i, (ida, ta) in enumerate(docs):
        sa = _py_shingles(ta, n)
        for idb, tb in docs[i + 1 :]:
            sb = _py_shingles(tb, n)
            if not sa and not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if union and inter / union >= threshold:
                out.add((min(ida, idb), max(ida, idb)))
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_inverted_index_pairs_matches_bruteforce(spark, seed):
    from bangumi_notion_data_integration_project_spark.operators.dedup import (
        inverted_index_pairs,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → real collisions
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 10))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {
        (r["id_a"], r["id_b"])
        for r in inverted_index_pairs(
            df, "text", "doc_id", shingle_n=3, threshold=0.5, df_cap=10**6
        ).collect()
    }
    assert got == _brute_jaccard_pairs(docs, 0.5)


# --- deterministic k-means vs pure-Python Lloyd ----------------------------


def _py_kmeans(vectors, k, iterations):
    ids = sorted(vectors)
    seeds = [i for i in ids if i % 7 == 0][:k]
    cents = [list(map(float, vectors[s])) for s in seeds]

    def assign(cs):
        out = {}
        for vid in ids:
            best = None
            for cell, c in enumerate(cs):
                d = round(sum((float(x) - y) * (float(x) - y) for x, y in zip(vectors[vid], c)), 6)
                if best is None or (d, cell) < best[:2]:
                    best = (d, cell)
            out[vid] = (best[1], best[0])
        return out

    for _ in range(iterations):
        a = assign(cents)
        sums: dict[int, list] = {}
        counts: dict[int, int] = {}
        for vid, (cell, _d) in a.items():
            counts[cell] = counts.get(cell, 0) + 1
            s = sums.setdefault(cell, [0.0] * len(vectors[vid]))
            for j, x in enumerate(vectors[vid]):
                s[j] += float(x)
        cents = [
            [round(s / counts[cell], 6) for s in sums[cell]]
            if cell in counts
            else cents[cell]
            for cell in range(len(cents))
        ]
    return {vid: (cell, d) for vid, (cell, d) in assign(cents).items()}


@pytest.mark.parametrize("seed", SEEDS)
def test_kmeans_matches_python_lloyd(spark, seed):
    from bangumi_notion_data_integration_project_spark.operators.clustering import (
        kmeans_lite,
    )

    rng = random.Random(seed)
    vectors = {
        i: [round(rng.uniform(-2, 2), 3) for _ in range(6)] for i in range(35)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vectors.items()], "vec_id: long, embedding: array<double>"
    )
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in kmeans_lite(df, k=3, iterations=2).collect()
    }
    want = _py_kmeans(vectors, 3, 2)
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_snapshot_diff_localizes_random_mutations(spark, seed):
    """Property: for random deletes/updates/inserts, the set of 'diff'
    buckets is EXACTLY the set of buckets owning a mutated key — no
    false alarms, no missed buckets (checksum collisions aside, which
    the 6-digit space makes vanishingly unlikely at this scale)."""
    from bangumi_notion_data_integration_project_spark.operators.reconcile import (
        snapshot_diff,
    )

    rng = random.Random(seed)
    n, n_buckets = 400, 16
    left_rows = [(k, k * 7 + 3) for k in range(n)]
    deleted = set(rng.sample(range(n), 5))
    updated = set(rng.sample([k for k in range(n) if k not in deleted], 5))
    inserted = {n + i for i in range(3)}
    right_rows = [
        (k, v + (1 if k in updated else 0))
        for k, v in left_rows
        if k not in deleted
    ] + [(k, k) for k in inserted]

    left = spark.createDataFrame(left_rows, ["k", "v"])
    right = spark.createDataFrame(right_rows, ["k", "v"])
    out = snapshot_diff(left, right, "k", ["v"], n_buckets=n_buckets).collect()

    want_dirty = {k % n_buckets for k in (deleted | updated | inserted)}
    got_dirty = {r["bucket"] for r in out if r["status"] == "diff"}
    assert got_dirty == want_dirty
    # row-count bookkeeping must reconcile globally
    assert sum(r["left_rows"] for r in out) == n
    assert sum(r["right_rows"] for r in out) == len(right_rows)


# ---------------------------------------------------------------------------
# CDC fold associativity: for ANY split of a random log into chunks and
# ANY reordering of events across chunks, folding the chunk nets must
# equal the one-shot net of the whole log (the property that makes the
# streaming replay correct under cross-batch disorder).
# ---------------------------------------------------------------------------


def _random_cdc(rng, n, keys):
    rows, seqs = [], {}
    for _ in range(n):
        k = rng.randrange(keys)
        seqs[k] = seqs.get(k, 0) + 1
        op = rng.choice(["I", "U", "U", "D"])
        rows.append((k, seqs[k], op, None if op == "D" else f"v{k}.{seqs[k]}"))
    return rows


@pytest.mark.parametrize("seed", SEEDS)
def test_cdc_fold_is_split_invariant(spark, seed):
    from bangumi_notion_data_integration_project_spark.operators.cdc import (
        cdc_net,
        merge_cdc_state,
    )

    rng = random.Random(seed)
    rows = _random_cdc(rng, 90, 18)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    cut1, cut2 = sorted((rng.randrange(1, 89), rng.randrange(1, 89)))
    schema = "k long, seq long, op string, val string"
    net = lambda rs: cdc_net(  # noqa: E731
        spark.createDataFrame(rs, schema), key="k", seq="seq", op="op", payload_cols=["val"]
    )
    whole = net(rows)
    state = net(shuffled[:cut1] or shuffled[:1])
    for chunk in (shuffled[cut1:cut2], shuffled[cut2:]):
        if chunk:
            state = merge_cdc_state(state, net(chunk), key="k", payload_cols=["val"])
    cols = ["k", "val", "last_op", "n_versions", "last_seq"]
    got = {tuple(r[c] for c in cols) for r in state.collect()}
    want = {tuple(r[c] for c in cols) for r in whole.collect()}
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_frequent_items_partition_count_invariant(spark, seed):
    from collections import Counter

    from bangumi_notion_data_integration_project_spark.operators.heavyhitters import (
        frequent_items,
    )

    rng = random.Random(seed)
    rows = [f"hot{i % 4}" for i in range(2000)] + [
        f"t{rng.randrange(3000)}" for _ in range(6000)
    ]
    rng.shuffle(rows)
    exact = {
        v: c for v, c in Counter(rows).items() if c > 0.03 * len(rows)
    }
    df = spark.createDataFrame([(v,) for v in rows], "token: string")
    for parts in (1, 5, 17):
        got = {
            r["token"]: r["n_occurrences"]
            for r in frequent_items(df.repartition(parts), "token", threshold=0.03).collect()
        }
        assert got == exact, f"parts={parts}"


@pytest.mark.parametrize("seed", SEEDS)
def test_kcore_fixpoint_properties(spark, seed):
    from bangumi_notion_data_integration_project_spark.operators.graph import k_core

    rng = random.Random(seed)
    edges = set()
    while len(edges) < 90:
        u, v = rng.randrange(25), rng.randrange(25)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    df = spark.createDataFrame(sorted(edges), "a: long, b: long")
    k = rng.choice([2, 3, 4])
    core = {tuple(r) for r in k_core(df, k).collect()}
    # (1) every node in the core has in-core degree >= k
    deg: dict[int, int] = {}
    for u, v in core:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert all(d >= k for d in deg.values()), (k, deg)
    # (2) maximality: peeling the REMOVED edges' nodes was forced — no
    # removed node has >= k neighbors within the core
    core_nodes = set(deg)
    for node in {x for e in edges for x in e} - core_nodes:
        n_in_core = sum(
            1 for u, v in edges if (u == node and v in core_nodes) or (v == node and u in core_nodes)
        )
        assert n_in_core < k, (node, n_in_core, k)


@pytest.mark.parametrize("seed", SEEDS)
def test_set_sketch_semilattice_under_random_shardings(spark, seed):
    """For ANY multiset and ANY partition into shards: merging the
    per-shard sketches equals sketching the whole input row-for-row,
    duplicates never change the kept set, and below-k inputs report
    exact distinct/intersection counts."""
    from bangumi_notion_data_integration_project_spark.operators.setsketch import (
        merge_set_sketches,
        set_sketch,
        set_sketch_distinct,
        set_sketch_overlap,
    )

    rng = random.Random(seed)
    ids = [rng.randrange(0, 400) for _ in range(900)]  # duplicates likely
    n_shards = rng.randint(2, 5)
    shards = [[] for _ in range(n_shards)]
    for v in ids:
        shards[rng.randrange(n_shards)].append(v)

    def df(vals):
        return spark.createDataFrame([(v,) for v in vals], "v long")

    k = 128
    direct = set_sketch(df(ids), [], ["v"], k=k)
    merged = merge_set_sketches(
        [set_sketch(df(s), [], ["v"], k=k) for s in shards if s], [], k=k
    )
    rows = lambda sk: sorted(r["__ss_h"] for r in sk.collect())  # noqa: E731
    assert rows(merged) == rows(direct)

    # below-k: exact distinct and exact overlap against Python sets
    a = set(rng.randrange(0, 200) for _ in range(150))
    b = set(rng.randrange(100, 300) for _ in range(150))
    ska = set_sketch(df(sorted(a)), [], ["v"], k=1024)
    skb = set_sketch(df(sorted(b)), [], ["v"], k=1024)
    [d] = set_sketch_distinct(ska, [], k=1024).collect()
    assert d["distinct_est"] == len(a)
    [o] = set_sketch_overlap(ska, skb, [], k=1024).collect()
    assert o["est_union"] == len(a | b)
    assert o["est_intersection"] == len(a & b)
    assert o["jaccard_est"] == round(len(a & b) / len(a | b), 6)


def _rank_series(rng, n=40, vmax=25):
    return [rng.randrange(0, vmax) for _ in range(n)]


@pytest.mark.parametrize("seed", SEEDS)
def test_rank_statistics_range_and_symmetry_invariants(spark, seed):
    """Structural invariants of the r12 rank battery on random tied
    data: tau/rho in [-1,1] and sign-flip antisymmetric under y -> -y;
    Pettitt K <= n^2/4 with the first-attaining change point; MWU AUC
    in [0,1] with auc(ref,cur) + auc(cur,ref) == 1 (the ROC identity,
    exact because both read the same 2U integer); KS D in [0,1] and
    symmetric under side swap."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        kendall_tau,
        pettitt_test,
        spearman_rho,
    )
    from bangumi_notion_data_integration_project_spark.operators.twosample import (
        ks_two_sample,
        mann_whitney_u,
    )

    rng = random.Random(seed)
    xs = _rank_series(rng)
    ys = _rank_series(rng)
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(zip(xs, ys))],
        "d long, x long, y long",
    )
    neg = df.select("d", "x", (-F.col("y")).alias("y"))
    tau = kendall_tau(df, "d", "x", "y").collect()[0]["tau_b"]
    tau_n = kendall_tau(neg, "d", "x", "y").collect()[0]["tau_b"]
    assert -1.0 <= tau <= 1.0
    assert abs(tau + tau_n) <= 1.1e-6  # antisymmetry, 6dp rounding
    rho = spearman_rho(df, "d", "x", "y").collect()[0]["rho"]
    rho_n = spearman_rho(neg, "d", "x", "y").collect()[0]["rho"]
    assert -1.0 <= rho <= 1.0
    assert abs(rho + rho_n) <= 1.1e-6

    pet = pettitt_test(df, "d", "x").collect()[0]
    n = pet["n_points"]
    assert 0 <= pet["k_stat"] <= n * n // 4 + n  # U_t bound (loose)
    assert 0.0 <= pet["p_approx"] <= 1.0

    a = spark.createDataFrame([(v,) for v in xs], "v long")
    b = spark.createDataFrame([(v,) for v in ys], "v long")
    m_ab = mann_whitney_u(a, b, "v").collect()[0]
    m_ba = mann_whitney_u(b, a, "v").collect()[0]
    assert 0.0 <= m_ab["auc"] <= 1.0
    # exact ROC identity: both sides read the same integer 2U mass
    assert abs(m_ab["auc"] + m_ba["auc"] - 1.0) <= 1.1e-6
    assert m_ab["tie_term"] == m_ba["tie_term"]
    k_ab = ks_two_sample(a, b, "v").collect()[0]
    k_ba = ks_two_sample(b, a, "v").collect()[0]
    assert 0.0 <= k_ab["d_stat"] <= 1.0
    assert k_ab["d_stat"] == k_ba["d_stat"]  # |F1-F2| is symmetric


@pytest.mark.parametrize("seed", SEEDS)
def test_bh_select_monotone_in_alpha_and_bounded(spark, seed):
    """BH structural invariants: the selected set only grows with
    alpha; selection is always a prefix of the p-ranking; nothing
    selects at alpha=0-adjacent tiny levels unless p is tiny too."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        bh_select,
    )

    rng = random.Random(seed)
    ps = sorted(round(rng.random(), 6) for _ in range(25))
    ps[0] = 1e-6  # ensure at least one plausible discovery
    rows = [(f"g{i}", p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "g string, p double")
    prev: set[str] = set()
    for alpha in (0.01, 0.05, 0.2, 0.5):
        rows_out = bh_select(df, "p", alpha=alpha, tie_cols=["g"]).collect()
        got = {r["g"] for r in rows_out if r["selected"]}
        assert prev <= got, f"selection shrank when alpha rose to {alpha}"
        prev = got
        sel_ranks = sorted(r["p_rank"] for r in rows_out if r["selected"])
        assert sel_ranks == list(range(1, len(sel_ranks) + 1))  # prefix


@pytest.mark.parametrize("seed", SEEDS)
def test_bm_and_medk_rank_invariants(spark, seed):
    """Structural invariants of the r15-ready rank operators on random
    tied data: Brunner-Munzel is a pure rank statistic, so a strictly
    monotone value map leaves (p_hat, bm_stat, p) unchanged; swapping
    the sides negates the statistic and reflects p̂ (p̂' = 1 − p̂)
    while preserving the two-sided p; Brown-Mood's χ²/p are invariant
    under the same monotone map (the median maps through it) and its
    n_above margin is bounded by n_total."""
    from bangumi_notion_data_integration_project_spark.operators.twosample import (
        brunner_munzel,
        median_test_k,
    )

    rng = random.Random(seed)
    xs = _rank_series(rng)
    ys = [v + rng.randint(0, 8) for v in _rank_series(rng)]
    a = spark.createDataFrame([(v,) for v in xs], "v long")
    b = spark.createDataFrame([(v,) for v in ys], "v long")
    base = brunner_munzel(a, b, "v").collect()[0]
    # strictly increasing map: v -> 3v + 7
    a3 = a.select((F.lit(3) * F.col("v") + 7).alias("v"))
    b3 = b.select((F.lit(3) * F.col("v") + 7).alias("v"))
    mapped = brunner_munzel(a3, b3, "v").collect()[0]
    assert (base["p_hat"], base["bm_stat"], base["p_value"]) == (
        mapped["p_hat"], mapped["bm_stat"], mapped["p_value"],
    )
    swapped = brunner_munzel(b, a, "v").collect()[0]
    assert abs(base["p_hat"] + swapped["p_hat"] - 1.0) <= 1.1e-6
    if base["bm_stat"] is not None:
        assert abs(base["bm_stat"] + swapped["bm_stat"]) <= 1.1e-6
        assert abs(base["p_value"] - swapped["p_value"]) <= 2e-9

    rows = [("a", v) for v in xs] + [("b", v) for v in ys] + [
        ("c", v + rng.randint(-4, 4)) for v in _rank_series(rng)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    m = median_test_k(df, "g", "v").collect()[0]
    m3 = median_test_k(
        df.select("g", (F.lit(3) * F.col("v") + 7).alias("v")), "g", "v"
    ).collect()[0]
    assert (m["chi2"], m["p_value"]) == (m3["chi2"], m3["p_value"])
    assert m3["median"] == 3 * m["median"] + 7
    assert 0 <= m["n_above"] <= m["n_total"]
    if m["p_value"] is not None:
        assert 0.0 <= m["p_value"] <= 1.0
