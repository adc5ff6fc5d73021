"""Deduplication operators for training-data pipelines (SURVEY §7.1 M5).

Four tiers, all shuffle-efficient at 100 TB:

- exact:      hash-groupBy on a normalized key. One shuffle; at scale,
              group on xxhash64(text) first so the shuffle key is 8
              bytes, not the document body.
- bag-of-words: exact dedup on an order-insensitive token fingerprint
              (catches shuffled word order).
- MinHash+LSH: shingle → minhash signature → band buckets → bucket
              join. Candidate pairs only ever meet inside a bucket, so
              the join is |bucket|² per bucket, not N² global.
- SimHash:    64-bit near-dup fingerprint; hamming-close docs collide
              on band substrings.

Everything is built from native higher-order functions + xxhash64; no
Python UDFs, so signatures compute JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 for the (a*h + b) mod p permutation family:
# with a, h' < p the product stays < 2^62, inside int64 (ANSI-safe).
_MERSENNE_P = (1 << 31) - 1


def normalized_text(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact (normalized) text.

    Scale note: groups on the full normalized text, which Catalyst
    hashes for the exchange anyway; for 100 TB add a pre-projection to
    xxhash64(text) and group on that (collision probability ~2^-64).
    """
    key = normalized_text(text_col).alias("__norm")
    w = Window.partitionBy("__norm").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__norm", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__norm", "__rn")
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-gram word shingles as strings ("w1 w2 w3").

    The tokenization is bound to a lambda variable (via a one-element
    array transform) so the regex split runs ONCE per row. Referencing
    the split expression directly inside the per-gram lambda would
    inline it at every element_at — Catalyst does not CSE into
    higher-order lambdas, and the per-doc cost goes quadratic in
    token count."""
    toks = F.split(normalized_text(text), " ")

    def grams_of(t: Column) -> Column:
        # guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]), so a
        # document shorter than n tokens must yield an empty index list
        # (element_at(t, 0) raises), not a two-element one
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(
                idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])
            )
        )

    return F.element_at(F.transform(F.array(toks), grams_of), 1)


def shingle_hashes(shingles: Column) -> Column:
    """xxhash64 each shingle into the 31-bit permutation domain.

    Materialize this ONCE (e.g. ``withColumn``) before fanning out into
    per-permutation minima — inlining it into minhash_signature would
    re-hash every shingle num_hashes times (Catalyst does not CSE the
    subtree across the signature's array elements)."""
    return F.transform(shingles, lambda s: F.abs(F.xxhash64(s)) % _MERSENNE_P)


def minhash_permutations(num_hashes: int = 32, seed: int = 42) -> list[tuple[int, int]]:
    """The (a, b) constants of the (a*x+b) mod p permutation family —
    one deterministic stream shared by the HOF signature expression and
    the aggregate-form signature so both produce identical values."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
        for _ in range(num_hashes)
    ]


def minhash_signature(hashes_col: str, num_hashes: int = 32, seed: int = 42) -> Column:
    """num_hashes-wide MinHash signature via (a*x+b) mod p permutations
    over a pre-hashed shingle column (see shingle_hashes).

    Built as num_hashes separate SQL-parsed expressions over the named
    hash column, NOT one nested lambda: a single expression that
    captures ``hashes_col`` exactly once invites CollapseProject to
    inline the (expensive) shingle-hash subtree into the lambda body,
    where it is re-evaluated once per permutation per row (measured
    ~20x regression). The multi-reference form pins ``hashes_col`` as a
    materialized projection; per-expression ``F.expr`` keeps the
    driver-side build to one parse call each.

    NOTE: higher-order functions never enter whole-stage codegen, so
    this per-row form runs interpreted. For bulk signature computation
    use the explode + MIN-aggregate form in ``minhash_lsh_candidates``
    (identical values, ~10x faster); this expression form remains for
    single-pass per-row contexts."""
    mins = []
    for a, b in minhash_permutations(num_hashes, seed):
        mins.append(
            f"array_min(transform({hashes_col}, h -> (h * {a}L + {b}L) % {_MERSENNE_P}))"
        )
    return F.array(*[F.expr(m) for m in mins])


def minhash_bands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document banded MinHash bucket keys: ``(__id, __band,
    __bucket)``, ``bands`` rows per document. The shared front half of
    :func:`minhash_lsh_candidates` — exposed so an INCREMENTAL dedup
    index can store these rows and probe new arrivals against them
    (streaming/incremental.start_streaming_dedup_index); the stored
    row set is a pure function of the document set, which is what
    makes that index replay-exact by set-union algebra."""
    rows_per_band = num_hashes // bands
    # Shingle hashing without building shingle strings: hash each token
    # once, then hash each n-consecutive-token-hash window (xxhash64 is
    # variadic). Equivalent de-dup behavior to hashing "w1 w2 w3"
    # strings, minus the per-shingle concat allocation. The token-hash
    # array is bound as a LAMBDA VARIABLE (one-element array transform,
    # same trick as word_shingles): binding it as a named projection
    # column instead invites CollapseProject to inline the token-hash
    # transform into every element_at of the gram lambda — the token
    # pass then reruns ~3× per gram (measured 4-5× slowdown).
    window_args = ", ".join(f"element_at(__th, i + {j})" for j in range(shingle_n))
    tok_hash_expr = (
        f"transform(split(lower(trim(regexp_replace({text_col}, '\\\\s+', ' '))), ' '), "
        "t -> xxhash64(t))"
    )
    shingle_hash_expr = (
        f"transform(array({tok_hash_expr}), __th -> "
        f"if(size(__th) < {shingle_n}, array(), "
        f"array_distinct(transform(sequence(1, size(__th) - {shingle_n - 1}), "
        f"i -> abs(xxhash64({window_args})) % {_MERSENNE_P}))))[0]"
    )
    hashed = (
        df.select(
            F.col(id_col).alias("__id"),
            F.expr(shingle_hash_expr).alias("__hashes"),
        )
        # docs shorter than shingle_n tokens have no shingles: every
        # signature slot would be array_min([]) = NULL, all such docs
        # would share one band bucket, and that single unbounded bucket
        # yields |bucket|^2 spurious pairs — drop them before banding
        # (they cannot be meaningful near-dup candidates anyway)
        .filter(F.size("__hashes") > 0)
    )
    # Signature via explode + 32 MIN aggregates, not the per-row HOF
    # expression: higher-order functions are excluded from whole-stage
    # codegen, so 32 × transform() per row runs interpreted (~10x
    # slower measured). Exploding the distinct shingle hashes and
    # taking partial+final MINs keeps the whole stage in generated
    # code; map-side combine collapses to one row per document before
    # the exchange. Values are identical — same permutation constants
    # over the same hash set.
    perms = minhash_permutations(num_hashes)
    exploded = hashed.select("__id", F.explode("__hashes").alias("__h"))
    sig_mins = exploded.groupBy("__id").agg(
        *[
            F.min((F.col("__h") * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P)).alias(
                f"__m{i}"
            )
            for i, (a, b) in enumerate(perms)
        ]
    )
    return (
        sig_mins.select(
            "__id",
            F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("__sig"),
        )
        .select(
            "__id",
            # per-band expressions reference __sig multiple times on
            # purpose — see minhash_signature's CollapseProject note
            F.posexplode(
                F.array(
                    *[
                        F.expr(
                            f"xxhash64(slice(__sig, {i * rows_per_band + 1}, {rows_per_band}))"
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("__band", "__bucket"),
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded LSH.

    Plan shape: project signature → explode bands (×bands rows) →
    shuffle on (band, band_hash) → self-join inside buckets. At 100 TB
    the explode stays narrow (id + 8-byte hash), and bucket sizes are
    bounded by the band width, so no N² blowup. Pairs sharing multiple
    bands are deduped.
    """
    banded = minhash_bands(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    # Pair generation: ONE aggregation per (band, bucket) then in-bucket
    # combinations — the signature pipeline runs once (a self-join would
    # evaluate it for both sides) and the only exchanges are the bucket
    # groupBy and the final distinct.
    buckets = (
        banded.groupBy("__band", "__bucket")
        .agg(F.sort_array(F.collect_list("__id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (default: LSH candidates).

    Returns (id_a, id_b, jaccard) for pairs ≥ threshold. The exact
    verify join re-reads only candidate rows; at scale, semi-join
    pushdown keeps it linear in |candidates|.
    """
    if candidates is None:
        candidates = minhash_lsh_candidates(df, text_col, id_col, shingle_n=shingle_n)
    sh = df.select(
        F.col(id_col).alias("__id"), word_shingles(text_col, shingle_n).alias("__sh")
    )
    joined = (
        candidates.join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def inverted_index_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    threshold: float = 0.6,
    df_cap: int = 1000,
) -> DataFrame:
    """Exact-Jaccard near-dup pairs from an inverted shingle index — the
    whole-corpus candidate generator behind ``dedup_near_pipeline``.

    Shingles with document frequency above ``df_cap`` are dropped from
    the index before pairing (boilerplate guard): one hot shingle
    contributes df² candidate rows, so at 100 TB a stopword 3-gram would
    dominate the shuffle. Dropping it only loses pairs whose ENTIRE
    overlap is that boilerplate — Jaccard denominators still use the
    true (uncapped) shingle-set sizes, so surviving pairs score exactly
    as they would without the cap; only the intersection counts of
    capped shingles are forfeited. ``tests/test_dedup_similarity.py``
    exercises the cap binding: a corpus-wide boilerplate sentence stops
    pairing boilerplate-only docs while distinctive near-dups survive.

    Returns (id_a, id_b) with exact Jaccard ≥ ``threshold``, id_a < id_b.
    """
    sh = df.select(
        F.col(id_col).alias("__did"),
        F.explode(word_shingles(text_col, shingle_n)).alias("s"),
    ).localCheckpoint(eager=False)  # feeds df-filter, both join sides, sizes
    ok = sh.groupBy("s").agg(F.count("*").alias("__df")).filter(
        F.col("__df") <= df_cap
    )
    idx = sh.join(ok.select("s"), "s", "left_semi").localCheckpoint(eager=False)
    inter = (
        idx.select(F.col("__did").alias("id_a"), "s")
        .join(idx.select(F.col("__did").alias("id_b"), "s"), "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__inter"))
    )
    sizes = sh.groupBy("__did").agg(F.count("*").alias("__n"))
    return (
        inter.join(
            sizes.select(F.col("__did").alias("id_a"), F.col("__n").alias("__na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("__did").alias("id_b"), F.col("__n").alias("__nb")),
            "id_b",
        )
        .filter(
            F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter"))
            >= threshold
        )
        .select("id_a", "id_b")
    )


def simhash64_docs(
    df: DataFrame, text_col: str, id_col: str, token_hash_bits: int = 64
) -> DataFrame:
    """Bulk SimHash: (id, simhash) for every row of ``df``.

    Same per-bit majority vote as :func:`simhash64`, but computed as
    explode + 64 per-bit SUM aggregates instead of a per-row
    higher-order fold — HOFs never enter whole-stage codegen, so the
    fold form runs interpreted (~30× slower on a corpus); the explode
    form keeps token hashing, bit extraction, and the partial/final
    sums all in generated code, and the map-side combine collapses to
    one row per document before the exchange."""
    bits = token_hash_bits
    # Split directly on \s+ after an ANCHORED edge-whitespace strip —
    # trim() alone removes only ASCII spaces, so "hello\n" would keep
    # the newline and split to ["hello", ""], diverging from the
    # collapse-then-split expression form (simhash64). The anchored
    # regex is one cheap pass vs collapsing every interior run; token
    # streams are identical (empty text still gives [""]). The token
    # COUNT is recovered as count(*) per doc after the explode instead
    # of a size(split()) projection, which would re-run the whole
    # normalize+split a second time per row — measured ~40% of this
    # operator's cost. Null text is out of contract (documents.text is
    # non-null in the model).
    strip = f"regexp_replace({text_col}, '(^\\\\s+)|(\\\\s+$)', '')"
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.expr(f"split(lower({strip}), '\\\\s+')")).alias("__t"),
    )
    # hash once per exploded token: aggregate expressions do not share
    # subexpressions, so putting xxhash64 inside each bit sum would
    # hash every token once per aggregate
    hashed = toks.select("__id", F.xxhash64("__t").alias("__h"))
    # Two bit-counters packed per SUM (32 aggregates, not 64): bit i and
    # bit i+32 of each token hash ride in the low/high 32-bit lanes of
    # one int64 accumulator — each lane's count is bounded by the doc's
    # token count, so lanes can't carry into each other below 2^31
    # tokens per document (a 16-bit/4-lane packing would overflow at a
    # realistic 65k-token document, so stop at 2 lanes). Halves the
    # per-row aggregate-update work; values are bit-identical.
    half = bits // 2
    counted = hashed.groupBy("__id").agg(
        F.count("*").alias("__nt"),
        *[
            F.sum(
                F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1))
                + F.shiftleft(
                    F.shiftright(F.col("__h"), i + half).bitwiseAND(F.lit(1)), 32
                )
            ).alias(f"__p{i}")
            for i in range(half)
        ],
    )
    lane_mask = F.lit((1 << 32) - 1).cast("long")
    sig = None
    for i in range(bits):
        packed = F.col(f"__p{i % half}")
        count = (
            packed.bitwiseAND(lane_mask) if i < half else F.shiftright(packed, 32)
        )
        bit = F.when(
            count * 2 > F.col("__nt"),
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return counted.select(F.col("__id").alias(id_col), sig.alias("simhash"))


def simhash64(text_col: str, token_hash_bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens.

    Per-bit majority vote of token hashes: bit_i(sig) = 1 iff more
    token hashes have bit_i set than not. One SQL aggregate carries a
    64-slot bit-count accumulator over the token-hash array and packs
    the majority bits in its finish lambda — a single pass per row and
    a single parse on the driver (the naive form is 64 parallel filter
    expressions, each re-evaluating the token hashes).
    """
    bits = token_hash_bits
    norm = f"lower(trim(regexp_replace({text_col}, '\\\\s+', ' ')))"
    hashes = f"transform(split({norm}, ' '), t -> xxhash64(t))"
    n_tokens = f"size(split({norm}, ' '))"
    return F.expr(
        f"aggregate({hashes}, array_repeat(0L, {bits}), "
        f"(acc, x) -> zip_with(acc, transform(sequence(0, {bits - 1}), "
        f"i -> shiftright(x, i) & 1), (a, b) -> a + b), "
        f"acc -> aggregate(sequence(0, {bits - 1}), 0L, "
        f"(s, i) -> s + if(element_at(acc, i + 1) * 2 > {n_tokens}, shiftleft(1L, i), 0L)))"
    )


def _rarest_first_prefix(
    sets: DataFrame, *, tau_num: int, tau_den: int
) -> tuple[DataFrame, DataFrame]:
    """Shared prefix-index builder for the PPJoin-family operators.

    Returns ``(prefix, toks)`` over a (__did, __set) frame: ``toks`` is
    the exploded (__did, __sz, token) stream with __sz riding from
    F.size at explode time (a count window would re-sort the whole
    stream to recompute it), and ``prefix`` is its subset whose
    rarest-first rank (document frequency, then token — a total order)
    falls within the first ``|S| - ceil(tau*|S|) + 1`` positions: by
    pigeonhole any pair meeting the tau overlap bound shares a token
    inside that prefix, so indexing only prefixes is lossless. The
    ceil rides an integer floor-div so no float ever enters the bound.
    """
    toks = sets.select(
        "__did",
        F.size("__set").alias("__sz"),
        F.explode("__set").alias("token"),
    )
    dfreq = toks.groupBy("token").agg(F.count("*").alias("__tdf"))
    w_rank = Window.partitionBy("__did").orderBy("__tdf", "token")
    ranked = toks.join(dfreq, "token").withColumn(
        "__rn", F.row_number().over(w_rank)
    )
    need = F.floor((F.col("__sz") * tau_num + tau_den - 1) / tau_den)
    return ranked.filter(F.col("__rn") <= F.col("__sz") - need + 1), toks


def setsim_prefix_candidates(
    sets: DataFrame,
    *,
    tau_num: int,
    tau_den: int,
    length_filter: bool = True,
    positional_filter: bool = True,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs for :func:`setsim_prefix_pairs`:
    the rarest-first prefix index self-join plus (by default) PPJoin's
    LENGTH and POSITIONAL filters. ``sets`` carries (__did, __set).
    Exposed separately so the scale probe can count candidates with
    each filter toggled — both are lossless (implied by the final
    Jaccard bound), so the deltas are pure pre-verify pruning.

    Length filter: J(A,B) >= tau forces |∩| >= tau*|∪|, and with
    |∩| <= min(|A|,|B|), |∪| >= max(|A|,|B|) that means
    tau*max(|A|,|B|) <= min(|A|,|B|) — checked in integers before the
    candidate pair ever reaches the array_intersect verify join.

    Positional filter: both sides' arrays follow the SAME global
    total order, so for a tau-similar pair its FIRST common token is
    common at positions (i, j) with no common token before either —
    hence overlap <= 1 + min(|A|-i, |B|-j). Jaccard >= tau needs
    overlap alpha = ceil(tau*(|A|+|B|)/(1+tau)); first-common also
    forces alpha <= |A|-i+1 (and same for B), which is exactly the
    prefix bound, so the first common token of every true pair sits
    in BOTH prefixes and witnesses the survival of that pair under
    EXISTS-any-shared-token semantics — pruning shared tokens whose
    positional upper bound is < alpha keeps every true pair. Pure
    integer arithmetic throughout (alpha via floor-div ceil).
    """
    prefix, _ = _rarest_first_prefix(sets, tau_num=tau_num, tau_den=tau_den)
    cond = F.col("id_a") < F.col("id_b")
    if length_filter:
        cond = cond & (
            F.greatest("__sa", "__sb") * tau_num
            <= F.least("__sa", "__sb") * tau_den
        )
    if positional_filter:
        # alpha = ceil(num*(sa+sb)/(num+den)); ubound(i,j) at the
        # shared token = 1 + min(sa-i, sb-j)
        alpha = F.floor(
            ((F.col("__sa") + F.col("__sb")) * tau_num + (tau_num + tau_den) - 1)
            / (tau_num + tau_den)
        )
        cond = cond & (
            1 + F.least(F.col("__sa") - F.col("__ra"), F.col("__sb") - F.col("__rb"))
            >= alpha
        )
    return (
        prefix.select(
            F.col("__did").alias("id_a"),
            "token",
            F.col("__sz").alias("__sa"),
            F.col("__rn").alias("__ra"),
        )
        .join(
            prefix.select(
                F.col("__did").alias("id_b"),
                "token",
                F.col("__sz").alias("__sb"),
                F.col("__rn").alias("__rb"),
            ),
            "token",
        )
        .filter(cond)
        .select("id_a", "id_b")
        .distinct()
    )


def setsim_prefix_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    tau_num: int = 7,
    tau_den: int = 10,
) -> DataFrame:
    """Exact set-similarity self-join with PREFIX FILTERING (PPJoin's
    candidate rule) over n-gram shingle sets — the third
    candidate-generation tier next to MinHash-LSH (probabilistic) and
    the full inverted index (exact but index-everything). At the same
    (shingle_n, tau) it must land on the IDENTICAL pair set as
    ``minhash_lsh_candidates``+verify — three independent algorithms
    cross-validating one exact answer.

    Shingles are globally ordered rarest-first (document frequency,
    then value — a total order, so both engines build identical
    prefixes). A pair with set Jaccard >= tau must share
    >= ceil(tau*|S|) elements, so by pigeonhole it shares at least one
    inside each side's first ``|S| - ceil(tau*|S|) + 1`` elements of
    that order: the candidate join indexes only those prefixes, and the
    filter is LOSSLESS — the DuckDB oracle computes the same result
    from the FULL inverted index and the hashes must agree.

    Scale shape (100 TB): the index carries ~(1-tau) of each doc's
    shingles, and the rarest-first order means a hot boilerplate
    shingle enters a prefix only for docs where it is among the rarest
    — hot keys self-select OUT of the join, which is why this needs no
    df_cap to survive skew. Candidates additionally pass PPJoin's
    length filter (``tau*max(|A|,|B|) <= min(|A|,|B|)``, implied by
    the final Jaccard bound, checked in integers) so cross-size pairs
    never reach the verify join, and its positional filter (overlap
    upper bound ``1 + min(|A|-i, |B|-j)`` at the shared prefix token
    must reach the required overlap) so pairs meeting only deep in
    their suffixes are dropped at the index join. The threshold is a rational
    ``tau_num/tau_den`` so every comparison stays in integers:
    pairs need ``n_common*(den+num) >= num*(|A|+|B|)``, exactly the
    Jaccard bound with no float boundary flake.

    Returns (id_a, id_b, n_common, jaccard) with id_a < id_b.
    """
    sets = df.select(
        F.col(id_col).alias("__did"),
        word_shingles(text_col, shingle_n).alias("__set"),
    ).localCheckpoint(eager=False)  # feeds index, sizes, and both verify sides
    cand = setsim_prefix_candidates(
        sets, tau_num=tau_num, tau_den=tau_den
    )
    a = sets.select(F.col("__did").alias("id_a"), F.col("__set").alias("__ta"))
    b = sets.select(F.col("__did").alias("id_b"), F.col("__set").alias("__tb"))
    inter = F.size(F.array_intersect("__ta", "__tb")).cast("long")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("n_common", inter)
        .withColumn("__na", F.size("__ta").cast("long"))
        .withColumn("__nb", F.size("__tb").cast("long"))
        .filter(
            F.col("n_common") * (tau_den + tau_num)
            >= tau_num * (F.col("__na") + F.col("__nb"))
        )
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("__na") + F.col("__nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    tau_num: int = 4,
    tau_den: int = 5,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: directed pairs where doc A's
    shingle set is mostly contained in doc B's —
    ``|S(A) ∩ S(B)| / |S(A)| >= tau``. Catches doc-inside-doc
    duplication (a paragraph quoted wholesale inside a larger page)
    that symmetric Jaccard misses: the big doc's denominator drowns
    the overlap.

    Candidate generation is a LOSSLESS contained-side prefix filter
    (the containment analogue of :func:`setsim_prefix_pairs`'s PPJoin
    rule): with A's shingles in the global rarest-first total order,
    ``|A ∩ B| >= ceil(tau*|A|)`` forces at least one shared shingle
    into A's first ``|A| - ceil(tau*|A|) + 1`` positions — otherwise
    all shared shingles sit in the last ``ceil(tau*|A|) - 1`` slots,
    one fewer than the overlap requires. Only A-prefixes are indexed;
    the container side keeps its full posting list, and a globally hot
    shingle self-selects OUT of prefixes (it is never among a doc's
    rarest), so the candidate join's per-key fan-out stays bounded
    without any df_cap. Surviving candidates are verified with
    ``array_intersect`` on the FULL shingle sets, so n_common and
    containment are exact — the earlier df_cap variant under-counted
    n_common whenever a shared shingle's document frequency crossed
    the cap, diverging from the full-index oracle. The rational
    threshold keeps the filter in integers:
    ``n_common * tau_den >= tau_num * |S(A)|``.

    Returns (contained_id, container_id, n_common, containment),
    directed, contained_id != container_id.
    """
    sets = df.select(
        F.col(id_col).alias("__did"),
        word_shingles(text_col, shingle_n).alias("__set"),
    ).localCheckpoint(eager=False)  # feeds prefix ranks, full index, verify
    prefix, toks = _rarest_first_prefix(sets, tau_num=tau_num, tau_den=tau_den)
    # container-side length filter (lossless): the overlap can never
    # exceed |B|, so containment needs |B| >= ceil(tau*|A|) — checked
    # in integers at the candidate join, before the set-verify join
    # ever sees a container smaller than the bound
    cand = (
        prefix.select(
            F.col("__did").alias("contained_id"),
            "token",
            F.col("__sz").alias("__sza"),
        )
        .join(
            toks.select(
                F.col("__did").alias("container_id"),
                "token",
                F.col("__sz").alias("__szb"),
            ),
            "token",
        )
        .filter(
            (F.col("contained_id") != F.col("container_id"))
            & (F.col("__szb") * tau_den >= F.col("__sza") * tau_num)
        )
        .select("contained_id", "container_id")
        .distinct()
    )
    a = sets.select(F.col("__did").alias("contained_id"), F.col("__set").alias("__ta"))
    b = sets.select(F.col("__did").alias("container_id"), F.col("__set").alias("__tb"))
    inter = F.size(F.array_intersect("__ta", "__tb")).cast("long")
    return (
        cand.join(a, "contained_id")
        .join(b, "container_id")
        .withColumn("n_common", inter)
        .withColumn("__na", F.size("__ta").cast("long"))
        .filter(F.col("n_common") * tau_den >= tau_num * F.col("__na"))
        .select(
            "contained_id",
            "container_id",
            "n_common",
            F.round(F.col("n_common") / F.col("__na"), 6).alias("containment"),
        )
    )


WINNOW_PRIME = 1048573  # largest prime < 2^20 — keeps the k-gram hash in 20 bits


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprint SELECTION (Schleimer/Wilkerson/Aiken's
    MOSS algorithm): hash every k-token gram, slide a w-gram window,
    keep each window's minimal hash with ties broken to the RIGHTMOST
    position. Guarantees any shared token run of length >= w + k - 1
    contributes at least one identical selected fingerprint to both
    documents (property-tested), at expected density 2/(w+1) — the
    local-match tier between the global rolling-hash fingerprint and
    shingle-set dedup.

    Engine-exact trick: hash and tie-break pack into ONE integer,
    ``key = h·2²¹ + (2²⁰ − pos)`` (h < 2²⁰ via WINNOW_PRIME, pos <
    2²⁰ — token positions beyond 1M would need a wider packing), so
    the window argmin-with-rightmost-tie is a plain integer ``min`` in
    any engine — no struct comparison, no arg_min tie rule to align.
    One ordered window per doc, partitioned by the doc id; cost is
    O(tokens) per doc with no joins at all.

    Returns (id_col, n_kgrams, sel_pos, sel_hash) — one row per
    selected fingerprint (distinct positions); docs with fewer than
    w full windows contribute no rows.
    """
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("__pos", "__tok")
    )
    code = (
        F.ascii(F.substring("__tok", 1, 1)).cast("long") * 131
        + F.length("__tok")
    )
    w_gram = Window.partitionBy(id_col).orderBy("__pos")
    lead_cols = [F.lead(code, j).over(w_gram).alias(f"__c{j}") for j in range(k)]
    g = toks.select(id_col, "__pos", *lead_cols).filter(
        F.col(f"__c{k - 1}").isNotNull()
    )
    h = F.lit(0)
    for j in range(k):
        h = (h * 131 + F.col(f"__c{j}") % WINNOW_PRIME) % WINNOW_PRIME
    grams = g.select(
        id_col,
        F.col("__pos").alias("gpos"),
        (h * F.lit(2097152) + (F.lit(1048576) - F.col("__pos"))).alias("__key"),
    )
    w_win = Window.partitionBy(id_col).orderBy("gpos").rowsBetween(0, w - 1)
    w_cnt = Window.partitionBy(id_col)
    return (
        grams.withColumn("__wmin", F.min("__key").over(w_win))
        .withColumn("__n", F.count(F.lit(1)).over(w_cnt))
        .filter(F.col("gpos") <= F.col("__n") - w)
        .select(
            id_col,
            F.col("__n").alias("n_kgrams"),
            (F.lit(1048576) - F.col("__wmin") % F.lit(2097152)).alias("sel_pos"),
            F.expr("__wmin div 2097152").alias("sel_hash"),
        )
        .distinct()
    )
