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
    """Distinct n-gram word shingles as strings ("w1 w2 w3")."""
    toks = F.split(normalized_text(text), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    )
    return F.array_distinct(grams)


def shingle_hashes(shingles: Column) -> Column:
    """xxhash64 each shingle into the 31-bit permutation domain.

    Materialize this ONCE (e.g. ``withColumn``) before fanning out into
    per-permutation minima — inlining it into minhash_signature would
    re-hash every shingle num_hashes times (Catalyst does not CSE the
    subtree across the signature's array elements)."""
    return F.transform(shingles, lambda s: F.abs(F.xxhash64(s)) % _MERSENNE_P)


def minhash_signature(hashes: Column, num_hashes: int = 32, seed: int = 42) -> Column:
    """num_hashes-wide MinHash signature via (a*x+b) mod p permutations
    over pre-hashed shingles (see shingle_hashes). Pure column
    expressions → JVM-side; each permutation is one multiply+mod pass
    over a small int array."""
    import random

    rng = random.Random(seed)
    mins = []
    for _ in range(num_hashes):
        a = rng.randrange(1, _MERSENNE_P)
        b = rng.randrange(0, _MERSENNE_P)
        mins.append(
            F.array_min(F.transform(hashes, lambda h: (h * a + b) % _MERSENNE_P))
        )
    return F.array(*mins)


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
    rows_per_band = num_hashes // bands
    banded = (
        df.select(
            F.col(id_col).alias("__id"),
            shingle_hashes(word_shingles(text_col, shingle_n)).alias("__hashes"),
        )
        .select("__id", minhash_signature(F.col("__hashes"), num_hashes).alias("__sig"))
        .select(
            "__id",
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(
                            F.slice(F.col("__sig"), i * rows_per_band + 1, rows_per_band)
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("__band", "__bucket"),
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


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


def simhash64(text: Column | str, token_hash_bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens.

    Per-bit majority vote of token hashes: bit_i(sig) = 1 iff more
    token hashes have bit_i set than not. Expressed as 64 aggregate
    expressions over the token-hash array — wide but branch-free and
    fully JVM-side.
    """
    col = normalized_text(text)
    hashes = F.transform(F.split(col, " "), lambda t: F.xxhash64(t))
    n = F.size(hashes)
    bits = []
    for i in range(token_hash_bits):
        ones = F.size(
            F.filter(hashes, lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1)
        )
        bits.append(F.when(ones * 2 > n, F.lit(1).cast("long")).otherwise(F.lit(0)))
    sig = bits[0]
    for i in range(1, token_hash_bits):
        sig = sig + F.shiftleft(bits[i].cast("long"), i)
    return sig
