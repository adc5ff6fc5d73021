"""Deterministic sampling & split operators for training-data pipelines.

Random sampling (``df.sample``) is non-reproducible across runs and
engines; every operator here derives its randomness from a hash of the
row key, so the same row lands in the same split on any engine, any
cluster size, any day — the property a 100 TB training pipeline needs
for stable train/eval membership and resumable jobs.

The hash is md5's leading 4 hex chars compared lexicographically
against a threshold: uniform over 65536 slots, engine-portable (md5 hex
is identical in Spark and DuckDB/ANSI), and cheap. All operators are
narrow (no shuffle) except group quotas, which shuffle once on the
group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_slot(key: Column | str, salt: str = "") -> Column:
    """Lexicographic 4-hex-digit slot in '0000'..'ffff' (uniform)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 4)


def slot_threshold(fraction: float) -> str:
    """Hex threshold such that slot < threshold selects ~fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    n = int(round(fraction * 65536))
    # 65536 would format as 5-char '10000', which sorts BELOW '0…'-'f…'
    # lexicographically; 'g' sorts above every 4-char hex slot
    return "g" if n >= 65536 else format(n, "04x")


def hash_sample(df: DataFrame, key: str, fraction: float, *, salt: str = "") -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash (deterministic,
    re-runnable, engine-portable). Salt decorrelates independent
    samples over the same keys."""
    return df.filter(_hash_slot(key, salt) < slot_threshold(fraction))


def train_test_split(
    df: DataFrame, key: str, *, test_fraction: float = 0.1, salt: str = ""
) -> DataFrame:
    """Stamp a deterministic 'split' column ('test' / 'train') keyed by
    row hash: membership is stable under re-runs and appends."""
    return df.withColumn(
        "split",
        F.when(
            _hash_slot(key, salt) < slot_threshold(test_fraction), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def group_quota(
    df: DataFrame, group_col: str, key: str, *, k: int
) -> DataFrame:
    """At most k rows per group, picked in hash order (a deterministic
    'random' k — class balancing / per-source caps). One shuffle on the
    group key."""
    w = Window.partitionBy(group_col).orderBy(_hash_slot(key), F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def pack_into_bins(
    df: DataFrame,
    *,
    size_col: str,
    order_col: str,
    capacity: int,
    partition_col: str | None = None,
    shard_col: Column | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """Token-budget sequence packing: assign each row a bin id so
    consecutive rows (in ``order_col`` order) accumulate ~``capacity``
    units per bin — the standard cumulative-sum approximation of
    training-sequence packing (bin = floor(exclusive-cumsum/capacity)).

    Bin ids are **per (partition_col, shard)** by contract: packing
    only needs *some* grouping of rows into capacity-bounded bins, not
    one global ordered stream, so the cumsum window is partitioned by
    every grouping key the caller provides. ``shard_col`` (e.g. a hash
    bucket of the row key) is the scale lever — without it, a corpus
    with 4 languages packs in 4 tasks; with 64 shards per language it
    packs in 256. The output carries a ``shard`` column (0 when no
    ``shard_col`` was given — only added when sharding is requested)
    so downstream consumers can address bins as
    (partition, shard, bin_id).

    A fully global cumsum (no partition, no shard) funnels every row
    through one task and is refused unless ``allow_global=True``.
    """
    keys: list[Column] = []
    if partition_col is not None:
        keys.append(F.col(partition_col))
    if shard_col is not None:
        keys.append(shard_col)
    if not keys and not allow_global:
        raise ValueError(
            "pack_into_bins without partition_col/shard_col runs the whole "
            "cumsum in ONE task; pass shard_col=<hash bucket> or opt in "
            "explicitly with allow_global=True for small data"
        )
    base = Window.partitionBy(*keys) if keys else Window.partitionBy()
    w = base.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    prior = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    out = df
    if shard_col is not None:
        out = out.withColumn("shard", shard_col.cast("long"))
    return out.withColumn("bin_id", F.floor(prior / capacity).cast("long"))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    *,
    target_per_group: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified (per-group-rate) sampling: each group is
    hash-sampled at its own rate ``min(1, target/count)`` so the output
    is approximately balanced across groups — the data-mixing primitive
    (equalize sources / languages before training).

    Two narrow passes at scale: one partial+final count per group (tiny
    result, collected — group cardinality is assumed bounded, e.g.
    languages or sources, NOT user ids), thresholds embedded as a plan
    literal map, then a shuffle-free filter. Unlike ``group_quota`` (one
    full shuffle on the group key + window), rows never move.

    Threshold is ``floor(rate * 65536)`` over the md5 slot — floor, not
    round, so any engine recomputes the identical membership.
    """
    counts = df.groupBy(group_col).count().collect()
    pairs: list[Column] = []
    for r in counts:
        rate = min(1.0, target_per_group / r["count"]) if r["count"] else 0.0
        pairs.append(F.lit(r[group_col]))
        # 'g' sorts above every hex slot — keep-all without a 5-char
        # threshold breaking the 4-char lexicographic compare
        pairs.append(F.lit("g" if rate >= 1.0 else format(int(rate * 65536), "04x")))
    thresholds = F.create_map(*pairs)
    return df.filter(
        _hash_slot(key, salt) < thresholds[F.col(group_col).cast("string")]
    )


def hash_uniform(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform in (0, 1) derived from the row key.

    Uses the decimal digits of the md5 hex digest (zero-padded to six so
    digit-poor digests never shift): engine-portable — DuckDB re-derives
    the identical value with ``substr(regexp_replace(md5(k),'[a-f]','',
    'g') || '000000', 1, 6)`` — and strictly inside (0, 1) thanks to the
    +0.5 offset, so ``ln`` below is always finite.
    """
    col = F.col(key) if isinstance(key, str) else key
    digits = F.regexp_replace(F.md5(F.concat(col.cast("string"), F.lit(salt))), "[a-f]", "")
    six = F.substring(F.concat(digits, F.lit("000000")), 1, 6).cast("long")
    return (six.cast("double") + F.lit(0.5)) / F.lit(1_000_000.0)


def weighted_sample_keys(
    df: DataFrame, key: str, weight: str, *, salt: str = ""
) -> DataFrame:
    """Attach the A-ES weighted-sampling key ``-ln(u)/w`` as ``aes_key``.

    Efraimidis-Spirakis: taking the k rows with the SMALLEST key is an
    exact weighted sample without replacement with inclusion ∝ weight.
    Because u is the deterministic ``hash_uniform``, membership is
    reproducible across runs and engines. Downstream top-k via
    ``orderBy(aes_key).limit(k)`` compiles to TakeOrderedAndProject —
    per-partition heaps, no global sort, no shuffle of non-winners —
    which is what makes this the 100 TB way to draw a weighted sample
    (vs. a full sort or rejection sampling).

    Rows with NULL or non-positive weight are dropped (they have zero
    inclusion probability).
    """
    w = F.col(weight).cast("double")
    return df.filter(w > 0).withColumn(
        "aes_key", -F.log(hash_uniform(key, salt)) / w
    )
