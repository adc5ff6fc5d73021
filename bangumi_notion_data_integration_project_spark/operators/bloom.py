"""Relational Bloom prefilter — bounded-size semi-join pruning.

Spark's runtime row-level Bloom filtering (``BloomFilterAggregate`` /
``might_contain``, injected by ``InjectRuntimeFilter``) is not exposed
through the public function registry, so this restates the same
structure relationally and engine-portably:

* the build side is reduced to its set of SET BIT POSITIONS — each
  value hashed ``num_hashes`` times (seeded ``xxhash64``) into a
  ``num_bits`` space, exploded, distinct.  The resulting one-column
  table is bounded at ``min(num_hashes * |build|, num_bits)`` rows
  NO MATTER HOW WIDE OR HOW MANY the build values are — at the default
  2^20 bits that is ≤ 8 MiB of longs, always broadcast-able;
* a probe row survives iff ALL ``num_hashes`` of its positions are
  set — expressed as ``num_hashes`` successive broadcast LEFT SEMI
  joins (AND of k membership probes).  No row id, no groupBy, no
  shuffle on the probe side.

False positives pass (rate ≈ ``(1 - e^{-k·n/m})^k``; callers re-verify
exactly downstream); false negatives are impossible — the defining
Bloom guarantees.  The 100 TB story: an exact gram-level semi-join
shuffles the full probe-side string inventory; the Bloom pass turns
that into broadcast hash joins against a ≤ ``num_bits``-row long table,
so only true matches plus the fp-rate tail ever reach the exact
(shuffling) join.  This is precisely what engines' runtime Bloom
pruning does — here visible in the plan and checkable by an oracle,
because the final output never depends on the hash values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 4


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k seeded bit positions of a value. xxhash64(value, seed) with
    a literal int seed column gives k independent 64-bit hashes; pmod
    (not %) keeps positions non-negative."""
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(num_bits))
        for seed in range(num_hashes)
    ]


def bloom_build(
    build: DataFrame,
    col: str,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Collapse the build side to its distinct set-bit positions
    (one ``__bloom_pos`` long column, ≤ min(k·n, num_bits) rows)."""
    return (
        build.select(
            F.explode(F.array(*_positions(F.col(col), num_bits, num_hashes))).alias(
                "__bloom_pos"
            )
        )
        .distinct()
    )


def bloom_prefilter(
    probe: DataFrame,
    col: str,
    bits: DataFrame,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep probe rows whose value MIGHT be in the build set: all k bit
    positions present in ``bits``.  k broadcast left-semi joins — the
    conjunction of k membership probes.  ``num_bits``/``num_hashes``
    must match the ``bloom_build`` call that produced ``bits``."""
    out = probe
    probes = _positions(F.col(col), num_bits, num_hashes)
    for seed, pos in enumerate(probes):
        b = bits.alias(f"__bloom_{seed}")
        out = out.join(
            F.broadcast(b), pos == F.col(f"__bloom_{seed}.__bloom_pos"), "left_semi"
        )
    return out
