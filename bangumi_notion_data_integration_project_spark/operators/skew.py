"""Salted join — explicit skew mitigation for hot keys.

At 100 TB a handful of hot keys (a viral document source, a default
user id) can put one shuffle partition hours behind the rest. AQE's
skew-join split handles sort-merge joins automatically; this operator
is the explicit variant for when the skewed side must hash-join or the
skew is known up front: the big side's key is diluted into ``n_salts``
sub-keys by a deterministic hash of a tiebreaker column, and the small
side is exploded once per salt so every sub-key still finds its match.

Results are identical to the plain join (the salt participates only in
routing), so the DuckDB oracle is the unsalted SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int,
    tiebreaker: str,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join ``big ⋈ small`` on ``key`` with the big side's
    rows spread across ``n_salts`` shuffle sub-partitions per key.
    ``tiebreaker`` is any big-side column with per-row variety (an id);
    hashing it (not a random number) keeps the plan deterministic and
    re-runnable.
    """
    salted_big = big.withColumn("__salt", F.pmod(F.hash(F.col(tiebreaker)), n_salts))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(salted_small, [key, "__salt"], how).drop("__salt")
