"""Count-min sketch — fixed-size frequency estimation for item counts
over unbounded key cardinality, the frequency member of the sketch
tier (quantile bottom-k, HLL distinct, KMV set algebra, CMS counts).

State is ``depth × width`` integer cells stored as rows
``(__d, __w, cnt)`` — ≤ depth·width rows no matter how many distinct
items exist. Each item increments one cell per hash row
(``xxhash64(item..., seed + d) mod width``); a point estimate is the
MIN over its depth cells. Guarantees (Cormode & Muthukrishnan 2005):

    est ≥ true                                   (always — deterministic)
    est ≤ true + ceil(e/width · N)  w.p. ≥ 1 − e^{−depth}

with N the total item count. The first inequality is checkable
in-query on every probed item (the self-validating rows-only pattern);
the second is the reported bound column.

Merge is CELL-WISE SUM — a commutative monoid, so disjoint shards
merge to exactly the direct build (coordination-free sharded builds at
100 TB), but unlike the bottom-k/HLL/KMV semilattices a REPLAY is NOT
idempotent: exactly-once for a streaming twin would need the
__batch_id-watermark machinery (DEPLOYMENT.md ladder rung 2), which is
why the batch operator ships first.

Scale shape: the build is one map-side-combinable groupBy on (d, w) —
the shuffle carries ≤ depth·width rows per partition after partial
aggregation. Lookups broadcast the ≤ depth·width-row sketch and never
touch raw data (the serving path).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = "__d"
_W = "__w"


def cms_build(
    df: DataFrame,
    item_cols: Iterable[str],
    *,
    depth: int = 4,
    width: int = 2048,
    seed: int = 2024,
) -> DataFrame:
    """Build the sketch: ``(__d, __w, cnt)``, ≤ depth·width rows.
    Absent cells are implicit zeros (lookups coalesce). All sketches
    to be merged must share depth/width/seed."""
    if depth < 1 or width < 2:
        raise ValueError("depth >= 1 and width >= 2 required")
    items = [F.col(c) for c in item_cols]
    if not items:
        raise ValueError("item_cols must name at least one column")
    cells = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias(_D),
                F.pmod(
                    F.xxhash64(*items, F.lit(int(seed) + d)), F.lit(width)
                )
                .cast("int")
                .alias(_W),
            )
            for d in range(int(depth))
        ]
    )
    return (
        df.select(F.explode(cells).alias("__c"))
        .groupBy(F.col(f"__c.{_D}").alias(_D), F.col(f"__c.{_W}").alias(_W))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(sketches: Sequence[DataFrame]) -> DataFrame:
    """Cell-wise sum of sketches built with identical depth/width/seed.
    Exact over DISJOINT input shards (monoid — the sharded-build path);
    summing the same rows twice double-counts, by construction."""
    if not sketches:
        raise ValueError("need at least one sketch")
    from functools import reduce

    u = reduce(DataFrame.unionByName, sketches)
    return u.groupBy(_D, _W).agg(F.sum("cnt").cast("long").alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_cols: Iterable[str],
    *,
    depth: int = 4,
    width: int = 2048,
    seed: int = 2024,
) -> DataFrame:
    """Point estimates for each distinct row of ``items``:
    ``(item..., est)`` with est = min over the depth cells (missing
    cell ⇒ 0 ⇒ the item was never seen). The sketch (≤ depth·width
    rows) broadcasts; raw data is never touched."""
    cols = list(item_cols)
    its = [F.col(c) for c in cols]
    probes = items.select(*cols).distinct()
    exploded = probes.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias(_D),
                        F.pmod(
                            F.xxhash64(*its, F.lit(int(seed) + d)),
                            F.lit(width),
                        )
                        .cast("int")
                        .alias(_W),
                    )
                    for d in range(int(depth))
                ]
            )
        ).alias("__c"),
    ).select(*cols, f"__c.{_D}", f"__c.{_W}")
    return (
        exploded.join(F.broadcast(sketch), [_D, _W], "left")
        .groupBy(*cols)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est")
        )
    )


def cms_error_bound(width: int, n_total: int) -> int:
    """The w.p. ≥ 1 − e^{−depth} overestimate ceiling: ceil(e/width·N)
    (ε = e/width for the standard CM construction)."""
    import math

    return int(math.ceil(math.e / float(width) * float(n_total)))
