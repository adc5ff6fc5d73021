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
idempotent: the streaming twin (``start_streaming_cms``) therefore
carries the ``__batch_id``-watermark replay guard — rung 3 of
DEPLOYMENT.md's state-algebra ladder, not rung 2.

Scale shape: the build is one map-side-combinable groupBy on (d, w) —
the shuffle carries ≤ depth·width rows per partition after partial
aggregation. Lookups broadcast the ≤ depth·width-row sketch and never
touch raw data (the serving path).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D = "__d"
_W = "__w"


def _checked_item(c: str, op_name: str) -> Column:
    """Fail-loud NULL items (the psi/hampel/trend convention): Spark's
    ``xxhash64`` SKIPS null arguments, so ('a', NULL) and (NULL, 'a')
    would hash to the same cells and silently conflate their counts —
    raise instead, and let the caller filter or impute NULLs
    explicitly."""
    return F.when(
        F.col(c).isNull(),
        F.raise_error(
            F.lit(
                f"{op_name}: NULL item value in {c} — filter or impute"
                " NULL items explicitly before sketching"
            )
        ),
    ).otherwise(F.col(c))


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
    items = [_checked_item(c, "cms_build") for c in item_cols]
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
        # the parameters ride as columns so merge/lookup can fail loud
        # on a mismatch instead of silently mis-aligning cells (an
        # underestimate would break the est >= true guarantee)
        .select(
            _D,
            _W,
            "cnt",
            F.lit(int(depth)).cast("int").alias("__depth"),
            F.lit(int(width)).cast("int").alias("__width"),
            F.lit(int(seed)).cast("long").alias("__seed"),
        )
    )


def cms_merge(sketches: Sequence[DataFrame]) -> DataFrame:
    """Cell-wise sum of sketches built with identical depth/width/seed.
    Exact over DISJOINT input shards (monoid — the sharded-build path);
    summing the same rows twice double-counts, by construction."""
    if not sketches:
        raise ValueError("need at least one sketch")
    from functools import reduce

    u = reduce(DataFrame.unionByName, sketches).localCheckpoint(
        eager=False
    )  # referenced by the param gate AND the cell sum
    # scalar gate (always one row): >1 distinct parameter triple means
    # the inputs hash into DIFFERENT cell layouts — summing them would
    # silently corrupt every estimate, so raise instead
    pgate = (
        u.select("__depth", "__width", "__seed")
        .distinct()
        .agg(
            F.count("*").alias("__np"),
            F.max("__depth").alias("__pd"),
            F.max("__width").alias("__pw"),
            F.max("__seed").alias("__ps"),
        )
    )
    merged = u.groupBy(_D, _W).agg(F.sum("cnt").cast("long").alias("cnt"))
    checked = F.when(
        F.col("__np") > 1,
        F.raise_error(
            F.lit(
                "cms_merge: sketches built with different"
                " depth/width/seed cannot be merged"
            )
        ),
    ).otherwise(F.col("cnt"))
    return merged.crossJoin(F.broadcast(pgate)).select(
        _D,
        _W,
        checked.cast("long").alias("cnt"),
        F.col("__pd").alias("__depth"),
        F.col("__pw").alias("__width"),
        F.col("__ps").alias("__seed"),
    )


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
    its = [_checked_item(c, "cms_lookup") for c in cols]
    probes = items.select(*cols).distinct()
    sketch = sketch.localCheckpoint(
        eager=False
    )  # referenced by the param gate AND the probe join
    # scalar gate: the lookup's parameters must match the sketch's —
    # probing a width-2048 sketch with width-256 hashes would miss
    # cells and return underestimates the guarantee forbids. Empty
    # sketch (nothing seen yet) passes: every estimate is honestly 0.
    gate = sketch.agg(
        F.count("*").alias("__nc"),
        F.min("__depth").alias("__d0"),
        F.max("__depth").alias("__d1"),
        F.min("__width").alias("__w0"),
        F.max("__width").alias("__w1"),
        F.min("__seed").alias("__s0"),
        F.max("__seed").alias("__s1"),
    )
    bad = (F.col("__nc") > 0) & (
        (F.col("__d0") != int(depth))
        | (F.col("__d1") != int(depth))
        | (F.col("__w0") != int(width))
        | (F.col("__w1") != int(width))
        | (F.col("__s0") != int(seed))
        | (F.col("__s1") != int(seed))
    )
    checked_w = lambda d: F.when(  # noqa: E731
        bad,
        F.raise_error(
            F.lit(
                "cms_lookup: depth/width/seed differ from the values"
                " the sketch was built with"
            )
        ),
    ).otherwise(
        F.pmod(F.xxhash64(*its, F.lit(int(seed) + d)), F.lit(width))
    )
    exploded = (
        probes.crossJoin(F.broadcast(gate))
        .select(
            *cols,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).cast("int").alias(_D),
                            checked_w(d).cast("int").alias(_W),
                        )
                        for d in range(int(depth))
                    ]
                )
            ).alias("__c"),
        )
        .select(*cols, f"__c.{_D}", f"__c.{_W}")
    )
    return (
        exploded.join(
            F.broadcast(sketch.select(_D, _W, "cnt")), [_D, _W], "left"
        )
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
