"""Scale probe for ols_fit2 and seasonal_mann_kendall before their
registry entries carry driver weight (the house rule — probe BEFORE
registration; MK/Sen/CMS/psi_grouped already have SCALING.md rows,
these two were the gap the r9 verdict named).

Claims under test:

- ``ols_fit2`` is ONE map-side-combinable aggregate (nine integer
  moments) + a scalar Cramer solve: 10x rows should cost ~1x wall
  beyond the scan (the shuffle carries one row per group). Grouped at
  10x keys (each key carrying the full row volume, so 10x total rows)
  should ride the slots the same way.
- ``seasonal_mann_kendall`` runs the per-season pairwise join on the
  per-(season, day) AGGREGATE: 10x FACT rows with the same calendar
  should cost ~1x (the aggregate absorbs the volume — days^2 is fixed
  at any data scale). The quadratic axis is CALENDAR LENGTH, not data
  volume: a 10x-longer synthetic calendar costs ~100x pairs by
  construction, which is the documented contract (pick the grain /
  window, not the row count) — probed once for honesty, not as a
  regression gate.

Run: python tools/scale_probe_ols2_seasonal.py     (~3 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.stats import (  # noqa: E402
    ols_fit2,
    seasonal_mann_kendall,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn):
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
    return dt


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark("scale_probe_ols2_seasonal")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("disc_bp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        (F.col("l_partkey") % 5).alias("g0"),
    )

    def rows(copies: int):
        return li.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )

    one, ten = rows(1).localCheckpoint(), rows(10).localCheckpoint()
    n1, n10 = one.count(), ten.count()
    print(f"lineitem rows: 1x={n1}, 10x={n10}")

    o1 = timed(lambda: noop(ols_fit2(one, "q", "disc_bp", "cents")))
    o10 = timed(lambda: noop(ols_fit2(ten, "q", "disc_bp", "cents")))
    print(
        f"ols_fit2 global:   1x {o1:.2f}s, 10x rows {o10:.2f}s,"
        f" ratio {o10 / o1:.1f}x"
    )

    def keyed(df):
        return df.withColumn(
            "g", F.concat_ws("#", "g0", F.col("__copy"))
        )

    g1 = timed(
        lambda: noop(
            ols_fit2(keyed(one), "q", "disc_bp", "cents", group_cols=["g"])
        )
    )
    g10 = timed(
        lambda: noop(
            ols_fit2(keyed(ten), "q", "disc_bp", "cents", group_cols=["g"])
        )
    )
    print(
        f"ols_fit2 grouped:  1x {g1:.2f}s (5 keys), 10x keys*rows"
        f" {g10:.2f}s (50 keys), ratio {g10 / g1:.1f}x"
    )

    # seasonal MK: 10x FACT rows, same calendar -> the per-(dow, day)
    # aggregate is identical in size, so the pairwise stage is fixed
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )

    def daily(copies: int):
        d = o.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        agg = d.groupBy("d").agg(F.sum("c").cast("long").alias("x"))
        return agg.withColumn(
            "dow",
            (F.datediff("d", F.lit("1970-01-05").cast("date")) % 7).cast(
                "long"
            ),
        )

    d1, d10 = daily(1).localCheckpoint(), daily(10).localCheckpoint()
    s1 = timed(lambda: noop(seasonal_mann_kendall(d1, "d", "x", "dow")))
    s10 = timed(lambda: noop(seasonal_mann_kendall(d10, "d", "x", "dow")))
    print(
        f"seasonal_mk:       1x {s1:.2f}s, 10x fact rows {s10:.2f}s,"
        f" ratio {s10 / s1:.1f}x (same calendar -> same pair count)"
    )

    # the honest quadratic axis: 10x CALENDAR (synthetic day offsets)
    # -> ~100x pairs per season. Documented contract, not a gate.
    longcal = (
        d1.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(9)))
        )
        .select(
            F.date_add(F.col("d"), F.col("__copy") * 3000).alias("d"),
            (F.col("x") + F.col("__copy")).alias("x"),
        )
        .withColumn(
            "dow",
            (F.datediff("d", F.lit("1970-01-05").cast("date")) % 7).cast(
                "long"
            ),
        )
        .localCheckpoint()
    )
    c10 = timed(lambda: noop(seasonal_mann_kendall(longcal, "d", "x", "dow")))
    print(
        f"seasonal_mk:       10x CALENDAR {c10:.2f}s,"
        f" ratio {c10 / s1:.1f}x (days^2 axis — pick the grain)"
    )

    # differential: the 10x-fact run must produce the identical row
    # (the aggregate is 10x the cents but same shape) — recompute 1x
    # from the copy-scaled frame scaled back is not meaningful, so
    # instead assert the 1x result is stable across the two invocations
    a = seasonal_mann_kendall(d1, "d", "x", "dow").collect()
    b = seasonal_mann_kendall(d1, "d", "x", "dow").collect()
    assert a == b, "seasonal MK not deterministic across invocations"
    print("1x determinism differential: identical")


if __name__ == "__main__":
    main()
