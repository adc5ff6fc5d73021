"""Scale probe for the r12-prep rank statistics (kendall_tau,
pettitt_test, spearman_rho) before registration (the house rule).

Claim under test: all three run on the per-(key, day) aggregate —
tau's pairwise join is calendar-bounded per key, Pettitt/Spearman are
window passes over O(days) rows per key — so 10× the KEYS (same
per-key series length) should ride the 32 slots at ~1× wall.

Run: python tools/scale_probe_rankcorr.py     (~2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.stats import (  # noqa: E402
    kendall_tau,
    pettitt_test,
    spearman_rho,
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
    spark = get_spark("scale_probe_rankcorr")
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")

    def daily(copies: int):
        d = e.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        return (
            d.groupBy(
                F.concat_ws("#", "event_type", F.col("__copy")).alias("g"),
                F.to_date("ts").alias("d"),
            )
            .agg(
                (
                    F.sum(F.round(F.col("value") * 100).cast("long"))
                    + F.first("__copy")
                )
                .cast("long")
                .alias("x"),
                (F.count("*") + F.first("__copy")).cast("long").alias("y"),
            )
        )

    one = daily(1).localCheckpoint()
    ten = daily(10).localCheckpoint()
    print(f"rows: 1x={one.count()} (5 keys), 10x={ten.count()} (50 keys)")

    probes = [
        (
            "kendall_tau grouped",
            lambda df: kendall_tau(df, "d", "x", "y", group_cols=["g"]),
        ),
        (
            "pettitt_test grouped",
            lambda df: pettitt_test(df, "d", "x", group_cols=["g"]),
        ),
        (
            "spearman_rho grouped",
            lambda df: spearman_rho(df, "d", "x", "y", group_cols=["g"]),
        ),
    ]
    for name, fn in probes:
        t1 = timed(lambda: noop(fn(one)))
        t10 = timed(lambda: noop(fn(ten)))
        print(
            f"{name}: 1x {t1:.2f}s, 10x keys {t10:.2f}s,"
            f" ratio {t10 / t1:.1f}x"
        )

    # copy-0 differential: each copy-0 group must equal the 1x run
    for name, fn in probes:
        got = {tuple(r) for r in fn(ten.filter(F.col("g").endswith("#0"))).collect()}
        want = {tuple(r) for r in fn(one).collect()}
        assert got == want, f"{name}: copy-0 groups diverged from 1x"
    print("copy-0 differentials: identical")


def probe_twosample() -> None:
    """10x probe for the two-sample tests (MWU/KS run on the distinct-
    value aggregate — the raw-row side scales, the ranked side is
    O(distinct values) per key)."""
    from bangumi_notion_data_integration_project_spark.operators.twosample import (
        ks_two_sample,
        mann_whitney_u,
    )

    spark = get_spark("scale_probe_twosample")
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")

    def raw(copies: int):
        d = e.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        return d.select(
            F.concat_ws("#", "event_type", F.col("__copy")).alias("g"),
            F.round(F.col("value") * 100).cast("long").alias("x"),
            (F.dayofmonth("ts") % 2).alias("__half"),
        )

    def split(df):
        return (
            df.filter(F.col("__half") == 0).select("g", "x"),
            df.filter(F.col("__half") == 1).select("g", "x"),
        )

    one, ten = raw(1).localCheckpoint(), raw(10).localCheckpoint()
    for name, fn in (
        ("mann_whitney_u grouped", mann_whitney_u),
        ("ks_two_sample grouped", ks_two_sample),
    ):
        r1, c1 = split(one)
        r10, c10 = split(ten)
        t1 = timed(
            lambda: fn(r1, c1, "x", group_cols=["g"]).write.mode(
                "overwrite"
            ).format("noop").save()
        )
        t10 = timed(
            lambda: fn(r10, c10, "x", group_cols=["g"]).write.mode(
                "overwrite"
            ).format("noop").save()
        )
        print(
            f"{name}: 1x {t1:.2f}s, 10x keys*rows {t10:.2f}s,"
            f" ratio {t10 / t1:.1f}x"
        )


if __name__ == "__main__":
    if "--twosample" in sys.argv:
        probe_twosample()
    else:
        main()
