"""Scale probe for the REGISTRY shapes of the r14 batch whose exact
input shape differs from the already-probed operator probes
(tools/scale_probe_registry_twosample.py + SCALING.md "r14-prep"
covered Dunn/AB/JT/chi2 on the row axis — all flat, map-side
reduction absorbs volume):

- ``events_type_pettitt`` (grouped Pettitt on the per-type DAILY
  value sum): 10x FACT rows with a fixed calendar collapse to the
  same types×days frame before every window — ~scan-bounded growth.
- ``segment_kendall`` / ``segment_spearman`` (grouped tau/rho on the
  per-segment daily volume-revenue pair): the pairwise join (tau) and
  rank windows (rho) ride the segment×day aggregate — days² pairs
  per segment FIXED at any fact volume, so 10x rows cost only the
  rollup scan.

Run: python tools/scale_probe_registry_r14.py     (~4 min)
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


def replicate(df, k):
    return df.withColumn(
        "__r", F.explode(F.sequence(F.lit(1), F.lit(k)))
    ).drop("__r")


def main() -> None:
    spark = get_spark("scale_probe_registry_r14")

    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "ts", "value"
    )
    for k, tag in ((1, "1x"), (10, "10x rows")):
        big = replicate(e, k).localCheckpoint(eager=True)
        daily = big.groupBy(
            "event_type", F.to_date("ts").alias("d")
        ).agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
        t = timed(
            lambda: noop(
                pettitt_test(daily, "d", "x", group_cols=["event_type"])
            )
        )
        print(f"events_type_pettitt {tag}: rows={big.count()} t={t:.2f}s")
        big.unpersist()

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    for k, tag in ((1, "1x"), (10, "10x rows")):
        big = replicate(orders, k).localCheckpoint(eager=True)
        daily = (
            big.join(F.broadcast(c), big.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment", F.to_date("o_orderdate").alias("d"))
            .agg(
                F.count("*").cast("long").alias("x"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("y"),
            )
        )
        t = timed(
            lambda: noop(
                kendall_tau(
                    daily.localCheckpoint(eager=False),
                    "d", "x", "y", group_cols=["c_mktsegment"],
                )
            )
        )
        print(f"segment_kendall {tag}: rows={big.count()} t={t:.2f}s")
        t = timed(
            lambda: noop(
                spearman_rho(
                    daily, "d", "x", "y", group_cols=["c_mktsegment"]
                )
            )
        )
        print(f"segment_spearman {tag}: rows={big.count()} t={t:.2f}s")
        big.unpersist()


if __name__ == "__main__":
    main()
