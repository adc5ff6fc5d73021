"""Scale probe for the REGISTRY shapes of the r12 two-sample queries
(the r10 verdict's gap: MWU/KS were probed grouped at 10x keys, but
the era-split registry shapes — orders-table filters feeding the
global test, and the grouped event half-month variant — had no
SCALING.md rows of their own).

Claims under test:

- ``orders_price_mwu`` / ``orders_price_ks`` (global, era split on
  o_orderdate): 10x FACT rows with the same price distribution should
  cost ~scan-only — the raw rows reduce map-side into the
  (value, side) count before the single unpartitioned window, so the
  windowed frame is O(distinct prices) at any volume (the psi edges
  argument, here verified on the exact registry input shape including
  the era filters).
- ``events_type_mwu`` / ``events_type_ks`` (grouped, half-month
  split): same contract per key — 10x rows, fixed distinct values,
  ~scan-bounded growth.

Run: python tools/scale_probe_registry_twosample.py     (~3 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.twosample import (  # noqa: E402
    ks_two_sample,
    mann_whitney_u,
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
    spark = get_spark("scale_probe_registry_twosample")

    def replicate(df, k):
        # k row-copies with the SAME value distribution: distinct
        # values fixed, raw volume k-fold (the row-axis probe shape)
        return df.withColumn(
            "__r", F.explode(F.sequence(F.lit(1), F.lit(k)))
        ).drop("__r")

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    for k, tag in ((1, "1x"), (10, "10x rows")):
        big = replicate(o, k).localCheckpoint(eager=True)
        ref = big.filter(F.col("o_orderdate") < "1998-01-01").select("x")
        cur = big.filter(F.col("o_orderdate") >= "1998-01-01").select("x")
        t_m = timed(lambda: noop(mann_whitney_u(ref, cur, "x")))
        t_k = timed(lambda: noop(ks_two_sample(ref, cur, "x")))
        n = big.count()
        print(f"orders era-split {tag}: rows={n} mwu={t_m:.2f}s ks={t_k:.2f}s")
        big.unpersist()

    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    for k, tag in ((1, "1x"), (10, "10x rows")):
        big = replicate(e, k).localCheckpoint(eager=True)
        ref = big.filter(F.col("ts") < "2024-01-16").select("event_type", "x")
        cur = big.filter(F.col("ts") >= "2024-01-16").select("event_type", "x")
        t_m = timed(
            lambda: noop(
                mann_whitney_u(ref, cur, "x", group_cols=["event_type"])
            )
        )
        t_k = timed(
            lambda: noop(
                ks_two_sample(ref, cur, "x", group_cols=["event_type"])
            )
        )
        n = big.count()
        print(f"events grouped {tag}: rows={n} mwu={t_m:.2f}s ks={t_k:.2f}s")
        big.unpersist()


if __name__ == "__main__":
    main()
