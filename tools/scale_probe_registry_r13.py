"""Scale probe for the REGISTRY shapes of the r13 playbook queries
whose exact input shape differs from the already-probed operator
probes (tools/scale_probe_driftmetrics.py covered W1/CvM/Mood/KW on
both the row and key axes; the ungrouped orders-era shapes reuse the
orders_price_mwu scan proven flat in scale_probe_registry_twosample):

- ``events_type_w1`` (grouped, half-month split on events): 10x FACT
  rows with fixed distinct values should cost ~scan-only — raw rows
  reduce map-side into the per-(type, value, side) count before the
  type-partitioned window.
- ``segment_returns_ztest``: the lineitem⋈orders key join is the only
  data-scaled work; the per-side aggregate is map-side combinable and
  the final shuffle carries one row per segment. 10x lineitem rows
  should scale ~linearly in the scan+join, never worse.
- ``segment_trimmed_mean``: the orders⋈broadcast(customer) rollup
  collapses to segment×day before the span window — 10x fact rows,
  fixed calendar, ~scan-bounded growth.

Run: python tools/scale_probe_registry_r13.py     (~4 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.robust import (  # noqa: E402
    trimmed_mean,
)
from bangumi_notion_data_integration_project_spark.operators.twosample import (  # noqa: E402
    two_proportion_ztest,
    wasserstein_1,
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
    spark = get_spark("scale_probe_registry_r13")

    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    for k, tag in ((1, "1x"), (10, "10x rows")):
        big = replicate(e, k).localCheckpoint(eager=True)
        ref = big.filter(F.col("ts") < "2024-01-16").select("event_type", "x")
        cur = big.filter(F.col("ts") >= "2024-01-16").select(
            "event_type", "x"
        )
        t = timed(
            lambda: noop(
                wasserstein_1(ref, cur, "x", group_cols=["event_type"])
            )
        )
        print(f"events_type_w1 {tag}: rows={big.count()} t={t:.2f}s")
        big.unpersist()

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey",
        "l_shipdate",
        (F.col("l_returnflag") == "R").cast("long").alias("ret"),
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    for k, tag in ((1, "1x"), (10, "10x rows")):
        big = replicate(li, k).localCheckpoint(eager=True)
        j = (
            big.join(o, big.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select("c_mktsegment", "l_shipdate", "ret")
        )
        ref = j.filter(F.col("l_shipdate") < "1996-01-01").select(
            "c_mktsegment", "ret"
        )
        cur = j.filter(F.col("l_shipdate") >= "1996-01-01").select(
            "c_mktsegment", "ret"
        )
        t = timed(
            lambda: noop(
                two_proportion_ztest(
                    ref, cur, "ret", group_cols=["c_mktsegment"]
                )
            )
        )
        print(f"segment_returns_ztest {tag}: rows={big.count()} t={t:.2f}s")
        big.unpersist()

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    for k, tag in ((1, "1x"), (10, "10x rows")):
        big = replicate(orders, k).localCheckpoint(eager=True)
        daily = (
            big.join(F.broadcast(c), big.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment", F.to_date("o_orderdate").alias("d"))
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("x")
            )
        )
        t = timed(
            lambda: noop(
                trimmed_mean(
                    daily, "x", trim=0.1, group_cols=["c_mktsegment"]
                )
            )
        )
        print(f"segment_trimmed_mean {tag}: rows={big.count()} t={t:.2f}s")
        big.unpersist()


if __name__ == "__main__":
    main()
