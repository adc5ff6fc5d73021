"""Scale probe for wasserstein_1 / cramer_von_mises / mood_median_test
BEFORE their r13 registry entries carry driver weight (the house
rule). All three ride the _sided_counts distinct-value contract the
MWU/KS probes verified; this measures the actual new code paths at
10x rows (fixed distinct values) and 10x keys.

Run: python tools/scale_probe_driftmetrics.py     (~3 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.twosample import (  # noqa: E402
    cramer_von_mises,
    kruskal_wallis,
    mood_median_test,
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


def main() -> None:
    spark = get_spark("scale_probe_driftmetrics")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    # warm the whole-stage classes for all three operators first — the
    # first-ever run pays codegen for the new operator family and
    # would be charged to whichever axis runs first
    ref0 = o.filter(F.col("o_orderdate") < "1998-01-01").select("x")
    cur0 = o.filter(F.col("o_orderdate") >= "1998-01-01").select("x")
    for fn in (wasserstein_1, cramer_von_mises, mood_median_test):
        noop(fn(ref0, cur0, "x"))

    # row axis: replicate rows, distinct values fixed
    for k, tag in ((1, "1x"), (10, "10x rows")):
        big = o.withColumn(
            "__r", F.explode(F.sequence(F.lit(1), F.lit(k)))
        ).drop("__r").localCheckpoint(eager=True)
        ref = big.filter(F.col("o_orderdate") < "1998-01-01").select("x")
        cur = big.filter(F.col("o_orderdate") >= "1998-01-01").select("x")
        t_w = timed(lambda: noop(wasserstein_1(ref, cur, "x")))
        t_c = timed(lambda: noop(cramer_von_mises(ref, cur, "x")))
        t_m = timed(lambda: noop(mood_median_test(ref, cur, "x")))
        print(f"orders era-split {tag}: w1={t_w:.2f}s cvm={t_c:.2f}s mood={t_m:.2f}s")
        big.unpersist()

    # key axis: 5 -> 50 keys, each key carrying the full event volume
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    for k, tag in ((1, "5 keys"), (10, "50 keys (10x rows too)")):
        big = e.withColumn(
            "__r", F.explode(F.sequence(F.lit(1), F.lit(k)))
        ).withColumn(
            "event_type",
            F.concat_ws("_", F.col("event_type"), F.col("__r")),
        ).drop("__r").localCheckpoint(eager=True)
        ref = big.filter(F.col("ts") < "2024-01-16").select("event_type", "x")
        cur = big.filter(F.col("ts") >= "2024-01-16").select("event_type", "x")
        t_w = timed(lambda: noop(
            wasserstein_1(ref, cur, "x", group_cols=["event_type"])))
        t_c = timed(lambda: noop(
            cramer_von_mises(ref, cur, "x", group_cols=["event_type"])))
        t_m = timed(lambda: noop(
            mood_median_test(ref, cur, "x", group_cols=["event_type"])))
        t_kw = timed(lambda: noop(kruskal_wallis(big, "event_type", "x")))
        print(f"events grouped {tag}: w1={t_w:.2f}s cvm={t_c:.2f}s"
              f" mood={t_m:.2f}s kw(k-sample)={t_kw:.2f}s")
        big.unpersist()


if __name__ == "__main__":
    main()
