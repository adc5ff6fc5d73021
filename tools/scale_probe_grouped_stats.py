"""Scale probe for the grouped stats operators before registration
(the house rule — probe BEFORE the registry entry exists):
``stats.segmented_trend_grouped`` and ``stats.holt_linear_grouped``.

Claim under test: the grouped variants add per-KEY windows/folds over
per-period aggregates, so 10× the number of groups (same per-group
series length) should cost ~1× wall — the groups process in parallel
across the 32 slots and each task still holds one calendar-bounded
series. A ratio well above ~2 would mean per-group work is serializing
somewhere (single-partition window, driver loop).

Probe shape: the per-(event_type, day) value-cents aggregate at 1×
(5 keys) vs 10× (50 keys — each type replicated under a copy suffix,
values shifted by the copy index so the series differ).

Run: python tools/scale_probe_grouped_stats.py     (~2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.stats import (  # noqa: E402
    holt_linear_grouped,
    mann_kendall,
    segmented_trend_grouped,
    sen_slope,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn):
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
    return dt


def main() -> None:
    spark = get_spark("scale_probe_grouped_stats")
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
                .alias("x")
            )
        )

    one = daily(1).localCheckpoint()
    ten = daily(10).localCheckpoint()
    n1, n10 = one.count(), ten.count()

    def run_seg(df):
        segmented_trend_grouped(df, ["g"], "d", "x", min_seg=3).write.mode(
            "overwrite"
        ).format("noop").save()

    def run_holt(df):
        holt_linear_grouped(df, ["g"], "d", "x").write.mode(
            "overwrite"
        ).format("noop").save()

    s1 = timed(lambda: run_seg(one))
    s10 = timed(lambda: run_seg(ten))
    h1 = timed(lambda: run_holt(one))
    h10 = timed(lambda: run_holt(ten))

    print(f"rows: 1x={n1} (5 keys), 10x={n10} (50 keys)")
    print(
        f"segmented_trend_grouped: 1x {s1:.2f}s, 10x {s10:.2f}s,"
        f" ratio {s10 / s1:.1f}x"
    )
    print(
        f"holt_linear_grouped:     1x {h1:.2f}s, 10x {h10:.2f}s,"
        f" ratio {h10 / h1:.1f}x"
    )

    # trend tests (r11 prep): the pairwise joins run on the calendar-
    # bounded per-key aggregate — 10x keys should ride the slots too
    def run_mk(df):
        mann_kendall(df, "d", "x", group_cols=["g"]).write.mode(
            "overwrite"
        ).format("noop").save()

    def run_sen(df):
        sen_slope(df, "d", "x", group_cols=["g"]).write.mode(
            "overwrite"
        ).format("noop").save()

    m1 = timed(lambda: run_mk(one))
    m10 = timed(lambda: run_mk(ten))
    t1 = timed(lambda: run_sen(one))
    t10 = timed(lambda: run_sen(ten))
    print(
        f"mann_kendall grouped:    1x {m1:.2f}s, 10x {m10:.2f}s,"
        f" ratio {m10 / m1:.1f}x"
    )
    print(
        f"sen_slope grouped:       1x {t1:.2f}s, 10x {t10:.2f}s,"
        f" ratio {t10 / t1:.1f}x"
    )

    # grouped PSI (r11 prep): per-key edges + keyed bucketize — the
    # raw-row side is 10x here (each key gets the full row volume)
    from bangumi_notion_data_integration_project_spark.operators.drift import (
        psi_grouped,
    )

    def raw(copies: int):
        d = e.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        return d.select(
            F.concat_ws("#", "event_type", F.col("__copy")).alias("g"),
            F.round(F.col("value") * 100).cast("long").alias("x"),
            (F.dayofmonth("ts") % 2).alias("__half"),
        )

    def run_psi(df):
        psi_grouped(
            df.filter(F.col("__half") == 0),
            df.filter(F.col("__half") == 1),
            "x",
            ["g"],
            n_buckets=10,
        ).write.mode("overwrite").format("noop").save()

    p1 = timed(lambda: run_psi(raw(1)))
    p10 = timed(lambda: run_psi(raw(10)))
    print(
        f"psi_grouped:             1x {p1:.2f}s, 10x {p10:.2f}s,"
        f" ratio {p10 / p1:.1f}x"
    )

    # correctness under grouping: each copy-0 group must equal the 1x run
    got = {
        tuple(r)
        for r in segmented_trend_grouped(
            ten.filter(F.col("g").endswith("#0")), ["g"], "d", "x", min_seg=3
        ).collect()
    }
    want = {
        tuple(r)
        for r in segmented_trend_grouped(
            one, ["g"], "d", "x", min_seg=3
        ).collect()
    }
    assert got == want, "copy-0 groups diverged from the 1x run"
    print("copy-0 differential: identical")


if __name__ == "__main__":
    main()
