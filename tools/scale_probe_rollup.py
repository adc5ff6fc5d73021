"""Continuous-aggregate refresh probe: fold cost vs stored history.

The rollup story's 100 TB claim is that a late-data refresh costs
O(touched buckets) — independent of how much HISTORY the stored
rollup holds. This probe pins that with a measurement: the SAME
3-day late delta folds into a stored (grain, __year)-partitioned
rollup covering 1× vs 10× the calendar (2 vs 20 years of daily
partials), through BOTH merge paths:

- hive:      rollup_refresh_delta + merge_into_partitioned
             (dynamic partition overwrite)
- manifest:  rollup_refresh_delta + merge_into_manifest
             (atomic manifest-rename commit)

A flat ratio (~1×) means the fold reads only the touched years'
partitions and rewrites only the touched (grain, year) dirs; a ratio
tracking the 10× history growth would mean the plan secretly scans or
rewrites history. Timed warm (second run of each).

Run: python tools/scale_probe_rollup.py     (~2 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.manifest_table import (  # noqa: E402
    ManifestTable,
    merge_into_manifest,
)
from bangumi_notion_data_integration_project_spark.operators.merge import (  # noqa: E402
    merge_into_partitioned,
)
from bangumi_notion_data_integration_project_spark.operators.rollup import (  # noqa: E402
    hierarchical_time_rollup,
    rollup_refresh_delta,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

SECTION = "## Continuous-aggregate refresh vs stored history"
EVENTS_PER_DAY = 40


def _events(spark, years: int):
    """years * 365 days of synthetic daily events starting 2004."""
    n_days = years * 365
    return (
        spark.range(n_days * EVENTS_PER_DAY)
        .select(
            F.date_add(
                F.to_date(F.lit("2004-01-06")),
                (F.col("id") % n_days).cast("int"),
            )
            .cast("timestamp")
            .alias("ts"),
            (F.col("id") % 997 + 1).cast("double").alias("value"),
        )
    )


def _delta(spark):
    """3 late days, all inside one year near the end of the 1x range."""
    return (
        spark.range(3 * EVENTS_PER_DAY)
        .select(
            F.date_add(
                F.to_date(F.lit("2005-06-01")), (F.col("id") % 3).cast("int")
            )
            .cast("timestamp")
            .alias("ts"),
            (F.col("id") % 97 + 1).cast("double").alias("value"),
        )
    )


def _with_store_cols(df):
    return df.select(
        "grain",
        "bucket_start",
        "n_events",
        "value_cents",
        F.concat_ws("|", "grain", "bucket_start").alias("__k"),
        F.year("bucket_start").alias("__year"),
    )


def _build_stores(spark, root: str, years: int):
    cents = F.round(F.col("value") * 100, 0)
    base = _with_store_cols(
        hierarchical_time_rollup(_events(spark, years), "ts", cents)
    )
    hive_dir = os.path.join(root, f"hive_{years}")
    base.write.partitionBy("grain", "__year").parquet(hive_dir)
    mt_dir = os.path.join(root, f"mt_{years}")
    table = ManifestTable(mt_dir, ["grain", "__year"])
    table.commit(base)
    return hive_dir, table


def _touched_years_of(delta):
    ws = F.to_date(F.date_trunc("week", F.col("ts")))
    return {
        r[0]
        for r in delta.select(
            F.explode(F.array(F.year(ws), F.year(F.date_add(ws, 6)))).alias("y")
        )
        .distinct()
        .collect()
    }


def _fold_hive(spark, delta, hive_dir):
    cents = F.round(F.col("value") * 100, 0)
    years = list(_touched_years_of(delta))
    stored = spark.read.parquet(hive_dir).filter(F.col("__year").isin(years))
    refreshed = _with_store_cols(
        rollup_refresh_delta(stored, delta, "ts", cents)
    )
    merge_into_partitioned(
        spark, refreshed, hive_dir, "__k", ["grain", "__year"],
        delete_absent=False,
    )


def _fold_manifest(spark, delta, table):
    cents = F.round(F.col("value") * 100, 0)
    years = _touched_years_of(delta)
    stored = table.read(
        spark,
        partition_filter=lambda v: v["__year"] is not None
        and int(v["__year"]) in years,
    )
    refreshed = _with_store_cols(
        rollup_refresh_delta(stored, delta, "ts", cents)
    )
    merge_into_manifest(spark, refreshed, table, "__k")


def main() -> None:
    spark = get_spark("scale-probe-rollup")
    root = tempfile.mkdtemp(prefix="rollup_probe_")
    out = []
    try:
        for name, fold in (("hive", _fold_hive), ("manifest", _fold_manifest)):
            secs = {}
            for years in (2, 20):
                hive_dir, table = _build_stores(spark, root, years)
                target = hive_dir if name == "hive" else table
                # warm: fold twice, report the second (the first pays
                # store bootstrap page-cache + codegen)
                for i in range(2):
                    delta = _delta(spark)
                    t0 = time.monotonic()
                    fold(spark, delta, target)
                    dt = time.monotonic() - t0
                secs[years] = dt
                shutil.rmtree(os.path.join(root, f"hive_{years}"))
                shutil.rmtree(os.path.join(root, f"mt_{years}"))
            ratio = secs[20] / secs[2]
            out.append(
                f"| {name} fold (3-day delta) | {secs[2]:.2f} | "
                f"{secs[20]:.2f} | {ratio:.1f}x |"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(SECTION)
    print()
    print(
        "`python tools/scale_probe_rollup.py`: the SAME 3-day late delta\n"
        "folds into a stored rollup holding 2 vs 20 YEARS of daily\n"
        "partials (10x the history, 10x the (grain, year) partitions).\n"
        "Flat = the refresh reads only touched years and rewrites only\n"
        "touched partitions; tracking 10x would mean a hidden history\n"
        "scan. Warm (second fold)."
    )
    print()
    print("| path | 2y-history sec | 20y-history sec | ratio |")
    print("|---|---|---|---|")
    for line in out:
        print(line)


if __name__ == "__main__":
    main()
