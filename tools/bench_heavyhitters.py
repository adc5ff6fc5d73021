"""Measure two-pass Misra-Gries vs the naive full groupBy at high
cardinality — the scale claim behind operators/heavyhitters.py.

The synthetic column is zipf-ish: K hot values cover ~30% of rows, the
rest is a uniform long tail of D distinct values. The naive plan
shuffles ~D combined rows; MG shuffles only the ≤capacity·partitions
candidates. Prints wall times and the exchanged-row proxy (distinct
values vs candidate count).

Usage: python tools/bench_heavyhitters.py [--rows 20000000] [--tail 5000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.heavyhitters import (  # noqa: E402
    frequent_items,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--tail", type=int, default=5_000_000)
    ap.add_argument("--hot", type=int, default=20)
    ap.add_argument("--threshold", type=float, default=0.005)
    args = ap.parse_args()

    spark = get_spark("bench-hh")
    n_hot_rows = args.rows * 3 // 10
    base = spark.range(args.rows).select(
        F.when(
            F.col("id") < n_hot_rows, F.concat(F.lit("hot"), F.col("id") % args.hot)
        )
        .otherwise(F.concat(F.lit("t"), F.xxhash64("id") % args.tail))
        .alias("token")
    )
    base.write.mode("overwrite").parquet("/tmp/hh_bench")
    df = spark.read.parquet("/tmp/hh_bench")

    def naive():
        total = df.count()
        return (
            df.groupBy("token")
            .agg(F.count("*").alias("n_occurrences"))
            .filter(F.col("n_occurrences") > args.threshold * total)
        )

    for label, build in (("naive groupBy", naive), (
        "misra-gries 2-pass",
        lambda: frequent_items(df, "token", threshold=args.threshold),
    )):
        build().write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        out = build()
        out.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s ({out.count()} frequent items)")

    print(f"distinct values (naive shuffle key count): {df.select('token').distinct().count()}")


if __name__ == "__main__":
    main()
