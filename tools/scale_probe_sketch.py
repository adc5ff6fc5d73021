"""Quantile-sketch scale probe: build cost vs input size, and exact
tree-merge at scale.

The sketch's 100 TB claim is (a) the build is one scan-bound pass —
per-partition partial bottom-k, so wall tracks input size ~linearly
while the OUTPUT stays fixed at k rows, and (b) sharded building is
free: the tree-merge of per-slice sketches is row-for-row IDENTICAL to
sketching the whole input directly (the semilattice property), so a
1000-executor build needs no coordination beyond a k-row fold.

Probe: lineitem sf0.1 at 1x vs 10x (each copy re-identified through the
hash via a copy index), timing the warm (second) build; then 10
per-slice sketches tree-merged and compared row-for-row against the
direct 10x sketch, and the 10x median estimate checked against the
exact full-column rank bound.

Run: python tools/scale_probe_sketch.py     (~2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.quantile_sketch import (  # noqa: E402
    merge_quantile_sketches,
    quantile_sketch,
    rank_error_bound,
    sketch_quantiles,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 4096
IDS = ["l_orderkey", "l_linenumber", "__copy"]


def replicate(li, copies: int):
    return li.withColumn("__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))))


def timed_build(df):
    for i in range(2):
        t0 = time.time()
        sk = quantile_sketch(df, "l_extendedprice", IDS, k=K)
        sk.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
    return dt, sk


def main() -> None:
    spark = get_spark("scale_probe_sketch")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    n1 = li.count()

    t1, _ = timed_build(replicate(li, 1))
    big = replicate(li, 10)
    t10, sk10 = timed_build(big)

    # sharded build: 10 per-copy sketches, tree-merged
    shards = [
        quantile_sketch(
            big.filter(F.col("__copy") == c), "l_extendedprice", IDS, k=K
        )
        for c in range(10)
    ]
    t0 = time.time()
    merged = merge_quantile_sketches(shards, k=K)
    rows_m = sorted((r["value"], r["__qs_h"]) for r in merged.collect())
    t_merge = time.time() - t0
    rows_d = sorted((r["value"], r["__qs_h"]) for r in sk10.collect())
    identical = rows_m == rows_d

    med = sketch_quantiles(merged, [0.5]).collect()[0]["est"]
    n10 = n1 * 10
    rank = big.filter(F.col("l_extendedprice") <= med).count()
    err = abs(rank / n10 - 0.5)
    bound = rank_error_bound(K, 0.5)

    print(f"rows 1x={n1} 10x={n10} k={K}")
    print(f"build warm: 1x {t1:.2f}s, 10x {t10:.2f}s, ratio {t10 / t1:.1f}x")
    print(f"tree-merge of 10 shards: {t_merge:.2f}s, identical to direct: {identical}")
    print(f"10x median rank error {err:.4f} (5-sigma bound {bound:.4f}): "
          f"{'ok' if err <= bound else 'FAIL'}")
    if not identical or err > bound:
        sys.exit(1)


if __name__ == "__main__":
    main()
