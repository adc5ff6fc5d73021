"""Count-min sketch scale probe (pre-registration, the house rule).

Claims: (a) the build is one map-side-combinable groupBy whose shuffle
carries ≤ depth·width rows per partition — wall tracks the scan, not
the distinct-item count; (b) disjoint shards merge to exactly the
direct build (monoid — the coordination-free 1000-executor path);
(c) the lookup serving path touches only the ≤ depth·width-row sketch.

Run: python tools/scale_probe_cms.py     (~2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.cms import (  # noqa: E402
    cms_build,
    cms_error_bound,
    cms_lookup,
    cms_merge,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEPTH, WIDTH = 4, 2048


def timed(fn):
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
    return dt


def main() -> None:
    spark = get_spark("scale_probe_cms")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_partkey")

    def rep(copies):
        return li.withColumn(
            "__c", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        ).select("l_partkey")

    def build(df):
        cms_build(df, ["l_partkey"], depth=DEPTH, width=WIDTH).write.mode(
            "overwrite"
        ).format("noop").save()

    one, ten = rep(1), rep(10)
    t1 = timed(lambda: build(one))
    t10 = timed(lambda: build(ten))
    print(f"cms build: 1x {t1:.2f}s, 10x {t10:.2f}s, ratio {t10 / t1:.1f}x")

    # disjoint-shard monoid identity at 10x
    shards = [
        cms_build(
            ten.withColumn("__s", F.pmod(F.xxhash64("l_partkey", F.lit(7)), F.lit(4)))
            .filter(F.col("__s") == s)
            .drop("__s"),
            ["l_partkey"],
            depth=DEPTH,
            width=WIDTH,
        )
        for s in range(4)
    ]
    direct = {
        (r["__d"], r["__w"]): r["cnt"]
        for r in cms_build(ten, ["l_partkey"], depth=DEPTH, width=WIDTH).collect()
    }
    merged = {
        (r["__d"], r["__w"]): r["cnt"]
        for r in cms_merge(shards).collect()
    }
    print(f"sharded merge == direct: {merged == direct}")

    # serving path: estimates for the 50 heaviest parts vs exact
    sk = cms_build(li, ["l_partkey"], depth=DEPTH, width=WIDTH).localCheckpoint()
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "l_partkey")
        .limit(50)
        .localCheckpoint()
    )
    n_total = li.count()
    t0 = time.time()
    est = {
        r["l_partkey"]: r["est"]
        for r in cms_lookup(
            sk, exact.select("l_partkey"), ["l_partkey"], depth=DEPTH, width=WIDTH
        ).collect()
    }
    t_lookup = time.time() - t0
    bound = cms_error_bound(WIDTH, n_total)
    worst = 0
    under = False
    for r in exact.collect():
        e = est[r["l_partkey"]]
        under |= e < r["true_cnt"]
        worst = max(worst, e - r["true_cnt"])
    print(
        f"lookup (50 items from the stored sketch): {t_lookup:.2f}s;"
        f" never-underestimate holds: {not under};"
        f" worst overestimate {worst} vs bound {bound} (N={n_total})"
    )


if __name__ == "__main__":
    main()
