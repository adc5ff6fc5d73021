"""Scale probes for the round-8-prep operators: KMV set sketch and
TextRank (pre-registration evidence, the house rule — probe BEFORE the
registry entry exists).

Set sketch claim: the only data-scale stage is the map-side-combinable
distinct on (key, hash); state and every estimate are k rows. Probe:
build over lineitem ids at 1x and 10x (copies re-identified through
the hash via a copy index), check the sharded tree-merge is row-for-row
identical to the direct build, and the distinct estimate sits within
the 5-sigma KMV bound.

TextRank claim: the window pairing is per-document lead() windows and
each iteration is a node-sized join + an aggregate — wall should track
the token volume ~linearly with the iteration count fixed. Probe:
keywords over documents at 1x and 10x (bodies repeat, so the graph
keeps its node set and the weights scale — the token-scale stages do
10x the work while the per-iteration node-sized work is constant).

Run: python tools/scale_probe_setsketch.py     (~3 min)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.setsketch import (  # noqa: E402
    merge_set_sketches,
    set_sketch,
    set_sketch_distinct,
)
from bangumi_notion_data_integration_project_spark.operators.textrank import (  # noqa: E402
    textrank_keywords,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 4096


def replicate(df, copies: int):
    return df.withColumn(
        "__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    )


def timed(fn):
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
    return dt


def main() -> None:
    spark = get_spark("scale_probe_setsketch")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    ids = ["l_orderkey", "l_linenumber", "__copy"]

    def build(df):
        set_sketch(df, [], ids, k=K).write.mode("overwrite").format(
            "noop"
        ).save()

    one = replicate(li, 1)
    ten = replicate(li, 10)
    t1 = timed(lambda: build(one))
    t10 = timed(lambda: build(ten))

    # sharded semilattice identity at 10x
    shards = [
        set_sketch(ten.filter(F.col("__copy") == c), [], ids, k=K)
        for c in range(10)
    ]
    merged = merge_set_sketches(shards, [], k=K)
    rows_m = sorted(r["__ss_h"] for r in merged.collect())
    direct = set_sketch(ten, [], ids, k=K)
    rows_d = sorted(r["__ss_h"] for r in direct.collect())
    identical = rows_m == rows_d

    # ground truth is the DISTINCT id count — synthetic lineitem has
    # duplicate (orderkey, linenumber) pairs, so row count overstates it
    n10 = li.distinct().count() * 10
    [est] = set_sketch_distinct(direct, [], k=K).collect()
    rel = abs(est["distinct_est"] - n10) / n10
    bound = 5.0 / math.sqrt(K - 2)

    print(f"setsketch build warm: 1x {t1:.2f}s, 10x {t10:.2f}s, ratio {t10 / t1:.1f}x")
    print(f"sharded tree-merge identical to direct: {identical}")
    print(f"10x distinct est rel err {rel:.4f} (5-sigma bound {bound:.4f}):"
          f" {'ok' if rel <= bound else 'FAIL'}")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    def rank(df):
        textrank_keywords(
            df, "doc_id", "text", window=2, iterations=6, top_k=25
        ).write.mode("overwrite").format("noop").save()

    d1 = replicate(docs, 1)
    d10 = replicate(docs, 10)
    r1 = timed(lambda: rank(d1))
    r10 = timed(lambda: rank(d10))
    print(f"textrank warm: 1x {r1:.2f}s, 10x {r10:.2f}s, ratio {r10 / r1:.1f}x")

    # Hampel: per-key rolling median over per-key daily aggregates —
    # 10x the KEYS (the scale axis for grouped windows)
    from bangumi_notion_data_integration_project_spark.operators.robust import (
        hampel_outliers,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_totalprice"
    )

    def daily(df):
        return df.groupBy("g", "d").agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )

    def hamp(df):
        hampel_outliers(
            daily(df), "d", "x", group_cols=["g"], half_window=3
        ).write.mode("overwrite").format("noop").save()

    g1 = orders.withColumn("g", F.col("o_custkey") % 500)
    g10 = orders.withColumn("g", F.col("o_custkey") % 5000)
    h1 = timed(lambda: hamp(g1))
    h10 = timed(lambda: hamp(g10))
    print(f"hampel warm (10x keys): 1x {h1:.2f}s, 10x {h10:.2f}s,"
          f" ratio {h10 / h1:.1f}x")

    # PSI: 10x the ROWS through the exact-edge path
    from bangumi_notion_data_integration_project_spark.operators.drift import psi

    cents = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x")
    )

    def run_psi(df):
        psi(df, df.select((F.col("x") + 5000).alias("x")), "x").write.mode(
            "overwrite"
        ).format("noop").save()

    p1 = timed(lambda: run_psi(replicate(cents, 1).drop("__copy")))
    p10 = timed(lambda: run_psi(replicate(cents, 10).drop("__copy")))
    print(f"psi warm: 1x {p1:.2f}s, 10x {p10:.2f}s, ratio {p10 / p1:.1f}x")

    if not identical or rel > bound:
        sys.exit(1)


if __name__ == "__main__":
    main()
