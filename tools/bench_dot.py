"""Benchmark pair dot-product variants at realistic embedding dims.

The similarity verify stage evaluates one dot product per candidate
PAIR (operators/similarity.py). Three candidate implementations:

- hof:     zip_with + aggregate (current default) — stays JVM-side but
           interpreted: higher-order lambdas never enter whole-stage
           codegen, so cost is ~2*dim interpreted evaluations per pair.
- arrow:   pandas_udf batch dot — Arrow-serializes both vectors per
           pair to Python, then one vectorized einsum per batch.
- explode: pre-exploded (id, idx, val) equi-join + SUM — pure codegen
           aggregates, but the pair list fans out ×dim through a join.

Usage: python tools/bench_dot.py [--dims 64,768,1024] [--pairs 200000]
Prints one JSON line per (dim, variant) with wall seconds.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, functions as F

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402
from bangumi_notion_data_integration_project_spark.functions import vectors  # noqa: E402


def make_corpus(spark, n: int, dim: int) -> DataFrame:
    """n deterministic pseudo-random dim-dim vectors, fully JVM-side."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dim}), "
            f"i -> cast(sin(id * 1009 + i * 31) as double))"
        ).alias("embedding"),
    )


def make_pairs(spark, n_corpus: int, n_pairs: int) -> DataFrame:
    return spark.range(n_pairs).select(
        F.pmod(F.col("id") * 7 + 1, F.lit(n_corpus)).alias("id_a"),
        F.pmod(F.col("id") * 31 + 13, F.lit(n_corpus)).alias("id_b"),
    )


def paired(corpus: DataFrame, pairs: DataFrame) -> DataFrame:
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    return pairs.join(a, "id_a").join(b, "id_b")


def run_hof(corpus, pairs):
    p = paired(corpus, pairs)
    return p.agg(F.sum(vectors.dot_product("__va", "__vb"))).first()[0]


def run_arrow(corpus, pairs):
    p = paired(corpus, pairs)
    return p.agg(F.sum(vectors.dot_product_arrow("__va", "__vb"))).first()[0]


def run_explode(corpus, pairs):
    e = corpus.select(
        "vec_id", F.posexplode("embedding").alias("__i", "__x")
    )
    a = e.select(F.col("vec_id").alias("id_a"), "__i", F.col("__x").alias("__xa"))
    b = e.select(F.col("vec_id").alias("id_b"), "__i", F.col("__x").alias("__xb"))
    dots = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "__i"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__xa") * F.col("__xb")).alias("dot"))
    )
    return dots.agg(F.sum("dot")).first()[0]


VARIANTS = {"hof": run_hof, "arrow": run_arrow, "explode": run_explode}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="64,768,1024")
    ap.add_argument("--pairs", type=int, default=200_000)
    ap.add_argument("--corpus", type=int, default=20_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("bench-dot")
    for dim in [int(d) for d in args.dims.split(",")]:
        corpus = make_corpus(spark, args.corpus, dim).localCheckpoint(eager=True)
        pairs = make_pairs(spark, args.corpus, args.pairs).localCheckpoint(eager=True)
        checks = {}
        for name, fn in VARIANTS.items():
            fn(corpus, pairs.limit(1000))  # warm the path untimed
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.monotonic()
                checks[name] = fn(corpus, pairs)
                best = min(best, time.monotonic() - t0)
            print(
                json.dumps(
                    {
                        "dim": dim,
                        "variant": name,
                        "sec": round(best, 3),
                        "pairs": args.pairs,
                        "checksum": round(checks[name], 6),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
