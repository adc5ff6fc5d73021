"""PSI drift monitor (operators/drift.py): edges against a Python
order-statistic reference, PSI against a Python replay, identical
distributions score ~0, a shifted distribution scores high, and the
sketch-fed edges path."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.drift import (
    psi,
    psi_buckets,
)


def _df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "x long")


def _py_edges(vals, k):
    s = sorted(vals)
    n = len(s)
    return {i: s[math.ceil(i * n / k) - 1] for i in range(1, k)}


def _py_psi(ref, cur, edges, k):
    def shares(vals):
        counts = [0] * k
        for v in vals:
            b = sum(1 for e in edges.values() if v > e)
            counts[b] += 1
        n = len(vals)
        return [(c + 1) / (n + k) for c in counts], counts

    q, cr = shares(ref)
    p, cc = shares(cur)
    terms = [(p[i] - q[i]) * math.log(p[i] / q[i]) for i in range(k)]
    # mirror the operator: per-term nano-int rounding, then the sum
    nano = [
        int(math.copysign(math.floor(abs(t * 1e9) + 0.5), t)) for t in terms
    ]
    return sum(nano) / 1e9, cr, cc


def test_edges_match_order_statistics(spark):
    rng = random.Random(5)
    vals = [rng.randrange(0, 10_000) for _ in range(999)]
    got = {
        r["bucket"]: r["edge"]
        for r in psi_buckets(_df(spark, vals), "x", n_buckets=10).collect()
    }
    assert got == _py_edges(vals, 10)


def test_psi_matches_python_replay(spark):
    rng = random.Random(7)
    ref = [rng.randrange(0, 1000) for _ in range(800)]
    cur = [rng.randrange(200, 1400) for _ in range(700)]  # shifted
    k = 10
    rows = psi(_df(spark, ref), _df(spark, cur), "x", n_buckets=k).collect()
    assert [r["bucket"] for r in rows] == list(range(1, k + 1))
    edges = _py_edges(ref, k)
    want_psi, want_cr, want_cc = _py_psi(ref, cur, edges, k)
    assert [r["n_ref"] for r in rows] == want_cr
    assert [r["n_cur"] for r in rows] == want_cc
    assert all(r["psi"] == round(want_psi, 6) for r in rows)
    # edge column carries the reference cut points (last bucket open)
    assert {r["bucket"]: r["edge"] for r in rows if r["edge"] is not None} == edges
    # a clear shift scores in the "drifted" regime
    assert rows[0]["psi"] > 0.25


def test_identical_distribution_scores_near_zero(spark):
    rng = random.Random(11)
    vals = [rng.randrange(0, 1000) for _ in range(2000)]
    rows = psi(
        _df(spark, vals[:1000]), _df(spark, vals[1000:]), "x", n_buckets=10
    ).collect()
    assert abs(rows[0]["psi"]) < 0.05


def test_sketch_fed_edges_path(spark):
    """The 100 TB path: feed psi() edges estimated from the mergeable
    quantile sketch instead of the exact order-statistic build — the
    verdict must land in the same regime as the exact edges."""
    from bangumi_notion_data_integration_project_spark.operators.quantile_sketch import (
        quantile_sketch,
        sketch_quantiles,
    )

    rng = random.Random(13)
    ref = [rng.randrange(0, 100_000) for _ in range(5000)]
    cur = [v + 30_000 for v in ref]
    rdf = _df(spark, ref).withColumn("rid", F.monotonically_increasing_id())
    sk = quantile_sketch(rdf, "x", ["rid"], k=1024)
    k = 10
    edges = sketch_quantiles(sk, [i / k for i in range(1, k)]).select(
        F.round(F.col("prob") * k).cast("int").alias("bucket"),
        F.col("est").alias("edge"),
    )
    approx = psi(
        rdf.select("x"), _df(spark, cur), "x", n_buckets=k, edges=edges
    ).collect()
    exact = psi(rdf.select("x"), _df(spark, cur), "x", n_buckets=k).collect()
    assert approx[0]["psi"] > 0.25 and exact[0]["psi"] > 0.25
    assert abs(approx[0]["psi"] - exact[0]["psi"]) / exact[0]["psi"] < 0.2


def test_parameter_validation(spark):
    import pytest

    d = _df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="n_buckets"):
        psi_buckets(d, "x", n_buckets=1)
