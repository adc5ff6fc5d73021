"""Mergeable bottom-k quantile sketch (operators/quantile_sketch.py):
determinism, exact mergeability over disjoint inputs, exactness when
the sketch holds everything, and the statistical rank-error bound on
real table data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.quantile_sketch import (
    grouped_quantile_sketch,
    merge_quantile_sketches,
    quantile_sketch,
    rank_error_bound,
    sketch_quantiles,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


def _rows(sk):
    return sorted((r["value"], r["__qs_h"]) for r in sk.collect())


def test_deterministic_across_builds(lineitem):
    a = quantile_sketch(lineitem, "l_extendedprice", ["l_orderkey", "l_linenumber"], k=256)
    b = quantile_sketch(
        lineitem.repartition(7), "l_extendedprice", ["l_orderkey", "l_linenumber"], k=256
    )
    assert _rows(a) == _rows(b)
    assert a.count() == 256


def test_merge_of_disjoint_halves_equals_whole(lineitem):
    lo = lineitem.filter(F.col("l_orderkey") % 2 == 0)
    hi = lineitem.filter(F.col("l_orderkey") % 2 == 1)
    ids = ["l_orderkey", "l_linenumber"]
    merged = merge_quantile_sketches(
        [
            quantile_sketch(lo, "l_extendedprice", ids, k=128),
            quantile_sketch(hi, "l_extendedprice", ids, k=128),
        ],
        k=128,
    )
    whole = quantile_sketch(lineitem, "l_extendedprice", ids, k=128)
    assert _rows(merged) == _rows(whole)


def test_exact_when_k_covers_input(spark):
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])], "id long, v double")
    sk = quantile_sketch(df, "v", ["id"], k=100)
    est = {r["prob"]: r["est"] for r in sketch_quantiles(sk, [0.2, 0.4, 0.6, 0.8, 1.0]).collect()}
    # m=5: ceil(q*5) picks the 1st,2nd,3rd,4th,5th order statistic
    assert est == {0.2: 1.0, 0.4: 3.0, 0.6: 5.0, 0.8: 7.0, 1.0: 9.0}


def test_rank_error_within_bound(spark, lineitem):
    k = 1024
    probs = [0.1, 0.5, 0.9]
    sk = quantile_sketch(lineitem, "l_extendedprice", ["l_orderkey", "l_linenumber"], k=k)
    est = {r["prob"]: r["est"] for r in sketch_quantiles(sk, probs).collect()}
    n = lineitem.count()
    for q in probs:
        # true rank of the estimate in the full column
        rank = lineitem.filter(F.col("l_extendedprice") <= est[q]).count()
        err = abs(rank / n - q)
        assert err <= rank_error_bound(k, q) + 1.0 / n, (q, est[q], err)


def test_grouped_sketch_caps_and_bounds(spark):
    rows = [(g, i, float((i * 37 + g * 11) % 1000)) for g in range(3) for i in range(2000)]
    df = spark.createDataFrame(rows, "g int, id int, v double")
    sk = grouped_quantile_sketch(df, "v", ["id", "g"], ["g"], k=400)
    sizes = {r["g"]: r["c"] for r in sk.groupBy("g").agg(F.count("*").alias("c")).collect()}
    assert sizes == {0: 400, 1: 400, 2: 400}
    # each group's values are 0..999 uniform; the per-group sample median
    # must sit within the 5-sigma rank band of 0.5
    for g in range(3):
        one = sk.filter(F.col("g") == g).select("value", "__qs_h")
        med = sketch_quantiles(one, [0.5]).collect()[0]["est"]
        assert abs(med / 1000.0 - 0.5) <= rank_error_bound(400, 0.5) + 1e-3


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", ["id"], k=0)
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", [])
    with pytest.raises(ValueError):
        merge_quantile_sketches([], k=4)
    with pytest.raises(ValueError):
        sketch_quantiles(quantile_sketch(df, "v", ["id"], k=4), [0.0])


def test_grouped_merge_exact_and_idempotent(spark):
    rows = [(i % 2, i, float((i * 53) % 997)) for i in range(4000)]
    df = spark.createDataFrame(rows, "g int, id int, v double")
    lo = df.filter(F.col("id") < 2000)
    hi = df.filter(F.col("id") >= 2000)
    from bangumi_notion_data_integration_project_spark.operators.quantile_sketch import (
        merge_grouped_quantile_sketches,
    )

    def sk(d):
        return grouped_quantile_sketch(d, "v", ["id", "g"], ["g"], k=200)

    merged = merge_grouped_quantile_sketches([sk(lo), sk(hi)], ["g"], k=200)
    direct = sk(df)

    def rows_of(d):
        return sorted((r["g"], r["value"], r["__qs_h"]) for r in d.collect())

    assert rows_of(merged) == rows_of(direct)
    # idempotence per group: re-folding one shard changes nothing
    again = merge_grouped_quantile_sketches([merged, sk(lo)], ["g"], k=200)
    assert rows_of(again) == rows_of(direct)


def test_grouped_quantile_extraction(spark):
    # group 0: values 0..99; group 1: values 0..999 — distinct scales
    rows = [(0, i, float(i)) for i in range(100)] + [
        (1, 1000 + i, float(i)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "g int, id int, v double")
    from bangumi_notion_data_integration_project_spark.operators.quantile_sketch import (
        grouped_sketch_quantiles,
    )

    sk = grouped_quantile_sketch(df, "v", ["id"], ["g"], k=5000)  # k > n: exact
    est = {
        (r["g"], r["prob"]): r["est"]
        for r in grouped_sketch_quantiles(sk, ["g"], [0.5, 1.0]).collect()
    }
    assert est == {(0, 0.5): 49.0, (0, 1.0): 99.0, (1, 0.5): 499.0, (1, 1.0): 999.0}


@pytest.mark.parametrize("seed", [2, 9])
def test_merge_random_shard_splits_equals_whole(spark, lineitem, seed):
    """Semilattice property under ARBITRARY sharding: split the input
    into a random number of shards by a random hash, sketch each,
    merge in shard order AND in reversed order — every path must equal
    the direct whole-input sketch row for row (the contract the
    (hash, value) total-order cut guarantees even at the k-th-boundary
    tie)."""
    import random

    rng = random.Random(seed)
    n_shards = rng.randint(2, 5)
    salt = rng.randint(0, 10**6)
    df = lineitem.withColumn(
        "__shard",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber", F.lit(salt)), F.lit(n_shards)),
    )
    shards = [
        quantile_sketch(
            df.filter(F.col("__shard") == i).drop("__shard"),
            "l_extendedprice",
            ["l_orderkey", "l_linenumber"],
            k=256,
        )
        for i in range(n_shards)
    ]
    whole = _rows(
        quantile_sketch(
            lineitem, "l_extendedprice", ["l_orderkey", "l_linenumber"], k=256
        )
    )
    assert _rows(merge_quantile_sketches(shards, k=256)) == whole
    assert _rows(merge_quantile_sketches(list(reversed(shards)), k=256)) == whole


def test_serving_path_answers_from_persisted_sketch_alone(spark, lineitem, tmp_path):
    """The production claim behind every sketch registry entry: the
    full-scan rank probe is the TEST harness; serving persists the
    k-row sketch as a table and answers ANY later quantile from it
    alone. Pin it: persist, reopen, extract quantiles — the plan must
    scan only the k-row sketch table (never lineitem), and the answers
    must equal the pre-persist extraction and sit within the rank
    bound measured against the raw column."""
    k = 1024
    sk = quantile_sketch(
        lineitem, "l_extendedprice", ["l_orderkey", "l_linenumber"], k=k
    )
    probs = [0.25, 0.5, 0.9]
    before = {
        r["prob"]: r["est"] for r in sketch_quantiles(sk, probs).collect()
    }

    path = str(tmp_path / "sketch_table")
    sk.write.parquet(path)  # one-time build cost; 100 TB -> k rows

    stored = spark.read.parquet(path)
    assert stored.count() == k  # the serving input IS the k-row table
    served = sketch_quantiles(stored, probs)
    # sketch_quantiles localCheckpoints its input, so the sketch scan
    # shows as Scan ExistingRDD; the raw table must appear nowhere
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "lineitem" not in plan, "serving must never rescan the raw table"
    got = {r["prob"]: r["est"] for r in served.collect()}
    assert got == before

    n = lineitem.count()
    for p in probs:
        rank = lineitem.filter(F.col("l_extendedprice") <= got[p]).count() / n
        assert abs(rank - p) <= rank_error_bound(k, p)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_registry_psi_sketch_matches_exact_sibling(spark, sf_dir):
    """The regime-equivalence bound the registered
    ``orders_price_psi_sketch`` used to compute in-query (the r11
    verdict's bench remediation demoted it here: the registered query
    is now the k-row serving path alone): sketch-fed decile-edge PSI
    within max(20% of exact, 0.02) of the exact-edge sibling on the
    REAL registry input at both test SFs."""
    from pyspark.sql import functions as F

    from bangumi_notion_data_integration_project_spark.operators.drift import psi
    from bangumi_notion_data_integration_project_spark.operators.quantile_sketch import (
        quantile_sketch,
        sketch_quantiles,
    )
    from bangumi_notion_data_integration_project_spark.queries import QUERIES

    nb = 10
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderdate",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    ref = o.filter(F.col("o_orderdate") < "1998-01-01").select(
        "o_orderkey", "x"
    )
    cur = o.filter(F.col("o_orderdate") >= "1998-01-01").select("x")
    sk = quantile_sketch(ref, "x", ["o_orderkey"], k=1024)
    edges = sketch_quantiles(sk, [i / nb for i in range(1, nb)]).select(
        F.round(F.col("prob") * nb).cast("int").alias("bucket"),
        F.col("est").cast("long").alias("edge"),
    )
    approx = psi(ref.select("x"), cur, "x", n_buckets=nb, edges=edges)
    psi_sketch = approx.agg(F.max("psi")).collect()[0][0]
    psi_exact = (
        psi(ref.select("x"), cur, "x", n_buckets=nb)
        .agg(F.max("psi"))
        .collect()[0][0]
    )
    assert abs(psi_sketch - psi_exact) <= max(0.2 * psi_exact, 0.02)

    # and the registered serving path reports exactly the sketch PSI
    got = QUERIES["orders_price_psi_sketch"](spark, sf_dir).collect()
    assert {r["psi_sketch"] for r in got} == {psi_sketch}
    assert len(got) == nb


def test_finer_key_sketch_equals_filtered_builds(spark):
    """The r14 one-scan shard build: a sketch grouped by (flag,
    parity) then filtered to one parity must equal — row for row —
    the sketch built over the pre-filtered subset grouped by flag
    alone (bottom-k within a finer key IS bottom-k of each subset).
    This is the identity that lets q_lineitem_sketch_merge build both
    parity shards from one lineitem scan."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    ids = ["l_orderkey", "l_linenumber"]
    fine = grouped_quantile_sketch(
        li.withColumn("__par", F.col("l_orderkey") % 2),
        "cents",
        ids,
        ["l_returnflag", "__par"],
        k=64,
    )
    for i in (0, 1):
        a = sorted(
            map(
                tuple,
                fine.filter(F.col("__par") == i).drop("__par").collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                grouped_quantile_sketch(
                    li.filter(F.col("l_orderkey") % 2 == i),
                    "cents",
                    ids,
                    ["l_returnflag"],
                    k=64,
                ).collect(),
            )
        )
        assert a == b, i
