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


def test_psi_duckdb_oracle_shape_cross_engine(spark):
    """The DuckDB restatement of psi() — cum-count edges over distinct
    values, range-join bucketize, Laplace shares, nano-int term sums —
    is bit-equal to the operator on real orders cents split by
    order-key parity: the r10 registry oracle, pinned ahead of
    registration (the pacf/textrank/hampel de-risk pattern)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    ref = o.filter(F.col("o_orderkey") % 2 == 0).select("x")
    cur = o.filter(F.col("o_orderkey") % 2 == 1).select("x")
    got = [tuple(r) for r in psi(ref, cur, "x", n_buckets=10).collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS"
        f" SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            """
        WITH ref AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x
          FROM orders WHERE o_orderkey % 2 = 0
        ), cur AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x
          FROM orders WHERE o_orderkey % 2 = 1
        ), vc AS (
          SELECT x AS v, CAST(count(*) AS BIGINT) AS c FROM ref GROUP BY 1
        ), cum AS (
          SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM vc
        ), nn AS (SELECT CAST(max(cum) AS BIGINT) AS n FROM cum),
        targets AS (
          SELECT b AS bucket,
                 CAST(ceil(CAST(b AS DOUBLE) * CAST(n AS DOUBLE) / 10.0)
                      AS BIGINT) AS r
          FROM (SELECT unnest(range(1, 10)) AS b), nn
        ), edges AS (
          SELECT CAST(bucket AS INT) AS bucket, min(v) AS edge
          FROM cum, targets WHERE cum >= r GROUP BY bucket
        ), rvc AS (
          SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt FROM ref GROUP BY 1
        ), rbk AS (
          SELECT r.v, r.cnt, CAST(1 + count(e.edge) AS INT) AS bucket
          FROM rvc r LEFT JOIN edges e ON r.v > e.edge
          GROUP BY r.v, r.cnt
        ), rcnt AS (
          SELECT bucket, CAST(sum(cnt) AS BIGINT) AS c FROM rbk GROUP BY 1
        ), cvc AS (
          SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt FROM cur GROUP BY 1
        ), cbk AS (
          SELECT r.v, r.cnt, CAST(1 + count(e.edge) AS INT) AS bucket
          FROM cvc r LEFT JOIN edges e ON r.v > e.edge
          GROUP BY r.v, r.cnt
        ), ccnt AS (
          SELECT bucket, CAST(sum(cnt) AS BIGINT) AS c FROM cbk GROUP BY 1
        ), nrt AS (SELECT CAST(count(*) AS BIGINT) AS n_ref_total FROM ref),
        nct AS (SELECT CAST(count(*) AS BIGINT) AS n_cur_total FROM cur),
        grid AS (SELECT CAST(unnest(range(1, 11)) AS INT) AS bucket),
        base AS (
          SELECT g.bucket,
                 CAST(coalesce(r.c, 0) AS BIGINT) AS n_ref,
                 CAST(coalesce(c.c, 0) AS BIGINT) AS n_cur,
                 nrt.n_ref_total, nct.n_cur_total
          FROM grid g
          LEFT JOIN rcnt r ON g.bucket = r.bucket
          LEFT JOIN ccnt c ON g.bucket = c.bucket, nrt, nct
        ), terms AS (
          SELECT bucket, n_ref, n_cur,
                 round(CAST(n_ref + 1 AS DOUBLE)
                       / CAST(n_ref_total + 10 AS DOUBLE), 6) AS ref_share,
                 round(CAST(n_cur + 1 AS DOUBLE)
                       / CAST(n_cur_total + 10 AS DOUBLE), 6) AS cur_share,
                 round((CAST(n_cur + 1 AS DOUBLE)
                        / CAST(n_cur_total + 10 AS DOUBLE)
                        - CAST(n_ref + 1 AS DOUBLE)
                          / CAST(n_ref_total + 10 AS DOUBLE))
                       * ln((CAST(n_cur + 1 AS DOUBLE)
                             / CAST(n_cur_total + 10 AS DOUBLE))
                            / (CAST(n_ref + 1 AS DOUBLE)
                               / CAST(n_ref_total + 10 AS DOUBLE))), 6)
                   AS psi_term,
                 CAST(round((CAST(n_cur + 1 AS DOUBLE)
                        / CAST(n_cur_total + 10 AS DOUBLE)
                        - CAST(n_ref + 1 AS DOUBLE)
                          / CAST(n_ref_total + 10 AS DOUBLE))
                       * ln((CAST(n_cur + 1 AS DOUBLE)
                             / CAST(n_cur_total + 10 AS DOUBLE))
                            / (CAST(n_ref + 1 AS DOUBLE)
                               / CAST(n_ref_total + 10 AS DOUBLE)))
                       * 1000000000.0) AS BIGINT) AS tn
          FROM base
        ), tot AS (
          SELECT round(CAST(sum(tn) AS DOUBLE) / 1000000000.0, 6) AS psi
          FROM terms
        )
        SELECT t.bucket, e.edge, t.n_ref, t.n_cur, t.ref_share,
               t.cur_share, t.psi_term, tot.psi
        FROM terms t LEFT JOIN edges e ON t.bucket = e.bucket, tot
        ORDER BY t.bucket
        """
        ).fetchall()
    ]
    assert got == want


def test_null_value_raises_instead_of_bucket_one(spark):
    # r8 ADVICE: a NULL value silently classified into bucket 1 (no
    # edge matches NULL > edge) and skewed shares; the file convention
    # is fail-loud. Both the edge build and the bucketize path raise.
    import pytest

    ref = spark.createDataFrame(
        [(i,) for i in range(40)] + [(None,)], "v long"
    )
    cur = spark.createDataFrame([(i,) for i in range(40)], "v long")
    with pytest.raises(Exception, match="psi: NULL value"):
        psi(ref, cur, "v", n_buckets=4).collect()
    with pytest.raises(Exception, match="psi: NULL value"):
        psi(cur, ref, "v", n_buckets=4).collect()


def test_psi_grouped_matches_per_group_global(spark):
    """psi_grouped must equal the global psi run per group (each key's
    edges from its OWN reference distribution) — the km/segmented
    grouped-vs-global differential; the global operator carries the
    cross-engine-pinned oracle, so this transitively pins the grouped
    arithmetic too. A group present only in cur produces no row."""
    from bangumi_notion_data_integration_project_spark.operators.drift import (
        psi_grouped,
    )

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    ref = o.filter(F.col("o_orderkey") % 2 == 0)
    cur = o.filter(F.col("o_orderkey") % 2 == 1)
    got = {
        (r["o_orderpriority"], r["bucket"]): tuple(r)[2:]
        for r in psi_grouped(
            ref, cur, "x", ["o_orderpriority"], n_buckets=6
        ).collect()
    }
    prios = sorted(
        r["o_orderpriority"]
        for r in ref.select("o_orderpriority").distinct().collect()
    )
    want = {}
    for p in prios:
        for r in psi(
            ref.filter(F.col("o_orderpriority") == p).select("x"),
            cur.filter(F.col("o_orderpriority") == p).select("x"),
            "x",
            n_buckets=6,
        ).collect():
            want[(p, r["bucket"])] = tuple(r)[1:]
    assert got == want and len(got) == 6 * len(prios)

    # a group only in cur yields no row
    cur2 = cur.withColumn(
        "o_orderpriority", F.lit("9-GHOST")
    ).unionByName(cur)
    out = psi_grouped(ref, cur2, "x", ["o_orderpriority"], n_buckets=6)
    assert (
        out.filter(F.col("o_orderpriority") == "9-GHOST").count() == 0
    )


def test_psi_grouped_ref_only_group_reports_maximal_drift(spark):
    # r9 review finding: a segment that VANISHED from cur is the
    # loudest drift there is — it must keep its rows (n_cur_total=0,
    # cur_share=1/(0+k)), matching the global operator on an empty cur
    from bangumi_notion_data_integration_project_spark.operators.drift import (
        psi_grouped,
    )

    ref = spark.createDataFrame(
        [("a", i) for i in range(40)] + [("gone", i) for i in range(40)],
        "g string, v long",
    )
    cur = spark.createDataFrame(
        [("a", i + 5) for i in range(40)], "g string, v long"
    )
    rows = psi_grouped(ref, cur, "v", ["g"], n_buckets=4).collect()
    gone = [r for r in rows if r["g"] == "gone"]
    assert len(gone) == 4
    assert all(r["n_cur"] == 0 for r in gone)
    want = {
        r["bucket"]: tuple(r)[1:]
        for r in psi(
            ref.filter(F.col("g") == "gone").select("v"),
            cur.filter(F.col("g") == "gone").select("v"),
            "v",
            n_buckets=4,
        ).collect()
    }
    got = {r["bucket"]: tuple(r)[2:] for r in gone}
    assert got == want


def test_psi_grouped_null_group_key_raises(spark):
    # NULL keys would silently vanish through the null-unsafe joins —
    # the file convention is fail-loud (same as NULL values)
    import pytest

    from bangumi_notion_data_integration_project_spark.operators.drift import (
        psi_grouped,
    )

    ref = spark.createDataFrame(
        [("a", 1), (None, 2)] + [("a", i) for i in range(40)],
        "g string, v long",
    )
    cur = spark.createDataFrame(
        [("a", i) for i in range(40)], "g string, v long"
    )
    with pytest.raises(Exception, match="psi: NULL group key in g"):
        psi_grouped(ref, cur, "v", ["g"], n_buckets=4).collect()


def test_psi_grouped_duckdb_oracle_shape_cross_engine(spark):
    """The grouped-PSI DuckDB restatement — the pinned global chain
    with the group key threaded through every CTE (per-group edges,
    grouped bucketize join, per-group totals and psi sum) — is
    bit-equal to psi_grouped on events value cents by type, split on
    day parity: the r11 registry oracle, pinned ahead of
    registration."""
    import duckdb

    from bangumi_notion_data_integration_project_spark.operators.drift import (
        psi_grouped,
    )

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    ref = e.filter(F.col("dom") % 2 == 0).select("event_type", "x")
    cur = e.filter(F.col("dom") % 2 == 1).select("event_type", "x")
    got = [
        tuple(r)
        for r in psi_grouped(
            ref, cur, "x", ["event_type"], n_buckets=6
        ).collect()
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS"
        f" SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            """
        WITH ref AS (
          SELECT event_type AS s,
                 CAST(round(value * 100) AS BIGINT) AS x
          FROM events WHERE day(CAST(ts AS DATE)) % 2 = 0
        ), cur AS (
          SELECT event_type AS s,
                 CAST(round(value * 100) AS BIGINT) AS x
          FROM events WHERE day(CAST(ts AS DATE)) % 2 = 1
        ), vc AS (
          SELECT s, x AS v, CAST(count(*) AS BIGINT) AS c
          FROM ref GROUP BY 1, 2
        ), cum AS (
          SELECT s, v, CAST(sum(c) OVER (PARTITION BY s ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
          FROM vc
        ), nn AS (
          SELECT s, CAST(max(cum) AS BIGINT) AS n FROM cum GROUP BY s
        ), targets AS (
          SELECT nn.s, b AS bucket,
                 CAST(ceil(CAST(b AS DOUBLE) * CAST(n AS DOUBLE) / 6.0)
                      AS BIGINT) AS r
          FROM (SELECT unnest(range(1, 6)) AS b), nn
        ), edges AS (
          SELECT c.s, CAST(t.bucket AS INT) AS bucket, min(c.v) AS edge
          FROM cum c JOIN targets t ON c.s = t.s
          WHERE c.cum >= t.r GROUP BY c.s, t.bucket
        ), rvc AS (
          SELECT s, x AS v, CAST(count(*) AS BIGINT) AS cnt
          FROM ref GROUP BY 1, 2
        ), rbk AS (
          SELECT r.s, r.v, r.cnt, CAST(1 + count(e.edge) AS INT) AS bucket
          FROM rvc r LEFT JOIN edges e ON r.s = e.s AND r.v > e.edge
          GROUP BY r.s, r.v, r.cnt
        ), rcnt AS (
          SELECT s, bucket, CAST(sum(cnt) AS BIGINT) AS c
          FROM rbk GROUP BY 1, 2
        ), cvc AS (
          SELECT s, x AS v, CAST(count(*) AS BIGINT) AS cnt
          FROM cur GROUP BY 1, 2
        ), cbk AS (
          SELECT r.s, r.v, r.cnt, CAST(1 + count(e.edge) AS INT) AS bucket
          FROM cvc r LEFT JOIN edges e ON r.s = e.s AND r.v > e.edge
          GROUP BY r.s, r.v, r.cnt
        ), ccnt AS (
          SELECT s, bucket, CAST(sum(cnt) AS BIGINT) AS c
          FROM cbk GROUP BY 1, 2
        ), nrt AS (
          SELECT s, CAST(count(*) AS BIGINT) AS n_ref_total
          FROM ref GROUP BY s
        ), nct AS (
          SELECT s, CAST(count(*) AS BIGINT) AS n_cur_total
          FROM cur GROUP BY s
        ), grid AS (
          SELECT nrt.s, CAST(b AS INT) AS bucket
          FROM (SELECT unnest(range(1, 7)) AS b), nrt
        ), base AS (
          SELECT g.s, g.bucket,
                 CAST(coalesce(r.c, 0) AS BIGINT) AS n_ref,
                 CAST(coalesce(c.c, 0) AS BIGINT) AS n_cur,
                 nrt.n_ref_total,
                 CAST(coalesce(nct.n_cur_total, 0) AS BIGINT)
                   AS n_cur_total
          FROM grid g
          LEFT JOIN rcnt r ON g.s = r.s AND g.bucket = r.bucket
          LEFT JOIN ccnt c ON g.s = c.s AND g.bucket = c.bucket
          JOIN nrt ON g.s = nrt.s
          LEFT JOIN nct ON g.s = nct.s
        ), terms AS (
          SELECT s, bucket, n_ref, n_cur,
                 round(CAST(n_ref + 1 AS DOUBLE)
                       / CAST(n_ref_total + 6 AS DOUBLE), 6) AS ref_share,
                 round(CAST(n_cur + 1 AS DOUBLE)
                       / CAST(n_cur_total + 6 AS DOUBLE), 6) AS cur_share,
                 round((CAST(n_cur + 1 AS DOUBLE)
                        / CAST(n_cur_total + 6 AS DOUBLE)
                        - CAST(n_ref + 1 AS DOUBLE)
                          / CAST(n_ref_total + 6 AS DOUBLE))
                       * ln((CAST(n_cur + 1 AS DOUBLE)
                             / CAST(n_cur_total + 6 AS DOUBLE))
                            / (CAST(n_ref + 1 AS DOUBLE)
                               / CAST(n_ref_total + 6 AS DOUBLE))), 6)
                   AS psi_term,
                 CAST(round((CAST(n_cur + 1 AS DOUBLE)
                        / CAST(n_cur_total + 6 AS DOUBLE)
                        - CAST(n_ref + 1 AS DOUBLE)
                          / CAST(n_ref_total + 6 AS DOUBLE))
                       * ln((CAST(n_cur + 1 AS DOUBLE)
                             / CAST(n_cur_total + 6 AS DOUBLE))
                            / (CAST(n_ref + 1 AS DOUBLE)
                               / CAST(n_ref_total + 6 AS DOUBLE)))
                       * 1000000000.0) AS BIGINT) AS tn
          FROM base
        ), tot AS (
          SELECT s, round(CAST(sum(tn) AS DOUBLE) / 1000000000.0, 6)
                   AS psi
          FROM terms GROUP BY s
        )
        SELECT t.s AS event_type, t.bucket, e.edge, t.n_ref, t.n_cur,
               t.ref_share, t.cur_share, t.psi_term, tot.psi
        FROM terms t
        LEFT JOIN edges e ON t.s = e.s AND t.bucket = e.bucket
        JOIN tot ON t.s = tot.s
        ORDER BY t.s, t.bucket
        """
        ).fetchall()
    ]
    assert got == want
    assert len(got) == 6 * 5  # 6 buckets x 5 event types
