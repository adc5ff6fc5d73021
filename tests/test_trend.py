"""Mann-Kendall + Theil-Sen (operators/stats.py): python-reference
differentials with ties, grouped isolation, degenerate inputs, and the
cross-engine DuckDB oracle shapes pinned ahead of registration (the
pacf/textrank/hampel/psi de-risk pattern)."""

from __future__ import annotations

import math
import random

import pytest

from bangumi_notion_data_integration_project_spark.operators.stats import (
    mann_kendall,
    sen_slope,
)


def _py_mk(xs):
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_counts: dict[int, int] = {}
    for x in xs:
        tie_counts[x] = tie_counts.get(x, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in tie_counts.values())
    var_num = n * (n - 1) * (2 * n + 5) - tie_term
    var_s = var_num / 18.0
    if var_num > 0:
        if s > 0:
            z = (float(s) - 1.0) / math.sqrt(var_s)
        elif s < 0:
            z = (float(s) + 1.0) / math.sqrt(var_s)
        else:
            z = 0.0
    else:
        z = None
    return n, s, tie_term, var_s, z


def _py_sen(xs):
    n = len(xs)
    pairs = [
        (float(xs[j] - xs[i]) / float(j - i), i + 1, j + 1)
        for i in range(n)
        for j in range(i + 1, n)
    ]
    pairs.sort()
    m = len(pairs)
    slope = pairs[(m + 1) // 2 - 1][0]
    resid = sorted(
        (float(x) - slope * float(t + 1), t + 1) for t, x in enumerate(xs)
    )
    intercept = resid[(n + 1) // 2 - 1][0]
    return n, m, slope, intercept


def _rnd(x, nd):
    # Spark round() is half-away; inputs here never land on ties but
    # keep the convention anyway
    return math.copysign(
        math.floor(abs(x) * 10**nd + 0.5) / 10**nd, x
    )


def test_mann_kendall_matches_python_reference(spark):
    rng = random.Random(11)
    xs = [rng.randrange(0, 40) + i for i in range(60)]  # ties + trend
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, x long"
    )
    r = mann_kendall(df, "d", "x").collect()[0]
    n, s, tie_term, var_s, z = _py_mk(xs)
    assert (r["n_points"], r["s_stat"], r["tie_term"]) == (n, s, tie_term)
    assert r["var_s"] == _rnd(var_s, 4)
    assert r["z"] == _rnd(z, 6)
    assert r["z"] > 3.0  # the planted trend is detected


def test_sen_slope_matches_python_reference(spark):
    rng = random.Random(12)
    xs = [3 * i + rng.randrange(-5, 6) for i in range(50)]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, x long"
    )
    r = sen_slope(df, "d", "x").collect()[0]
    n, m, slope, intercept = _py_sen(xs)
    assert (r["n_points"], r["n_pairs"]) == (n, m)
    assert r["sen_slope"] == _rnd(slope, 9)
    assert r["intercept"] == _rnd(intercept, 4)
    assert abs(r["sen_slope"] - 3.0) <= 0.2  # robust to the noise


def test_sen_slope_robust_to_outliers_where_ols_is_not(spark):
    xs = [10 * i for i in range(30)]
    xs[7] = 10_000_000  # one wild point
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, x long"
    )
    r = sen_slope(df, "d", "x").collect()[0]
    assert r["sen_slope"] == 10.0  # the median slope shrugs it off


def test_grouped_variants_isolate_keys(spark):
    rng = random.Random(13)
    rows = []
    series = {}
    for g in ("a", "b", "c"):
        xs = [rng.randrange(0, 30) + (i if g == "a" else 0) for i in range(40)]
        series[g] = xs
        rows += [(g, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, d long, x long")
    mk = {r["g"]: r for r in mann_kendall(df, "d", "x", group_cols=["g"]).collect()}
    sen = {r["g"]: r for r in sen_slope(df, "d", "x", group_cols=["g"]).collect()}
    for g, xs in series.items():
        n, s, tie_term, var_s, z = _py_mk(xs)
        assert (mk[g]["n_points"], mk[g]["s_stat"], mk[g]["tie_term"]) == (
            n,
            s,
            tie_term,
        ), g
        assert mk[g]["z"] == _rnd(z, 6), g
        n, m, slope, intercept = _py_sen(xs)
        assert sen[g]["sen_slope"] == _rnd(slope, 9), g
        assert sen[g]["n_pairs"] == m, g


def test_degenerate_inputs(spark):
    # all-tied series: var_num = 0 -> NULL z, never DIVIDE_BY_ZERO
    flat = spark.createDataFrame(
        [(i, 7) for i in range(10)], "d long, x long"
    )
    r = mann_kendall(flat, "d", "x").collect()[0]
    assert r["s_stat"] == 0 and r["z"] is None
    # n=1 global: MK reports the point with S=0 / NULL z; Sen has no
    # pair -> empty frame (documented degenerates)
    one = spark.createDataFrame([(1, 5)], "d long, x long")
    r1 = mann_kendall(one, "d", "x").collect()[0]
    assert r1["n_points"] == 1 and r1["s_stat"] == 0 and r1["z"] is None
    assert sen_slope(one, "d", "x").collect() == []
    # grouped Sen: a 1-point group produces no row, others unaffected
    gdf = spark.createDataFrame(
        [("a", 1, 5), ("b", 1, 1), ("b", 2, 9)], "g string, d long, x long"
    )
    got = {r["g"]: r for r in sen_slope(gdf, "d", "x", group_cols=["g"]).collect()}
    assert list(got) == ["b"] and got["b"]["sen_slope"] == 8.0
    # grouped MK: every group reports a row — the pairless 1-point
    # group carries S=0 / NULL z instead of silently vanishing (the
    # r9 ADVICE find), and a group whose order values are all
    # duplicated (no a.d < b.d pair) likewise
    gmk = {
        r["g"]: r
        for r in mann_kendall(gdf, "d", "x", group_cols=["g"]).collect()
    }
    assert set(gmk) == {"a", "b"}
    assert gmk["a"]["n_points"] == 1 and gmk["a"]["s_stat"] == 0
    assert gmk["a"]["z"] is None
    assert gmk["b"]["s_stat"] == 1
    dup = spark.createDataFrame(
        [("c", 1, 5), ("c", 1, 9)], "g string, d long, x long"
    )
    rdup = mann_kendall(dup, "d", "x", group_cols=["g"]).collect()[0]
    # two distinct x at one order value: no pair -> S = 0; tie_term = 0
    # so var_num = 2*1*9 = 18 > 0 and the S = 0 branch reports z = 0.0
    assert rdup["n_points"] == 2 and rdup["s_stat"] == 0
    assert rdup["z"] == 0.0


def test_null_x_raises(spark):
    df = spark.createDataFrame([(1, 4), (2, None)], "d long, x long")
    with pytest.raises(Exception, match="mann_kendall: NULL x value at 2"):
        mann_kendall(df, "d", "x").collect()
    with pytest.raises(Exception, match="sen_slope: NULL x value at 2"):
        sen_slope(df, "d", "x").collect()


def test_null_group_key_raises_in_trend_family(spark):
    # a NULL-keyed group forms zero pairs in the null-unsafe equi-join
    # and (post left-join fix) would report a confident S = 0 verdict
    # computed from nothing — _trend_input raises instead (the psi
    # convention, r10 review find)
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        pettitt_test,
    )

    rows = [("a", 1, 5), ("a", 2, 7), (None, 1, 3), (None, 2, 9)]
    df = spark.createDataFrame(rows, "g string, d long, x long")
    with pytest.raises(Exception, match="mann_kendall: NULL group key"):
        mann_kendall(df, "d", "x", group_cols=["g"]).collect()
    with pytest.raises(Exception, match="sen_slope: NULL group key"):
        sen_slope(df, "d", "x", group_cols=["g"]).collect()
    with pytest.raises(Exception, match="pettitt_test: NULL group key"):
        pettitt_test(df, "d", "x", group_cols=["g"]).collect()


def test_trend_duckdb_oracle_shapes_cross_engine(spark):
    """The DuckDB restatements — pairwise sign sum + tie aggregate for
    MK, rank-extracted pairwise-slope and residual medians for Sen —
    are bit-equal to the operators on the real daily revenue series:
    the r11 registry oracles, pinned ahead of registration."""
    import duckdb

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    got_mk = tuple(mann_kendall(daily, "d", "x").collect()[0])
    got_sen = tuple(sen_slope(daily, "d", "x").collect()[0])

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS"
        f" SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    want_mk = con.execute(
        """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS x
          FROM orders GROUP BY 1
        ), pairs AS (
          SELECT CASE WHEN b.x > a.x THEN 1
                      WHEN b.x < a.x THEN -1 ELSE 0 END AS sg
          FROM daily a JOIN daily b ON a.d < b.d
        ), s AS (
          SELECT CAST(sum(sg) AS BIGINT) AS s_stat FROM pairs
        ), ties AS (
          SELECT CAST(sum(t) AS BIGINT) AS n_points,
                 CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
          FROM (SELECT CAST(count(*) AS BIGINT) AS t
                FROM daily GROUP BY x) z
        )
        SELECT n_points, s_stat, tie_term,
               round(CAST(n_points * (n_points - 1) * (2 * n_points + 5)
                          - tie_term AS DOUBLE) / 18.0, 4) AS var_s,
               round(CASE WHEN n_points * (n_points - 1) * (2 * n_points + 5)
                               - tie_term > 0 THEN
                 CASE WHEN s_stat > 0
                      THEN (CAST(s_stat AS DOUBLE) - 1.0)
                           / sqrt(CAST(n_points * (n_points - 1)
                                       * (2 * n_points + 5) - tie_term
                                  AS DOUBLE) / 18.0)
                      WHEN s_stat < 0
                      THEN (CAST(s_stat AS DOUBLE) + 1.0)
                           / sqrt(CAST(n_points * (n_points - 1)
                                       * (2 * n_points + 5) - tie_term
                                  AS DOUBLE) / 18.0)
                      ELSE 0.0 END
               END, 6) AS z
        FROM ties, s
        """
    ).fetchall()[0]
    assert got_mk == tuple(want_mk)

    want_sen = con.execute(
        """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS x
          FROM orders GROUP BY 1
        ), dt AS (
          SELECT x, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
          FROM daily
        ), pairs AS (
          SELECT CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s,
                 a.t AS ta, b.t AS tb
          FROM dt a JOIN dt b ON a.t < b.t
        ), ranked AS (
          SELECT s, row_number() OVER (ORDER BY s, ta, tb) AS rk,
                 CAST(count(*) OVER () AS BIGINT) AS m
          FROM pairs
        ), med AS (
          SELECT s AS slope, m AS n_pairs FROM ranked
          WHERE rk = (m + 1) // 2
        ), resid AS (
          SELECT CAST(dt.x AS DOUBLE) - med.slope * CAST(dt.t AS DOUBLE)
                   AS res,
                 dt.t, med.n_pairs, med.slope
          FROM dt, med
        ), rranked AS (
          SELECT res, n_pairs, slope,
                 row_number() OVER (ORDER BY res, t) AS rr,
                 CAST(count(*) OVER () AS BIGINT) AS n
          FROM resid
        )
        SELECT n AS n_points, n_pairs,
               round(slope, 9) AS sen_slope, round(res, 4) AS intercept
        FROM rranked WHERE rr = (n + 1) // 2
        """
    ).fetchall()[0]
    assert got_sen == tuple(want_sen)


def test_seasonal_mann_kendall_matches_python(spark):
    """Per-season S and variance sum exactly; a pure weekly cycle must
    NOT register as trend (each season is constant -> S=0), while a
    within-season trend must."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        seasonal_mann_kendall,
    )

    rng = random.Random(21)
    # pure cycle: x depends only on d%7
    cyc = [(i, (i % 7) * 100) for i in range(70)]
    df = spark.createDataFrame(cyc, "d long, x long")
    r = seasonal_mann_kendall(
        df.withColumn("dow", df.d % 7), "d", "x", "dow"
    ).collect()[0]
    assert r["s_stat"] == 0 and r["z"] is None  # all-tied seasons: var 0

    # trend + cycle + noise: detected
    rows = [(i, (i % 7) * 100 + i + rng.randrange(0, 5)) for i in range(70)]
    df2 = spark.createDataFrame(rows, "d long, x long")
    r2 = seasonal_mann_kendall(
        df2.withColumn("dow", df2.d % 7), "d", "x", "dow"
    ).collect()[0]
    # python replay: per-season MK summed
    s_tot, var_tot, n_tot = 0, 0, 0
    for g in range(7):
        xs = [x for i, x in rows if i % 7 == g]
        n, s, tie, _v, _z = _py_mk(xs)
        s_tot += s
        var_tot += n * (n - 1) * (2 * n + 5) - tie
        n_tot += n
    want_z = (float(s_tot) - 1.0) / math.sqrt(var_tot / 18.0)
    assert (r2["n_seasons"], r2["n_points"], r2["s_stat"]) == (7, n_tot, s_tot)
    assert r2["var_s"] == _rnd(var_tot / 18.0, 4)
    assert r2["z"] == _rnd(want_z, 6) and r2["z"] > 3.0


def _py_ccf(xs, ys, max_lag):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    dx = [n * x - sx for x in xs]
    dy = [n * y - sy for y in ys]
    denx = sum(v * v for v in dx)
    deny = sum(v * v for v in dy)
    out = {}
    for k in range(-max_lag, max_lag + 1):
        num = sum(
            dx[t] * dy[t + k] for t in range(n) if 0 <= t + k < n
        )
        npairs = sum(1 for t in range(n) if 0 <= t + k < n)
        out[k] = (npairs, float(num) / math.sqrt(float(denx) * float(deny)))
    return out


def test_cross_correlation_matches_python_and_finds_planted_lead(spark):
    import datetime

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        cross_correlation,
    )

    rng = random.Random(31)
    xs = [rng.randrange(0, 1000) for _ in range(80)]
    # y follows x by 3 days (plus noise): ccf peaks at lag +3
    ys = [
        (xs[i - 3] if i >= 3 else 500) * 2 + rng.randrange(0, 50)
        for i in range(80)
    ]
    base = datetime.date(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (base + datetime.timedelta(days=i), x, y)
            for i, (x, y) in enumerate(zip(xs, ys))
        ],
        "d date, x long, y long",
    )
    got = {
        r["lag"]: (r["n_pairs"], r["ccf"])
        for r in cross_correlation(df, "d", "x", "y", max_lag=5).collect()
    }
    want = _py_ccf(xs, ys, 5)
    assert set(got) == set(want)
    for k, (npairs, c) in want.items():
        assert got[k][0] == npairs, k
        assert got[k][1] == _rnd(c, 6), k
    assert max(got, key=lambda k: got[k][1]) == 3  # the planted lead


def test_cross_correlation_degenerates_and_nulls(spark):
    import datetime

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        cross_correlation,
    )

    base = datetime.date(2024, 1, 1)
    flat = spark.createDataFrame(
        [(base + datetime.timedelta(days=i), 5, i) for i in range(6)],
        "d date, x long, y long",
    )
    rows = cross_correlation(flat, "d", "x", "y", max_lag=2).collect()
    assert rows and all(r["ccf"] is None for r in rows)  # constant x
    bad = spark.createDataFrame(
        [(base, 1, 1), (base + datetime.timedelta(days=1), 2, None)],
        "d date, x long, y long",
    )
    with pytest.raises(Exception, match="cross_correlation: NULL y value"):
        cross_correlation(bad, "d", "x", "y").collect()


def test_ccf_duckdb_oracle_shape_cross_engine(spark):
    """The DuckDB restatement — the revenue_acf recipe with two
    deviation columns and num/sqrt(denx·deny) in the identical op
    order — is bit-equal to the operator on the real order-vs-shipped
    revenue pair: the r11 registry oracle, pinned ahead of
    registration."""
    import duckdb

    from pyspark.sql import functions as F

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        cross_correlation,
    )

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    ox = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    sy = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    both = ox.join(sy, "d")
    got = [
        tuple(r)
        for r in cross_correlation(both, "d", "x", "y", max_lag=7).collect()
    ]

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = [
        tuple(r)
        for r in con.execute(
            """
        WITH ox AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS x
          FROM orders GROUP BY 1
        ), sy AS (
          SELECT CAST(l_shipdate AS DATE) AS d,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS y
          FROM lineitem GROUP BY 1
        ), xy AS (
          SELECT ox.d, ox.x, sy.y FROM ox JOIN sy ON ox.d = sy.d
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy2
          FROM xy
        ), dev AS (
          SELECT d, CAST(n AS HUGEINT) * x - sx AS dx,
                 CAST(n AS HUGEINT) * y - sy2 AS dy
          FROM xy, tot
        ), den AS (
          SELECT sum(dx * dx) AS denx, sum(dy * dy) AS deny FROM dev
        ), pairs AS (
          SELECT CAST(date_diff('day', a.d, b.d) AS BIGINT) AS lag,
                 a.dx * b.dy AS prod
          FROM dev a JOIN dev b
            ON date_diff('day', a.d, b.d) BETWEEN -7 AND 7
        )
        SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
               CASE WHEN denx > 0 AND deny > 0 THEN
                 round(CAST(sum(prod) AS DOUBLE)
                       / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)),
                       6)
               END AS ccf
        FROM pairs, den GROUP BY lag, denx, deny ORDER BY lag
        """
        ).fetchall()
    ]
    assert got == want
    assert len(got) == 15


def test_seasonal_mk_duckdb_oracle_shape_cross_engine(spark):
    """Seasonal MK on daily revenue with day-of-week seasons — the
    r11 registry oracle pinned ahead of registration. The season key
    is days-since-epoch-Monday mod 7 (datediff arithmetic, identical
    integers in both engines — Spark dayofweek() is 1=Sunday..7 while
    DuckDB's is 0=Sunday..6, so the builtin is NOT cross-engine
    safe)."""
    import duckdb

    from pyspark.sql import functions as F

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        seasonal_mann_kendall,
    )

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    dowd = daily.withColumn(
        "dow",
        (F.datediff("d", F.lit("1970-01-05").cast("date")) % 7).cast(
            "long"
        ),
    )
    got = tuple(seasonal_mann_kendall(dowd, "d", "x", "dow").collect()[0])

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS"
        f" SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    want = con.execute(
        """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS x
          FROM orders GROUP BY 1
        ), dowd AS (
          SELECT d, x,
                 CAST(date_diff('day', DATE '1970-01-05', d) % 7
                      AS BIGINT) AS g
          FROM daily
        ), pairs AS (
          SELECT CASE WHEN b.x > a.x THEN 1
                      WHEN b.x < a.x THEN -1 ELSE 0 END AS sg
          FROM dowd a JOIN dowd b ON a.g = b.g AND a.d < b.d
        ), s AS (
          SELECT CAST(coalesce(sum(sg), 0) AS BIGINT) AS s_stat FROM pairs
        ), per_g AS (
          SELECT g, CAST(sum(t) AS BIGINT) AS n,
                 CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
          FROM (SELECT g, CAST(count(*) AS BIGINT) AS t
                FROM dowd GROUP BY g, x) z
          GROUP BY g
        ), comb AS (
          SELECT CAST(count(*) AS BIGINT) AS n_seasons,
                 CAST(sum(n) AS BIGINT) AS n_points,
                 CAST(sum(n * (n - 1) * (2 * n + 5) - tie) AS BIGINT)
                   AS var_num
          FROM per_g
        )
        SELECT n_seasons, n_points, s_stat,
               round(CAST(var_num AS DOUBLE) / 18.0, 4) AS var_s,
               round(CASE WHEN var_num > 0 THEN
                 CASE WHEN s_stat > 0
                      THEN (CAST(s_stat AS DOUBLE) - 1.0)
                           / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                      WHEN s_stat < 0
                      THEN (CAST(s_stat AS DOUBLE) + 1.0)
                           / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                      ELSE 0.0 END
               END, 6) AS z
        FROM comb, s
        """
    ).fetchall()[0]
    assert got == tuple(want)


def test_monthly_sen_duckdb_oracle_shape_cross_engine(spark):
    """Theil-Sen on MONTHLY revenue cents — the r11 registry grain
    (the daily series' 2.9M-pair rank pass costs 4.3 s; ~80 months is
    3160 pairs). Spark trunc(date, 'month') and DuckDB
    date_trunc('month', date) agree; pinned ahead of registration."""
    import duckdb

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    monthly = o.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("m")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    got = tuple(sen_slope(monthly, "m", "x").collect()[0])

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS"
        f" SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    want = con.execute(
        """
        WITH monthly AS (
          SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS x
          FROM orders GROUP BY 1
        ), dt AS (
          SELECT x, CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t
          FROM monthly
        ), pairs AS (
          SELECT CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s,
                 a.t AS ta, b.t AS tb
          FROM dt a JOIN dt b ON a.t < b.t
        ), ranked AS (
          SELECT s, row_number() OVER (ORDER BY s, ta, tb) AS rk,
                 CAST(count(*) OVER () AS BIGINT) AS m
          FROM pairs
        ), med AS (
          SELECT s AS slope, m AS n_pairs FROM ranked
          WHERE rk = (m + 1) // 2
        ), resid AS (
          SELECT CAST(dt.x AS DOUBLE) - med.slope * CAST(dt.t AS DOUBLE)
                   AS res,
                 dt.t, med.n_pairs, med.slope
          FROM dt, med
        ), rranked AS (
          SELECT res, n_pairs, slope,
                 row_number() OVER (ORDER BY res, t) AS rr,
                 CAST(count(*) OVER () AS BIGINT) AS n
          FROM resid
        )
        SELECT n AS n_points, n_pairs,
               round(slope, 9) AS sen_slope, round(res, 4) AS intercept
        FROM rranked WHERE rr = (n + 1) // 2
        """
    ).fetchall()[0]
    assert got == tuple(want)


def test_ols_fit2_matches_numpy_and_degenerates(spark):
    """Two-feature closed-form OLS: coefficients match numpy lstsq on
    a planted-plane + noise input; collinear x2 = 2*x1 reports NULL
    coefficients (det = 0) under the ANSI guard."""
    import numpy as np

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        ols_fit2,
    )

    rng = random.Random(41)
    rows = []
    for i in range(200):
        x1 = rng.randrange(0, 100)
        x2 = rng.randrange(0, 50)
        ynoise = 7 * x1 - 3 * x2 + 40 + rng.randrange(-4, 5)
        rows.append((i, x1, x2, ynoise))
    df = spark.createDataFrame(rows, "i long, x1 long, x2 long, y long")
    r = ols_fit2(df, "x1", "x2", "y").collect()[0]
    a = np.array([[x1, x2, 1.0] for _, x1, x2, _ in rows])
    b = np.array([float(y) for *_, y in rows])
    coef, res, _, _ = np.linalg.lstsq(a, b, rcond=None)
    assert abs(r["b1"] - coef[0]) < 1e-6
    assert abs(r["b2"] - coef[1]) < 1e-6
    assert abs(r["intercept"] - coef[2]) < 1e-3
    sst = float(((b - b.mean()) ** 2).sum())
    assert abs(r["r2"] - (1.0 - float(res[0]) / sst)) < 1e-6
    assert r["r2"] > 0.99

    col = spark.createDataFrame(
        [(i, i, 2 * i, 3 * i + 1) for i in range(20)],
        "i long, x1 long, x2 long, y long",
    )
    rc = ols_fit2(col, "x1", "x2", "y").collect()[0]
    assert rc["b1"] is None and rc["b2"] is None and rc["r2"] is None


def test_ols_fit2_grouped_isolates_keys(spark):
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        ols_fit2,
    )

    rows = []
    for g, (w1, w2, c) in {"a": (2, 5, 10), "b": (-1, 3, 0)}.items():
        for i in range(60):
            x1, x2 = (i * 13) % 37, (i * 7) % 23
            rows.append((g, x1, x2, w1 * x1 + w2 * x2 + c))
    df = spark.createDataFrame(rows, "g string, x1 long, x2 long, y long")
    got = {r["g"]: r for r in ols_fit2(df, "x1", "x2", "y", group_cols=["g"]).collect()}
    assert got["a"]["b1"] == 2.0 and got["a"]["b2"] == 5.0
    assert got["a"]["intercept"] == 10.0
    assert got["b"]["b1"] == -1.0 and got["b"]["b2"] == 3.0
    # exact fit: SSR == SST -> r2 = 1
    assert got["a"]["r2"] == 1.0 and got["b"]["r2"] == 1.0


def test_ols2_duckdb_oracle_shape_cross_engine(spark):
    """The DuckDB restatement — HUGEINT moments, the identical Cramer
    double expressions — is bit-equal to ols_fit2 on real lineitem
    (price cents ~ quantity + discount bp): the r11 registry oracle,
    pinned ahead of registration."""
    import duckdb

    from pyspark.sql import functions as F

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        ols_fit2,
    )

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("disc_bp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    got = tuple(ols_fit2(li, "q", "disc_bp", "cents").collect()[0])

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS"
        f" SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    want = con.execute(
        """
        WITH d AS (
          SELECT CAST(l_quantity AS HUGEINT) AS x1,
                 CAST(round(l_discount * 10000) AS HUGEINT) AS x2,
                 CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
          FROM lineitem
        ), m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
                 sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
                 sum(x1 * x2) AS s12, sum(x1 * y) AS s1y,
                 sum(x2 * y) AS s2y, sum(y * y) AS syy
          FROM d
        ), c AS (
          SELECT n,
                 n * s11 - s1 * s1 AS a11,
                 n * s22 - s2 * s2 AS a22,
                 n * s12 - s1 * s2 AS a12,
                 n * s1y - s1 * sy AS c1,
                 n * s2y - s2 * sy AS c2,
                 n * syy - sy * sy AS syyc,
                 s1, s2, sy
          FROM m
        ), f AS (
          SELECT n, s1, s2, sy, c1, c2, syyc,
                 CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE)
                   - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE) AS det,
                 1e-12 * CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE)
                   AS det_eps,
                 (CAST(c1 AS DOUBLE) * CAST(a22 AS DOUBLE)
                   - CAST(c2 AS DOUBLE) * CAST(a12 AS DOUBLE)) AS b1n,
                 (CAST(a11 AS DOUBLE) * CAST(c2 AS DOUBLE)
                   - CAST(a12 AS DOUBLE) * CAST(c1 AS DOUBLE)) AS b2n
          FROM c
        )
        SELECT n,
               CASE WHEN abs(det) > det_eps
                    THEN round(b1n / det, 9) END AS b1,
               CASE WHEN abs(det) > det_eps
                    THEN round(b2n / det, 9) END AS b2,
               CASE WHEN abs(det) > det_eps THEN round(
                 (CAST(sy AS DOUBLE) - (b1n / det) * CAST(s1 AS DOUBLE)
                  - (b2n / det) * CAST(s2 AS DOUBLE))
                 / CAST(n AS DOUBLE), 4) END AS intercept,
               CASE WHEN abs(det) > det_eps AND syyc > 0 THEN round(
                 ((b1n / det) * CAST(c1 AS DOUBLE)
                  + (b2n / det) * CAST(c2 AS DOUBLE))
                 / CAST(syyc AS DOUBLE), 6) END AS r2
        FROM f
        """
    ).fetchall()[0]
    assert got == tuple(want)


def test_cross_correlation_grouped_isolates_keys(spark):
    import datetime

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        cross_correlation,
    )

    rng = random.Random(51)
    base = datetime.date(2024, 1, 1)
    rows, series = [], {}
    for g, lead in (("a", 2), ("b", 4)):
        xs = [rng.randrange(0, 500) for _ in range(60)]
        ys = [
            (xs[i - lead] if i >= lead else 250) * 3 + rng.randrange(0, 20)
            for i in range(60)
        ]
        series[g] = (xs, ys)
        rows += [
            (g, base + datetime.timedelta(days=i), x, y)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]
    df = spark.createDataFrame(rows, "g string, d date, x long, y long")
    got = {}
    for r in cross_correlation(
        df, "d", "x", "y", max_lag=5, group_cols=["g"]
    ).collect():
        got.setdefault(r["g"], {})[r["lag"]] = (r["n_pairs"], r["ccf"])
    for g, (xs, ys) in series.items():
        want = _py_ccf(xs, ys, 5)
        assert set(got[g]) == set(want), g
        for k, (npairs, c) in want.items():
            assert got[g][k] == (npairs, _rnd(c, 6)), (g, k)
    # each group's planted lead is found at its own lag
    assert max(got["a"], key=lambda k: got["a"][k][1]) == 2
    assert max(got["b"], key=lambda k: got["b"][k][1]) == 4


def test_cross_correlation_null_group_key_raises(spark):
    import datetime

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        cross_correlation,
    )

    base = datetime.date(2024, 1, 1)
    rows = [("a", base + datetime.timedelta(days=i), i, i) for i in range(5)]
    rows.append((None, base, 1, 1))
    df = spark.createDataFrame(rows, "g string, d date, x long, y long")
    with pytest.raises(Exception, match="NULL group key in g"):
        cross_correlation(df, "d", "x", "y", group_cols=["g"]).collect()


def test_sen_slope_selection_matches_single_sort(spark):
    """The r14 two-phase distributed rank selection (monotone slope
    buckets + cumulative offsets + one-bucket local sort) must pick
    the BIT-IDENTICAL element the old single-partition global sort
    picked. Stress shapes: heavy slope ties (integer steps), a skewed
    slope distribution (most pairs in one bucket), and grouped
    isolation; the python reference computes the lower median of all
    pairwise slopes under the same (slope, ta, tb) tie-break."""
    rng = random.Random(77)
    rows = []
    expect = {}
    series = {
        # heavy ties: x alternates over few values -> many equal slopes
        "t": [rng.choice([0, 5, 10]) for _ in range(60)],
        # skew: one wild excursion concentrates slopes near 0 with a
        # long tail, so the uniform buckets are heavily unbalanced
        "s": [10 * i for i in range(60)],
        # all-equal slopes: width 0 -> the bucket-0 degenerate branch
        "f": [7 * i for i in range(25)],
    }
    series["s"][13] = 9_999_999
    for g, xs in series.items():
        rows += [(g, i, x) for i, x in enumerate(xs)]
        n, m, slope, intercept = _py_sen(xs)
        expect[g] = (n, m, _rnd(slope, 9), _rnd(intercept, 4))
    df = spark.createDataFrame(rows, "g string, d long, x long")
    got = {
        r["g"]: (r["n_points"], r["n_pairs"], r["sen_slope"], r["intercept"])
        for r in sen_slope(df, "d", "x", group_cols=["g"]).collect()
    }
    assert got == expect
    # ungrouped over the skewed series alone
    one = spark.createDataFrame(
        [(i, x) for i, x in enumerate(series["s"])], "d long, x long"
    )
    r = sen_slope(one, "d", "x").collect()[0]
    n, m, slope, intercept = _py_sen(series["s"])
    assert (r["n_points"], r["n_pairs"]) == (n, m)
    assert r["sen_slope"] == _rnd(slope, 9)
    assert r["intercept"] == _rnd(intercept, 4)
