"""Kendall tau-b + Pettitt changepoint + Spearman rho
(operators/stats.py, the r12-prep rank-statistics batch): python-
reference differentials with ties, grouped isolation, degenerate
inputs, and the cross-engine DuckDB oracle shapes pinned ahead of
registration (the pacf/textrank/hampel/psi/trend de-risk pattern)."""

from __future__ import annotations

import math
import random

import pytest

from bangumi_notion_data_integration_project_spark.operators.stats import (
    kendall_tau,
    pettitt_test,
    spearman_rho,
)


def _rnd(x, nd):
    return math.copysign(math.floor(abs(x) * 10**nd + 0.5) / 10**nd, x)


def _py_tau(xs, ys):
    n = len(xs)
    cd = sum(
        ((xs[j] > xs[i]) - (xs[j] < xs[i]))
        * ((ys[j] > ys[i]) - (ys[j] < ys[i]))
        for i in range(n)
        for j in range(i + 1, n)
    )

    def ties2(vs):
        c: dict[int, int] = {}
        for v in vs:
            c[v] = c.get(v, 0) + 1
        return sum(t * (t - 1) for t in c.values())

    tx2, ty2 = ties2(xs), ties2(ys)
    den_x, den_y = n * (n - 1) - tx2, n * (n - 1) - ty2
    tau = (
        2.0 * cd / math.sqrt(float(den_x) * float(den_y))
        if den_x > 0 and den_y > 0
        else None
    )
    return n, cd, tx2 // 2, ty2 // 2, tau


def _py_pettitt(xs):
    n = len(xs)
    us = []
    for t in range(n):
        u = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(t + 1)
            for j in range(t + 1, n)
        )
        us.append(u)
    k = max(abs(u) for u in us)
    cp = next(t for t, u in enumerate(us) if abs(u) == k)
    p = min(1.0, 2.0 * math.exp(-6.0 * k * k / (n**3 + n**2)))
    return n, k, cp, p


def _py_spearman(xs, ys):
    def dbl_ranks(vs):
        return [
            2 * sum(1 for w in vs if w < v)
            + sum(1 for w in vs if w == v)
            + 1
            for v in vs
        ]

    rx, ry = dbl_ranks(xs), dbl_ranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num = n * sxy - sx * sy
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return float(num) / math.sqrt(float(vx) * float(vy))


def test_kendall_tau_matches_python_with_ties(spark):
    rng = random.Random(61)
    xs = [rng.randrange(0, 25) for _ in range(60)]  # heavy ties
    ys = [x * 2 + rng.randrange(0, 30) for x in xs]  # correlated + ties
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(zip(xs, ys))],
        "d long, x long, y long",
    )
    r = kendall_tau(df, "d", "x", "y").collect()[0]
    n, cd, tx, ty, tau = _py_tau(xs, ys)
    assert (
        r["n_points"],
        r["concordant_minus_discordant"],
        r["tie_term_x"],
        r["tie_term_y"],
    ) == (n, cd, tx, ty)
    assert r["tau_b"] == _rnd(tau, 6)
    assert r["tau_b"] > 0.4  # the planted monotone association


def test_kendall_tau_grouped_and_degenerates(spark):
    rng = random.Random(62)
    rows, series = [], {}
    for g, sgn in (("a", 1), ("b", -1)):
        xs = [rng.randrange(0, 100) for _ in range(40)]
        ys = [sgn * x + rng.randrange(0, 10) for x in xs]
        series[g] = (xs, ys)
        rows += [(g, i, x, y) for i, (x, y) in enumerate(zip(xs, ys))]
    rows.append(("c", 1, 5, 7))  # single point: row with NULL tau
    rows += [("e", 1, 3, 9), ("e", 2, 3, 11)]  # constant x: NULL tau
    df = spark.createDataFrame(rows, "g string, d long, x long, y long")
    got = {
        r["g"]: r
        for r in kendall_tau(
            df, "d", "x", "y", group_cols=["g"]
        ).collect()
    }
    assert set(got) == {"a", "b", "c", "e"}
    for g, (xs, ys) in series.items():
        n, cd, tx, ty, tau = _py_tau(xs, ys)
        assert got[g]["concordant_minus_discordant"] == cd, g
        assert got[g]["tau_b"] == _rnd(tau, 6), g
    assert got["a"]["tau_b"] > 0.5 and got["b"]["tau_b"] < -0.5
    assert got["c"]["n_points"] == 1 and got["c"]["tau_b"] is None
    assert got["e"]["tau_b"] is None  # den_x = 0 under the ANSI guard
    # NULL y raises (the dual-series fail-loud convention)
    bad = spark.createDataFrame(
        [(1, 1, 1), (2, 2, None)], "d long, x long, y long"
    )
    with pytest.raises(Exception, match="kendall_tau: NULL y value"):
        kendall_tau(bad, "d", "x", "y").collect()


def test_pettitt_matches_python_and_finds_planted_shift(spark):
    rng = random.Random(63)
    # level shift at t=40 of 60
    xs = [rng.randrange(0, 50) + (1000 if i >= 40 else 0) for i in range(60)]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, x long"
    )
    r = pettitt_test(df, "d", "x").collect()[0]
    n, k, cp, p = _py_pettitt(xs)
    assert (r["n_points"], r["k_stat"], r["change_point"]) == (n, k, cp)
    assert r["p_approx"] == _rnd(p, 6)
    # U peaks at (or within noise-reach of) the last pre-shift period
    assert 36 <= r["change_point"] <= 39
    assert r["p_approx"] < 0.001


def test_pettitt_grouped_isolates_and_degenerates(spark):
    rng = random.Random(64)
    rows, series = [], {}
    for g, at in (("a", 10), ("b", 25)):
        xs = [
            rng.randrange(0, 30) + (500 if i >= at else 0) for i in range(40)
        ]
        series[g] = xs
        rows += [(g, i, x) for i, x in enumerate(xs)]
    rows += [("flat", i, 7) for i in range(10)]  # all-tied: K = 0
    df = spark.createDataFrame(rows, "g string, d long, x long")
    got = {
        r["g"]: r for r in pettitt_test(df, "d", "x", group_cols=["g"]).collect()
    }
    for g, xs in series.items():
        n, k, cp, p = _py_pettitt(xs)
        assert (got[g]["k_stat"], got[g]["change_point"]) == (k, cp), g
        assert got[g]["p_approx"] == _rnd(p, 6), g
    assert got["a"]["change_point"] == 9 and got["b"]["change_point"] == 24
    assert got["flat"]["k_stat"] == 0 and got["flat"]["p_approx"] == 1.0
    # ties in |U|: the FIRST period wins (deterministic tie-break)
    assert got["flat"]["change_point"] == 0


def test_spearman_matches_python_with_ties_and_scipy_shape(spark):
    rng = random.Random(65)
    xs = [rng.randrange(0, 20) for _ in range(50)]  # heavy ties
    ys = [x * 3 + rng.randrange(0, 40) for x in xs]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(zip(xs, ys))],
        "d long, x long, y long",
    )
    r = spearman_rho(df, "d", "x", "y").collect()[0]
    want = _py_spearman(xs, ys)
    assert r["rho"] == _rnd(want, 6)
    assert r["rho"] > 0.5
    # a perfect monotone (but nonlinear) map scores exactly 1
    mono = spark.createDataFrame(
        [(i, i, i * i * i) for i in range(30)], "d long, x long, y long"
    )
    assert spearman_rho(mono, "d", "x", "y").collect()[0]["rho"] == 1.0


def test_spearman_grouped_and_constant_guard(spark):
    rng = random.Random(66)
    rows, series = [], {}
    for g in ("a", "b"):
        xs = [rng.randrange(0, 100) for _ in range(40)]
        ys = [
            (x if g == "a" else -x) + rng.randrange(0, 15) for x in xs
        ]
        series[g] = (xs, ys)
        rows += [(g, i, x, y) for i, (x, y) in enumerate(zip(xs, ys))]
    rows += [("const", i, 5, i) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, d long, x long, y long")
    got = {
        r["g"]: r
        for r in spearman_rho(
            df, "d", "x", "y", group_cols=["g"]
        ).collect()
    }
    for g, (xs, ys) in series.items():
        assert got[g]["rho"] == _rnd(_py_spearman(xs, ys), 6), g
    assert got["const"]["rho"] is None  # zero rank variance
    with pytest.raises(Exception, match="spearman_rho: NULL group key"):
        bad = spark.createDataFrame(
            [(None, 1, 1, 1)], "g string, d long, x long, y long"
        )
        spearman_rho(bad, "d", "x", "y", group_cols=["g"]).collect()


def test_rankcorr_duckdb_oracle_shapes_cross_engine(spark):
    """The DuckDB restatements — pairwise sign-product sum for tau-b,
    the two value-order cumulative windows + time-order running sum
    for Pettitt, doubled tie-average ranks + HUGEINT Pearson moments
    for Spearman — are bit-equal to the operators on the real daily
    order-vs-shipped revenue pair: the r12 registry oracles, pinned
    ahead of registration."""
    import duckdb

    from pyspark.sql import functions as F

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

    got_tau = tuple(kendall_tau(both, "d", "x", "y").collect()[0])
    got_pet = tuple(
        (str(v) if hasattr(v, "isoformat") else v)
        for v in pettitt_test(ox, "d", "x").collect()[0]
    )
    got_rho = tuple(spearman_rho(both, "d", "x", "y").collect()[0])

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want_tau = con.execute(
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
        ), s AS (
          SELECT CAST(coalesce(sum(
                   (CASE WHEN b.x > a.x THEN 1
                         WHEN b.x < a.x THEN -1 ELSE 0 END)
                   * (CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)), 0)
                 AS BIGINT) AS cd
          FROM xy a JOIN xy b ON a.d < b.d
        ), tx AS (
          SELECT CAST(sum(t * (t - 1)) AS BIGINT) AS tx2
          FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM xy GROUP BY x) z
        ), ty AS (
          SELECT CAST(sum(t * (t - 1)) AS BIGINT) AS ty2
          FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM xy GROUP BY y) z
        ), np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM xy)
        SELECT n AS n_points, cd AS concordant_minus_discordant,
               tx2 // 2 AS tie_term_x, ty2 // 2 AS tie_term_y,
               CASE WHEN n * (n - 1) - tx2 > 0
                     AND n * (n - 1) - ty2 > 0 THEN
                 round((2.0 * CAST(cd AS DOUBLE))
                       / sqrt(CAST(n * (n - 1) - tx2 AS DOUBLE)
                              * CAST(n * (n - 1) - ty2 AS DOUBLE)), 6)
               END AS tau_b
        FROM np, s, tx, ty
        """
    ).fetchall()[0]
    assert got_tau == tuple(want_tau)

    want_pet = con.execute(
        """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS x
          FROM orders GROUP BY 1
        ), ranked AS (
          SELECT d,
                 CAST(count(*) OVER () AS BIGINT)
                   - CAST(count(*) OVER (ORDER BY x RANGE BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   - CAST(coalesce(count(*) OVER (ORDER BY x
                       RANGE BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS v,
                 CAST(count(*) OVER () AS BIGINT) AS n
          FROM daily
        ), u AS (
          SELECT d, n,
                 CAST(sum(v) OVER (ORDER BY d ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS uu
          FROM ranked
        ), agg AS (
          SELECT max(n) AS n_points,
                 CAST(max(abs(uu)) AS BIGINT) AS k_stat,
                 min(CASE WHEN abs(uu) = (SELECT max(abs(uu)) FROM u)
                          THEN d END) AS change_point
          FROM u
        )
        SELECT n_points, k_stat, change_point,
               round(least(2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE)
                       * CAST(k_stat AS DOUBLE)
                       / (CAST(n_points AS DOUBLE) * n_points * n_points
                          + CAST(n_points AS DOUBLE) * n_points)),
                     1.0), 6) AS p_approx
        FROM agg
        """
    ).fetchall()[0]
    assert got_pet == tuple(
        (str(v) if hasattr(v, "isoformat") else v) for v in want_pet
    )

    want_rho = con.execute(
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
        ), rk AS (
          SELECT CAST(coalesce(count(*) OVER (ORDER BY x RANGE BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + count(*) OVER (ORDER BY x RANGE BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) + 1
                 AS HUGEINT) AS rx,
                 CAST(coalesce(count(*) OVER (ORDER BY y RANGE BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + count(*) OVER (ORDER BY y RANGE BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) + 1
                 AS HUGEINT) AS ry
          FROM xy
        ), m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(rx) AS sx, sum(ry) AS sy2,
                 sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
                 sum(rx * ry) AS sxy
          FROM rk
        )
        SELECT n AS n_points,
               CASE WHEN n * sxx - sx * sx > 0
                     AND n * syy - sy2 * sy2 > 0 THEN
                 round(CAST(n * sxy - sx * sy2 AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy2 * sy2 AS DOUBLE)), 6)
               END AS rho
        FROM m
        """
    ).fetchall()[0]
    assert got_rho == tuple(want_rho)


from _helpers import py_norm_p as _py_norm_p  # noqa: E402


def test_normal_p_matches_exact_tail_within_as_bound(spark):
    """normal_p_two_sided must sit within the A&S 7.1.26 error bound
    (1.5e-7 on erf) of the EXACT two-sided tail math.erfc(|z|/sqrt 2),
    and match the python replay of the identical polynomial bit-for-
    bit (the cross-engine determinism claim)."""
    from pyspark.sql import functions as F

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        normal_p_two_sided,
    )

    zs = [0.0, 0.5, 1.0, 1.644854, 1.959964, 2.575829, 3.0, -2.0, 4.5]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {
        r["z"]: r["p"]
        for r in df.select(
            "z", normal_p_two_sided(F.col("z")).alias("p")
        ).collect()
    }
    for z in zs:
        # ulp-close to the replay (JVM exp vs libm exp differ by <=1
        # ulp; everything else is the identical op sequence)
        assert abs(got[z] - _py_norm_p(z)) <= 1e-15, z
        exact = math.erfc(abs(z) / math.sqrt(2.0))
        assert abs(got[z] - exact) < 3.0e-7, (z, got[z], exact)
    # the canonical landmarks
    assert abs(got[1.959964] - 0.05) < 1e-5
    assert abs(got[2.575829] - 0.01) < 1e-5


def test_normal_p_sql_twin_is_bit_equal(spark):
    """NORMAL_P_TWO_SIDED_SQL evaluated by DuckDB must equal the Spark
    column after round(.,9) across a dense z grid — the lockstep
    contract a BH-corrected registry oracle will rely on (the psi
    ln()/exp() rounding convention; raw doubles differ by <=1 ulp of
    exp)."""
    import duckdb

    from pyspark.sql import functions as F

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        NORMAL_P_TWO_SIDED_SQL,
        normal_p_two_sided,
    )

    zs = [round(i * 0.013, 6) for i in range(500)]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = [
        round(r["p"], 9)
        for r in df.select(normal_p_two_sided(F.col("z")).alias("p"))
        .orderBy("p")
        .collect()
    ]
    con = duckdb.connect()
    expr = NORMAL_P_TWO_SIDED_SQL.format(z="z")
    want = [
        round(r[0], 9)
        for r in con.execute(
            "SELECT "
            + expr
            + " AS p FROM (SELECT unnest(["
            + ",".join(str(z) for z in zs)
            + "]) AS z) ORDER BY p"
        ).fetchall()
    ]
    # equal after the round(.,9) the registry contract mandates (raw
    # values carry the <=1-ulp JVM-vs-libm exp divergence: measured
    # 141/500 raw mismatches, max 4e-16, zero after rounding)
    assert got == want


def test_bh_select_matches_python_stepup(spark):
    """bh_select implements the step-up rule exactly: ALL ranks <=
    i_max select (including interior ranks whose own p exceeds their
    threshold), NULL p rows never select and don't count toward m."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        bh_select,
    )

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.5]
    rows = [(f"g{i}", p) for i, p in enumerate(ps)] + [("gnull", None)]
    df = spark.createDataFrame(rows, "g string, p double")
    got = {
        r["g"]: r for r in bh_select(df, "p", alpha=0.05, tie_cols=["g"]).collect()
    }
    # python step-up replay
    m = len(ps)
    imax = max(
        (i + 1 for i, p in enumerate(sorted(ps)) if p <= (i + 1) * 0.05 / m),
        default=0,
    )
    want_sel = {f"g{i}" for i, p in enumerate(ps) if sorted(ps).index(p) + 1 <= imax}
    assert {g for g, r in got.items() if r["selected"]} == want_sel
    # structural invariants of the step-up rule:
    sel_ranks = [r["p_rank"] for r in got.values() if r["selected"]]
    unsel = [r["p_rank"] for r in got.values()
             if r["p_rank"] is not None and not r["selected"]]
    if sel_ranks:
        assert max(sel_ranks) < min(unsel)  # step-up is a rank prefix
    assert got["gnull"]["selected"] is False
    assert got["gnull"]["p_rank"] is None
    assert all(r["m_tests"] == 10 for g, r in got.items() if g != "gnull")


def test_bh_over_grouped_mk_pipeline(spark):
    """End-to-end r12 shape: grouped MK per key -> p-values via the
    polynomial tail -> BH selection. Keys with planted trends select;
    pure-noise keys don't (alpha=0.05, 12 keys)."""
    from pyspark.sql import functions as F

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        bh_select,
        mann_kendall,
        normal_p_two_sided,
    )

    rng = random.Random(71)
    rows = []
    trendy = {"t0", "t1", "t2"}
    for g in [f"t{i}" for i in range(3)] + [f"n{i}" for i in range(9)]:
        for i in range(80):
            base = rng.randrange(0, 120)
            rows.append((g, i, base + (4 * i if g in trendy else 0)))
    df = spark.createDataFrame(rows, "g string, d long, x long")
    mk = mann_kendall(df, "d", "x", group_cols=["g"])
    scored = mk.withColumn("p", F.round(normal_p_two_sided(F.col("z")), 9))
    sel = {
        r["g"]: r["selected"]
        for r in bh_select(scored, "p", alpha=0.05, tie_cols=["g"]).collect()
    }
    assert {g for g, s in sel.items() if s} >= trendy
    # no more than one noise key sneaks through at FDR 0.05
    assert len([g for g, s in sel.items() if s and g.startswith("n")]) <= 1


def test_bh_select_requires_tie_cols_on_tied_p(spark):
    """Tied p-values with no tie_cols make the rank window's ordering
    non-total — bh_select must FAIL LOUD (plan-embedded raise) rather
    than return run-dependent p_rank/selected; distinct p-values need
    no tie key."""
    import pytest

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        bh_select,
    )

    tied = spark.createDataFrame(
        [("a", 0.01), ("b", 0.01), ("c", 0.2)], "g string, p double"
    )
    with pytest.raises(Exception, match="tied p-values with no tie_cols"):
        bh_select(tied, "p", alpha=0.05).collect()
    # the same input with a tie key is fine and deterministic
    got = {
        r["g"]: r["p_rank"]
        for r in bh_select(tied, "p", alpha=0.05, tie_cols=["g"]).collect()
    }
    assert got == {"a": 1, "b": 2, "c": 3}

    distinct = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.2)], "g string, p double"
    )
    got2 = {
        r["g"]: r["p_rank"]
        for r in bh_select(distinct, "p", alpha=0.05).collect()
    }
    assert got2 == {"a": 1, "b": 2, "c": 3}
    # NULL p rows don't count toward m and don't trip the dup check
    withnull = spark.createDataFrame(
        [("a", 0.01), ("b", None), ("c", None)], "g string, p double"
    )
    rows = bh_select(withnull, "p", alpha=0.05).collect()
    assert {r["g"]: r["selected"] for r in rows} == {
        "a": True, "b": False, "c": False,
    }


def test_kendall_tie_terms_exact_integer_halving(spark):
    """tie_term_x/y come from shiftright on the doubled (even) sums —
    spot-check the exact values on a series with known tie structure."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        kendall_tau,
    )

    # x ties: one group of 3 and one of 2 → Σt(t−1)/2 = 3 + 1 = 4
    # y ties: one pair → 1
    rows = [
        (1, 10.0, 1.0), (2, 10.0, 2.0), (3, 10.0, 3.0),
        (4, 20.0, 4.0), (5, 20.0, 5.0), (6, 30.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "i long, x double, y double")
    r = kendall_tau(df, "i", "x", "y").collect()[0]
    assert (r["tie_term_x"], r["tie_term_y"]) == (4, 1)
