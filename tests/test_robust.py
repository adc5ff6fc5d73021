"""Hampel filter (operators/robust.py): python-reference differential
on random series, planted-spike detection, flat-segment semantics,
edge-row NULLs, grouped windows."""

from __future__ import annotations

import random

from bangumi_notion_data_integration_project_spark.operators.robust import (
    hampel_outliers,
)


def _py_hampel(xs, hw, n_mads):
    out = []
    full = 2 * hw + 1
    rank = (full + 1) // 2
    for i, x in enumerate(xs):
        if i < hw or i >= len(xs) - hw:
            out.append((x, None, None, None))
            continue
        win = sorted(xs[i - hw : i + hw + 1])
        med = win[rank - 1]
        mad = sorted(abs(v - med) for v in win)[rank - 1]
        out.append((x, med, mad, abs(x - med) > n_mads * mad))
    return out


def test_matches_python_reference(spark):
    rng = random.Random(3)
    xs = [rng.randrange(0, 1000) for _ in range(80)]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, x long"
    )
    rows = hampel_outliers(df, "d", "x", half_window=3, n_mads=3).collect()
    want = _py_hampel(xs, 3, 3)
    got = [(r["x"], r["med"], r["mad"], r["is_outlier"]) for r in rows]
    assert got == want


def test_planted_spikes_flagged_and_neighbors_spared(spark):
    xs = [100 + (i % 5) for i in range(40)]
    xs[15] = 10_000  # spike
    xs[30] = -10_000
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, x long"
    )
    rows = hampel_outliers(df, "d", "x", half_window=3, n_mads=3).collect()
    flags = {r["d"]: r["is_outlier"] for r in rows}
    assert flags[15] is True and flags[30] is True
    # the spike sits INSIDE its neighbors' windows but a robust median
    # shrugs it off — no collateral flags anywhere else
    assert all(
        v is not True for k, v in flags.items() if k not in (15, 30)
    )


def test_flat_window_mad_zero_flags_any_deviation(spark):
    xs = [5] * 9 + [6] + [5] * 9
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, x long"
    )
    rows = hampel_outliers(df, "d", "x", half_window=2, n_mads=3).collect()
    by_d = {r["d"]: r for r in rows}
    assert by_d[9]["mad"] == 0 and by_d[9]["is_outlier"] is True


def test_edge_rows_report_null(spark):
    df = spark.createDataFrame(
        [(i, i) for i in range(10)], "d long, x long"
    )
    rows = hampel_outliers(df, "d", "x", half_window=3).collect()
    for r in rows:
        if r["d"] < 3 or r["d"] > 6:
            assert r["med"] is None and r["is_outlier"] is None
        else:
            assert r["is_outlier"] is False  # a line has no outliers


def test_grouped_windows_isolate_keys(spark):
    rows = [("a", i, 100) for i in range(9)] + [("b", i, 100) for i in range(9)]
    rows[4] = ("a", 4, 9000)  # spike only in group a
    df = spark.createDataFrame(rows, "g string, d long, x long")
    got = {
        (r["g"], r["d"]): r["is_outlier"]
        for r in hampel_outliers(
            df, "d", "x", group_cols=["g"], half_window=2, n_mads=3
        ).collect()
    }
    assert got[("a", 4)] is True
    assert all(v is not True for k, v in got.items() if k != ("a", 4))
    # plan: windows keyed on the group
    import re

    out = hampel_outliers(df, "d", "x", group_cols=["g"], half_window=2)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert set(re.findall(r"windowspecdefinition\((\w+)#", plan)) == {"g"}


def test_parameter_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 1)], "d long, x long")
    with pytest.raises(ValueError, match="half_window"):
        hampel_outliers(df, "d", "x", half_window=0)
    with pytest.raises(ValueError, match="n_mads"):
        hampel_outliers(df, "d", "x", n_mads=0)


def test_hampel_duckdb_oracle_shape_cross_engine(spark):
    """The DuckDB restatement (list window + list_sort + rank extract,
    all integers) is bit-equal to the operator on the real daily
    revenue series — the r10 registry oracle, pinned ahead of
    registration (the pacf/textrank de-risk pattern)."""
    import duckdb

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    got = [
        (str(r["d"]), r["x"], r["med"], r["mad"], r["deviation"], r["is_outlier"])
        for r in hampel_outliers(
            daily, "d", "x", half_window=3, n_mads=3
        ).collect()
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    want = [
        (str(d), x, med, mad, dev, out)
        for d, x, med, mad, dev, out in con.execute(
            """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS x
          FROM orders GROUP BY 1
        ), win AS (
          SELECT d, x,
                 CASE WHEN count(*) OVER w7 = 7
                      THEN list_sort(list(x) OVER w7) END AS warr
          FROM daily
          WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING
                        AND 3 FOLLOWING)
        )
        SELECT d, x,
               CAST(warr[4] AS BIGINT) AS med,
               CAST(list_sort(
                      list_transform(warr, v -> abs(v - warr[4])))[4]
                    AS BIGINT) AS mad,
               CAST(abs(x - warr[4]) AS BIGINT) AS deviation,
               CASE WHEN warr IS NOT NULL
                    THEN abs(x - warr[4]) > 3 * list_sort(
                      list_transform(warr, v -> abs(v - warr[4])))[4]
               END AS is_outlier
        FROM win ORDER BY d
        """
        ).fetchall()
    ]
    assert got == want
    assert any(r[5] is not None for r in got)  # full windows exist


def test_null_x_inside_window_reports_null_not_shifted_ranks(spark):
    # r8 ADVICE: count(*) fullness let a NULL x pass the gate while
    # collect_list dropped it, shifting every order statistic. The fix
    # gates on count(x): any window containing the NULL reads NULL.
    xs = [100, 101, 102, None, 104, 105, 106, 107, 108, 109, 110]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, x long"
    )
    rows = hampel_outliers(df, "d", "x", half_window=3, n_mads=3).collect()
    by_d = {r["d"]: r for r in rows}
    # every window touching position 3 (d in 0..6) is not-full -> NULL,
    # as are the usual edge rows
    for d in range(0, 7):
        assert by_d[d]["med"] is None and by_d[d]["is_outlier"] is None
    # the first window clear of the NULL is centered at d=7 (4..10)
    assert by_d[7]["med"] == 107 and by_d[7]["is_outlier"] is False


def test_hampel_grouped_duckdb_oracle_shape_cross_engine(spark):
    """The pinned hampel SQL with PARTITION BY threaded through the
    window — bit-equal to the grouped operator on per-event-type daily
    value cents: the r11 registry oracle (events_type_hampel), pinned
    ahead of registration."""
    import duckdb

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/events.parquet")
    daily = e.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    got = [
        tuple(r)
        for r in hampel_outliers(
            daily, "d", "x", group_cols=["g"], half_window=3, n_mads=3
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
        WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS d,
                 CAST(sum(CAST(round(value * 100) AS BIGINT))
                      AS BIGINT) AS x
          FROM events GROUP BY 1, 2
        ), win AS (
          SELECT g, d, x,
                 CASE WHEN count(x) OVER w7 = 7
                      THEN list_sort(list(x) OVER w7) END AS warr
          FROM daily
          WINDOW w7 AS (PARTITION BY g ORDER BY d
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        )
        SELECT g, d, x,
               CAST(warr[4] AS BIGINT) AS med,
               CAST(list_sort(
                      list_transform(warr, v -> abs(v - warr[4])))[4]
                    AS BIGINT) AS mad,
               CAST(abs(x - warr[4]) AS BIGINT) AS deviation,
               CASE WHEN warr IS NOT NULL
                    THEN abs(x - warr[4]) > 3 * list_sort(
                      list_transform(warr, v -> abs(v - warr[4])))[4]
               END AS is_outlier
        FROM win ORDER BY g, d
        """
        ).fetchall()
    ]
    assert got == want
    assert len({g for g, *_ in got}) == 5  # all five event types


def _py_trimmed(xs, trim, winsorize=False):
    n = len(xs)
    k = (int(round(trim * 1_000_000)) * n) // 1_000_000  # exact floor
    s = sorted(xs)
    if winsorize:
        w = [s[k]] * k + s[k : n - k] + [s[n - k - 1]] * k
        return n, k, sum(w) / len(w)
    kept = s[k : n - k]
    return n, k, sum(kept) / len(kept)


def test_trimmed_and_winsorized_mean_match_python(spark):
    import random

    from bangumi_notion_data_integration_project_spark.operators.robust import (
        trimmed_mean,
    )

    rng = random.Random(95)
    xs = [rng.randrange(0, 40) for _ in range(73)]  # odd n, heavy ties
    xs[5] = 100000  # outlier the trim must shrug off
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    for wz in (False, True):
        r = trimmed_mean(df, "x", trim=0.1, winsorize=wz).collect()[0]
        n, k, want = _py_trimmed(xs, 0.1, winsorize=wz)
        assert (r["n_points"], r["n_trimmed_each"]) == (n, k), wz
        assert r["mean"] == round(want, 6) or abs(r["mean"] - want) < 1e-6, wz
    # the outlier moved the raw mean but not the trimmed one much
    raw = sum(xs) / len(xs)
    t = trimmed_mean(df, "x", trim=0.1).collect()[0]["mean"]
    assert abs(t - 20) < 5 and raw > 1000
    # trim=0 is the plain mean
    r0 = trimmed_mean(df, "x", trim=0.0).collect()[0]
    assert abs(r0["mean"] - raw) < 1e-6
    # exact-floor regression (review find): 0.29*100 = 28.999...96 in
    # IEEE double; k must still be 29, not 28
    df100 = spark.createDataFrame([(i,) for i in range(100)], "x long")
    r29 = trimmed_mean(df100, "x", trim=0.29).collect()[0]
    assert r29["n_trimmed_each"] == 29
    n, k, want = _py_trimmed(list(range(100)), 0.29)
    assert k == 29 and abs(r29["mean"] - want) < 1e-6


def test_trimmed_mean_grouped_and_validation(spark):
    import pytest as _pytest

    from bangumi_notion_data_integration_project_spark.operators.robust import (
        trimmed_mean,
    )

    import random

    rng = random.Random(96)
    rows, series = [], {}
    for g in ("a", "b"):
        xs = [rng.randrange(0, 30) + (500 if g == "b" else 0) for _ in range(40)]
        series[g] = xs
        rows += [(g, x) for x in xs]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {
        r["g"]: r
        for r in trimmed_mean(df, "x", trim=0.2, group_cols=["g"]).collect()
    }
    for g, xs in series.items():
        n, k, want = _py_trimmed(xs, 0.2)
        assert abs(got[g]["mean"] - want) < 1e-6, g
        assert got[g]["n_trimmed_each"] == k, g
    with _pytest.raises(ValueError, match="trim"):
        trimmed_mean(df, "x", trim=0.5)
    bad = spark.createDataFrame([("a", None)], "g string, x long")
    with _pytest.raises(Exception, match="trimmed_mean: NULL value"):
        trimmed_mean(bad, "x", group_cols=["g"]).collect()


def test_trimmed_mean_duckdb_oracle_shape_cross_engine(spark):
    """DuckDB restatement — the identical distinct-value span-overlap
    chain — bit-equal on real daily revenue cents (the r13 registry
    oracle, pinned ahead of registration)."""
    import duckdb

    from pyspark.sql import functions as F

    from bangumi_notion_data_integration_project_spark.operators.robust import (
        trimmed_mean,
    )

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    got = tuple(trimmed_mean(daily, "x", trim=0.1).collect()[0])

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
        ), vc AS (
          SELECT x AS v, CAST(count(*) AS BIGINT) AS c
          FROM daily GROUP BY 1
        ), cum AS (
          SELECT v, c,
                 CAST(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                      PRECEDING AND CURRENT ROW) AS BIGINT) AS cm,
                 CAST(sum(c) OVER () AS BIGINT) AS n
          FROM vc
        ), spans AS (
          SELECT v, c, cm, n,
                 CAST((100000 * n) // 1000000 AS BIGINT) AS k
          FROM cum
        ), kept AS (
          SELECT n, k,
                 CAST(greatest(0, least(cm, n - k)
                      - greatest(cm - c + 1, k + 1) + 1) AS BIGINT)
                   AS m,
                 v
          FROM spans
        )
        SELECT max(n) AS n_points, max(k) AS n_trimmed_each,
               round(CAST(sum(CAST(v AS HUGEINT) * m) AS DOUBLE)
                     / CAST(sum(m) AS DOUBLE), 6) AS mean
        FROM kept
        """
    ).fetchall()[0]
    assert got == tuple(want)
