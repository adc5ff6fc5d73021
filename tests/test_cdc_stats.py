"""Unit tests for CDC log replay and one-pass exact-moment statistics."""

from __future__ import annotations

import random
import statistics

import pytest
from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.cdc import apply_cdc
from bangumi_notion_data_integration_project_spark.operators.stats import corr_pairs, ols_fit


def _log_frame(spark, rows):
    return spark.createDataFrame(
        rows, "k: long, seq: long, op: string, val: string"
    )


def _python_replay(rows):
    """Reference replay: per key, highest (seq, delete-wins) event."""
    best: dict[int, tuple] = {}
    counts: dict[int, int] = {}
    last: dict[int, int] = {}
    for k, seq, op, val in rows:
        counts[k] = counts.get(k, 0) + 1
        last[k] = max(last.get(k, seq), seq)
        rank = 1 if op == "D" else 0
        if k not in best or (seq, rank) > best[k][:2]:
            best[k] = (seq, rank, op, val)
    return {
        k: (v[3], counts[k], last[k])
        for k, v in best.items()
        if v[2] != "D"
    }


def test_apply_cdc_basic(spark):
    rows = [
        (1, 1, "I", "a"),
        (1, 2, "U", "b"),
        (2, 1, "I", "x"),
        (2, 2, "D", None),
        (3, 1, "I", "only"),
        (4, 1, "I", "dead"),
        (4, 2, "D", None),
        (4, 3, "I", "resurrected"),
    ]
    out = apply_cdc(
        _log_frame(spark, rows), key="k", seq="seq", op="op", payload_cols=["val"]
    )
    got = {r["k"]: (r["val"], r["n_versions"], r["last_seq"]) for r in out.collect()}
    assert got == {1: ("b", 2, 2), 3: ("only", 1, 1), 4: ("resurrected", 3, 3)}


def test_apply_cdc_delete_wins_seq_tie(spark):
    rows = [(1, 1, "I", "a"), (1, 5, "U", "late"), (1, 5, "D", None)]
    out = apply_cdc(
        _log_frame(spark, rows), key="k", seq="seq", op="op", payload_cols=["val"]
    )
    assert out.count() == 0


def test_apply_cdc_randomized_vs_reference(spark):
    rng = random.Random(42)
    rows = []
    seqs: dict[int, int] = {}
    for _ in range(400):
        k = rng.randrange(40)
        seqs[k] = seqs.get(k, 0) + 1
        op = rng.choice(["I", "U", "U", "D"])
        rows.append((k, seqs[k], op, None if op == "D" else f"v{k}.{seqs[k]}"))
    out = apply_cdc(
        _log_frame(spark, rows), key="k", seq="seq", op="op", payload_cols=["val"]
    )
    got = {r["k"]: (r["val"], r["n_versions"], r["last_seq"]) for r in out.collect()}
    assert got == _python_replay(rows)


def test_ols_fit_matches_statistics_module(spark):
    rng = random.Random(7)
    rows = [
        ("g", x := rng.randrange(1, 100), 3 * x + rng.randrange(-20, 21) + 50)
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "grp: string, x: long, y: long")
    got = ols_fit(df, ["grp"], "x", "y").first()
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    slope, intercept = statistics.linear_regression(xs, ys)
    assert got["n"] == 500
    assert got["slope"] == pytest.approx(slope, rel=1e-9)
    assert got["intercept"] == pytest.approx(intercept, rel=1e-9)
    r = statistics.correlation(xs, ys)
    assert got["r2"] == pytest.approx(r * r, rel=1e-9)


def test_ols_fit_zero_variance_group_is_null(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2), ("g", 5, 3)], "grp: string, x: long, y: long"
    )
    got = ols_fit(df, ["grp"], "x", "y").first()
    assert got["slope"] is None and got["r2"] is None


def test_ols_fit_partition_invariant(spark):
    # exact decimal moments ⇒ bit-identical results at any parallelism
    rows = [("g", i % 97, (i * 7919) % 10007) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp: string, x: long, y: long")
    one = ols_fit(df.coalesce(1), ["grp"], "x", "y").first()
    many = ols_fit(df.repartition(32), ["grp"], "x", "y").first()
    assert one["slope"] == many["slope"]  # exact equality, not approx
    assert one["intercept"] == many["intercept"]
    assert one["r2"] == many["r2"]


def test_corr_pairs_matches_statistics_module(spark):
    rng = random.Random(11)
    rows = [
        (x := rng.randrange(100), x + rng.randrange(50), rng.randrange(100))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "a: long, b: long, c: long")
    out = {
        (r["var_x"], r["var_y"]): r["corr"]
        for r in corr_pairs(df, [("a", "b"), ("a", "c"), ("b", "c")]).collect()
    }
    cols = list(zip(*rows))
    for (x, y), (i, j) in {("a", "b"): (0, 1), ("a", "c"): (0, 2), ("b", "c"): (1, 2)}.items():
        expect = statistics.correlation(list(cols[i]), list(cols[j]))
        assert out[(x, y)] == pytest.approx(expect, rel=1e-9)


def test_corr_pairs_single_pass(spark):
    # all pairs must ride one aggregate over one scan: the physical plan
    # contains exactly one pre-explode aggregate pair (partial+final)
    df = spark.createDataFrame([(1, 2, 3)], "a: long, b: long, c: long")
    plan = corr_pairs(df, [("a", "b"), ("a", "c"), ("b", "c")])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2


def test_maintain_grouped_agg_group_migration(spark):
    from bangumi_notion_data_integration_project_spark.operators.cdc import (
        cdc_net,
        maintain_grouped_agg,
    )

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k: long, g: string, v: long"
    )
    old_agg = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n_rows"), F.sum("v").cast("long").alias("total")
    )
    # key 1 migrates a->b with new value; key 3 deleted; key 4 inserted in c
    log = spark.createDataFrame(
        [(1, 1, "U", "b", 15), (3, 1, "D", None, None), (4, 1, "I", "c", 7)],
        "k: long, seq: long, op: string, g: string, v: long",
    )
    net = cdc_net(log, key="k", seq="seq", op="op", payload_cols=["g", "v"])
    out = {
        r["g"]: (r["n_rows"], r["total"])
        for r in maintain_grouped_agg(
            old_agg, base, net, key="k", group_col="g", val_col="v"
        ).collect()
    }
    # a: only key 2 left; b: key 3 deleted, key 1 moved in; c: new key 4
    assert out == {"a": (1, 20), "b": (1, 15), "c": (1, 7)}


def test_apply_cdc_duplicate_seq_ties_are_deterministic(spark):
    # malformed upstream: two different payloads share (key, seq). The
    # winner must be the same on ANY partitioning (payload tiebreak),
    # not whichever row an arbitrary task saw first.
    rows = [(1, 5, "U", "alpha"), (1, 5, "U", "zeta"), (1, 1, "I", "base")]
    outs = set()
    for parts in (1, 2, 3):
        df = spark.createDataFrame(rows, "k: long, seq: long, op: string, val: string").repartition(parts)
        out = apply_cdc(df, key="k", seq="seq", op="op", payload_cols=["val"])
        outs.add(out.first()["val"])
    assert outs == {"zeta"}  # max payload wins the tie, everywhere


def test_maintain_grouped_agg_null_group(spark):
    from bangumi_notion_data_integration_project_spark.operators.cdc import (
        cdc_net,
        maintain_grouped_agg,
    )

    # NULL is a real group for groupBy; the view join must match it
    base = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "b", 30)], "k: long, g: string, v: long"
    )
    old_agg = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n_rows"), F.sum("v").cast("long").alias("total")
    )
    log = spark.createDataFrame(
        [(1, 1, "U", None, 15), (4, 1, "I", None, 7)],
        "k: long, seq: long, op: string, g: string, v: long",
    )
    net = cdc_net(log, key="k", seq="seq", op="op", payload_cols=["g", "v"])
    rows = maintain_grouped_agg(
        old_agg, base, net, key="k", group_col="g", val_col="v"
    ).collect()
    out = {r["g"]: (r["n_rows"], r["total"]) for r in rows}
    # NULL group: keys 1 (now 15), 2 (20), 4 (7) -> (3, 42); exactly ONE row
    assert out == {None: (3, 42), "b": (1, 30)}
    assert len(rows) == 2


# --- CUSUM change-point (closed form vs the textbook recursion) ---


def test_cusum_closed_form_equals_recursion(spark):
    """The window rewrite S_t = P_t - min(0, min P_j) must equal the
    sequential recursion S_t = max(0, S_{t-1} + n*x_t - total) on
    random series — peak value AND argmax (earliest-day tie-break)."""
    import random

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        cusum_peaks,
    )

    rng = random.Random(11)
    rows = []
    series = {}
    for key in ("a", "b", "c"):
        xs = [rng.randint(0, 20) for _ in range(25)]
        series[key] = xs
        for d, x in enumerate(xs):
            # x raw rows per (key, day): the operator sums them itself
            rows.extend((key, d) for _ in range(x))
    df = spark.createDataFrame(rows, "k string, day long")
    got = {
        r["k"]: (r["peak_day"], r["peak_stat"], r["n_periods"])
        for r in cusum_peaks(df, "k", "day", F.lit(1)).collect()
    }
    for key, xs in series.items():
        present = [(d, x) for d, x in enumerate(xs) if x > 0]  # groupBy sees only rows
        n = len(present)
        total = sum(x for _, x in present)
        s, best = 0, None
        for d, x in present:
            s = max(0, s + n * x - total)
            if best is None or s > best[1]:
                best = (d, s)
        assert got[key] == (best[0], best[1], n), key


def test_cusum_detects_injected_level_shift(spark):
    """A mean shift at a known day must place the CUSUM peak inside the
    shifted regime (the detector does its one job)."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        cusum_peaks,
    )

    rows = [("k", d) for d in range(30) for _ in range(5 + (15 if d >= 20 else 0))]
    df = spark.createDataFrame(rows, "k string, day long")
    [r] = cusum_peaks(df, "k", "day", F.lit(1)).collect()
    assert r["peak_day"] == 29  # upward shift accumulates to the end
    assert r["peak_stat"] > 0


# --- hierarchical time rollup ---


def test_rollup_grains_internally_consistent_and_match_direct(spark):
    """Week/month rows derived from day partials must equal a direct
    groupBy of the raw table at each grain, and every grain must
    conserve the global totals."""
    import datetime

    from bangumi_notion_data_integration_project_spark.operators.rollup import (
        hierarchical_time_rollup,
    )

    rows = [
        (datetime.datetime(2024, 1, 1 + (i * 7) % 28, i % 24), (i * 137) % 500 / 100.0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    cents = F.round(F.col("value") * 100, 0)
    out = hierarchical_time_rollup(df, "ts", cents).collect()
    by_grain: dict[str, dict] = {}
    for r in out:
        by_grain.setdefault(r["grain"], {})[r["bucket_start"]] = (
            r["n_events"], r["value_cents"],
        )
    total = (300, sum(int(round(v * 100)) for _, v in rows))
    for g in ("day", "week", "month"):
        assert (
            sum(n for n, _ in by_grain[g].values()),
            sum(c for _, c in by_grain[g].values()),
        ) == total, g
    for grain in ("week", "month"):
        direct = {
            r["b"]: (r["n"], r["c"])
            for r in df.groupBy(
                F.to_date(F.date_trunc(grain, "ts")).alias("b")
            )
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(cents.cast("long")).cast("long").alias("c"),
            )
            .collect()
        }
        assert by_grain[grain] == direct, grain


def test_rollup_refresh_touches_only_delta_buckets(spark):
    """The O(touched) claim, pinned: a delta landing in ONE day must
    produce replacement rows for exactly that day, its week, and its
    month — never a bucket the delta didn't touch — and applying the
    refresh must equal the from-scratch rollup of base+delta."""
    import datetime

    from bangumi_notion_data_integration_project_spark.operators.rollup import (
        apply_rollup_refresh,
        hierarchical_time_rollup,
        rollup_refresh_delta,
    )

    base_rows = [
        (datetime.datetime(2024, 1, 1 + (i * 3) % 28, i % 24), (i * 31) % 400 / 100.0)
        for i in range(200)
    ] + [
        (datetime.datetime(2024, 2, 1 + (i * 5) % 28, i % 24), (i * 17) % 400 / 100.0)
        for i in range(100)
    ]
    delta_rows = [
        (datetime.datetime(2024, 1, 10, h), 1.50) for h in range(6)
    ]  # one touched day: 2024-01-10 (ISO week starting 01-08, month Jan)
    cents = F.round(F.col("value") * 100, 0)
    schema = "ts timestamp, value double"
    base = spark.createDataFrame(base_rows, schema)
    delta = spark.createDataFrame(delta_rows, schema)

    stored = hierarchical_time_rollup(base, "ts", cents)
    refreshed = rollup_refresh_delta(stored, delta, "ts", cents).collect()

    buckets = {(r["grain"], str(r["bucket_start"])) for r in refreshed}
    assert buckets == {
        ("day", "2024-01-10"),
        ("week", "2024-01-08"),
        ("month", "2024-01-01"),
    }, buckets

    want = {
        (r["grain"], r["bucket_start"]): (r["n_events"], r["value_cents"])
        for r in hierarchical_time_rollup(
            spark.createDataFrame(base_rows + delta_rows, schema), "ts", cents
        ).collect()
    }
    got = {
        (r["grain"], r["bucket_start"]): (r["n_events"], r["value_cents"])
        for r in apply_rollup_refresh(
            stored, rollup_refresh_delta(stored, delta, "ts", cents)
        ).collect()
    }
    assert got == want


def test_km_survival_handmade(spark):
    """Textbook KM table: durations [1e, 2c, 3e, 3e, 5c] ->
    S(1) = 4/5, S(3) = 4/5 * (1 - 2/3)."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        km_survival,
    )

    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (3, 1), (5, 0)],
        "duration long, event long",
    )
    rows = [r.asDict() for r in km_survival(df, "duration", "event").collect()]
    assert rows == [
        {"duration": 1, "n_at_risk": 5, "n_events": 1, "survival": 0.8},
        {
            "duration": 3,
            "n_at_risk": 3,
            "n_events": 2,
            "survival": round(0.8 * (1 - 2 / 3), 6),
        },
    ]


def test_km_survival_all_events_reaches_zero(spark):
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        km_survival,
    )

    df = spark.createDataFrame(
        [(d, 1) for d in (1, 2, 2, 4)], "duration long, event long"
    )
    rows = km_survival(df, "duration", "event").collect()
    assert [r["n_at_risk"] for r in rows] == [4, 3, 1]
    assert rows[-1]["survival"] == 0.0


def test_segmented_trend_finds_exact_breakpoint(spark):
    """Noise-free piecewise-linear input: the two-segment fit must
    land exactly on the construction breakpoint with zero SSE and
    recover both slopes."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        segmented_trend,
    )

    # a LEVEL JUMP at the junction so the point at day 30 lies on
    # neither extension - without it both k=29 and k=30 give zero SSE
    rows = [(i, 100 * i) for i in range(1, 31)] + [
        (i, 2000 + 5 * (i - 30)) for i in range(31, 61)
    ]
    df = spark.createDataFrame(rows, "day long, y long")
    [r] = segmented_trend(df, "day", "y").collect()
    assert r["n_points"] == 60
    # SSE is zero on both sides only when the split is at day 30
    # (left fit y=100t exact, right fit y=5t+c exact)
    assert r["breakpoint"] == 30
    assert r["slope_left"] == 100.0
    assert r["slope_right"] == 5.0
    assert r["sse_two"] == 0.0
    assert r["rel_reduction"] == 1.0


def test_segmented_trend_matches_numpy(spark):
    """Random integer series: the chosen breakpoint and SSE must match
    an independent numpy scan over every candidate split."""
    import random

    import numpy as np

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        segmented_trend,
    )

    rng = random.Random(11)
    ys = [rng.randrange(-500, 500) for _ in range(40)]
    df = spark.createDataFrame(
        [(i + 1, y) for i, y in enumerate(ys)], "idx long, y long"
    )
    [r] = segmented_trend(df, "idx", "y", min_seg=3).collect()

    def sse(seg):
        t = np.arange(1, len(seg) + 1, dtype=float)
        y = np.asarray(seg, dtype=float)
        resid = y - np.polyval(np.polyfit(t, y, 1), t)
        return float(resid @ resid)

    best = min(
        (sse(ys[:k]) + sse(ys[k:]), k) for k in range(3, len(ys) - 3 + 1)
    )
    assert r["breakpoint"] == best[1]
    assert abs(r["sse_two"] - best[0]) < 1e-4 * max(1.0, best[0])


def test_km_survival_grouped_matches_global_per_group(spark):
    """The grouped KM must equal the global operator applied to each
    group's rows separately."""
    import random

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        km_survival,
        km_survival_grouped,
    )

    rng = random.Random(5)
    rows = [
        (rng.choice(["x", "y", "z"]), rng.randint(0, 12), rng.randint(0, 1))
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "seg string, duration long, event long")
    got = sorted(
        (r["seg"], r["duration"], r["n_at_risk"], r["n_events"], r["survival"])
        for r in km_survival_grouped(df, ["seg"], "duration", "event").collect()
    )
    want = []
    for seg in ("x", "y", "z"):
        sub = df.filter(F.col("seg") == seg)
        for r in km_survival(sub, "duration", "event").collect():
            want.append(
                (seg, r["duration"], r["n_at_risk"], r["n_events"], r["survival"])
            )
    assert got == sorted(want)


def test_pacf_matches_toeplitz_solve(spark):
    """Durbin-Levinson PACF must match the independent definition: the
    last coefficient of the Yule-Walker solve R_k phi = r for each k
    (numpy Toeplitz system)."""
    import numpy as np

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        pacf_from_acf,
    )

    # a valid ACF sequence: take one from an AR(2)-ish decay
    acf = [0.62, 0.31, 0.12, 0.05, -0.03, -0.07, -0.02]
    df = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(acf)], "lag long, acf double"
    )
    got = {r["lag"]: r["pacf"] for r in pacf_from_acf(df, max_lag=7).collect()}
    full = [1.0] + acf
    for k in range(1, 8):
        R = np.array([[full[abs(i - j)] for j in range(k)] for i in range(k)])
        rhs = np.array(acf[:k])
        want = float(np.linalg.solve(R, rhs)[-1])
        # the operator rounds pacf at 1e-6; the recursion itself is
        # exact to ~1e-16 (verified inline in development)
        assert abs(got[k] - want) < 5.1e-7, (k, got[k], want)


def test_pacf_requires_contiguous_lags(spark):
    import pytest as _pytest

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        pacf_from_acf,
    )

    df = spark.createDataFrame([(1, 0.5), (3, 0.1)], "lag long, acf double")
    with _pytest.raises(ValueError, match="missing lags"):
        pacf_from_acf(df, max_lag=3)


def test_segmented_trend_linear_input_no_divide_by_zero(spark):
    """A perfectly-linear series (sse_single == 0 exactly) must return
    rel_reduction 0, not throw ANSI DIVIDE_BY_ZERO."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        segmented_trend,
    )

    df = spark.createDataFrame(
        [(i, 10 * i) for i in range(1, 13)], "day long, y long"
    )
    [r] = segmented_trend(df, "day", "y").collect()
    assert r["sse_single"] == 0.0
    assert r["rel_reduction"] == 0.0


def test_pacf_rejects_null_and_degenerate_acf(spark):
    import pytest as _pytest

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        pacf_from_acf,
    )

    null_df = spark.createDataFrame(
        [(1, 0.5), (2, None)], "lag long, acf double"
    )
    with _pytest.raises(ValueError, match="NULL at lag 2"):
        pacf_from_acf(null_df, max_lag=2)
    degen = spark.createDataFrame(
        [(1, 1.0), (2, 0.9)], "lag long, acf double"
    )
    with _pytest.raises(ValueError, match="degenerate ACF"):
        pacf_from_acf(degen, max_lag=2)


def test_pacf_unrolled_sql_matches_operator_cross_engine(spark):
    """The generated unrolled Durbin-Levinson SQL replays the operator
    bit-for-bit on DuckDB when both consume the (hash-matched) ACF —
    the exact contract a future registry entry needs (unrolled-
    iteration oracle pattern)."""
    import duckdb

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        pacf_from_acf,
        pacf_unrolled_sql,
    )
    from bangumi_notion_data_integration_project_spark.queries import (
        ORACLES,
        QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    acf = QUERIES["revenue_acf"](spark, sf)
    got = {r["lag"]: r["pacf"] for r in pacf_from_acf(acf, max_lag=7).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    want = dict(
        con.execute(pacf_unrolled_sql(ORACLES["revenue_acf"], 7)).fetchall()
    )
    assert got == want


def test_holt_linear_matches_python_and_recursive_cte(spark):
    """The Spark ordered fold must equal (bit-for-bit, then rounded)
    both a Python replay and the DuckDB RECURSIVE-CTE oracle shape —
    the struct-accumulator list_reduce is NOT used because DuckDB
    1.0.0 mis-folds it (probed; see operator docstring)."""
    import random

    import duckdb

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        holt_linear,
    )

    rng = random.Random(17)
    xs = [rng.randrange(0, 10_000) for _ in range(50)]
    df = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(xs)], "d long, x long"
    )
    [r] = holt_linear(df, "d", "x", horizons=(1, 7)).collect()

    l, b = float(xs[0]), 0.0
    for x in xs[1:]:
        ln = 0.5 * x + 0.5 * (l + b)
        bn = 0.25 * (ln - l) + 0.75 * b
        l, b = ln, bn
    assert (r["level"], r["trend"]) == (round(l, 4), round(b, 4))
    assert r["forecast_h7"] == round(l + 7.0 * b, 4)
    assert r["n_periods"] == 50

    con = duckdb.connect()
    con.execute("CREATE TABLE s (d BIGINT, x BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?)", list(enumerate(xs, 1)))
    got = con.execute(
        """
        WITH RECURSIVE e AS (
          SELECT d, CAST(x AS DOUBLE) AS x,
                 row_number() OVER (ORDER BY d) AS rn FROM s
        ), walk AS (
          SELECT rn, x AS l, CAST(0 AS DOUBLE) AS b FROM e WHERE rn = 1
          UNION ALL
          SELECT e.rn,
                 0.5 * e.x + 0.5 * (w.l + w.b),
                 0.25 * ((0.5 * e.x + 0.5 * (w.l + w.b)) - w.l) + 0.75 * w.b
          FROM walk w JOIN e ON e.rn = w.rn + 1
        )
        SELECT round(l, 4), round(b, 4) FROM walk
        ORDER BY rn DESC LIMIT 1
        """
    ).fetchone()
    assert got == (r["level"], r["trend"])


def test_runs_test_matches_reference(spark):
    """Random labels around the median: run count, moments and z must
    match an independent Python computation (same drop-median-ties
    convention)."""
    import math
    import random

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        runs_test,
    )

    rng = random.Random(13)
    xs = [rng.randrange(0, 1000) for _ in range(101)]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, x long"
    )
    [r] = runs_test(df, "d", "x").collect()

    med = sorted(xs)[(len(xs) + 1) // 2 - 1]  # lower median, rank ceil(n/2)
    labs = [1 if x > med else 0 for x in xs if x != med]
    n, n1 = len(labs), sum(labs)
    n0 = n - n1
    runs = 1 + sum(1 for a, b in zip(labs, labs[1:]) if a != b)
    mu = 2.0 * n1 * n0 / n + 1.0
    var = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
    assert (r["median"], r["n"], r["n_above"], r["n_below"]) == (med, n, n1, n0)
    assert r["n_runs"] == runs
    assert r["expected_runs"] == round(mu, 6)
    assert r["z"] == round((runs - mu) / math.sqrt(var), 6)


def test_runs_test_alternating_and_blocked_extremes(spark):
    """A strictly alternating series maximizes runs (z >> 0); a fully
    blocked one minimizes them (z << 0)."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        runs_test,
    )

    # distinct values so the median-tie drop removes at most one point
    alt = [(i, 1000 + i if i % 2 else i) for i in range(40)]
    [ra] = runs_test(
        spark.createDataFrame(alt, "d long, x long"), "d", "x"
    ).collect()
    blocked = [(i, i if i < 20 else 1000 + i) for i in range(40)]
    [rb] = runs_test(
        spark.createDataFrame(blocked, "d long, x long"), "d", "x"
    ).collect()
    assert ra["n_runs"] > ra["expected_runs"] and ra["z"] > 3
    assert rb["n_runs"] == 2 and rb["z"] < -3


def test_runs_test_degenerate_inputs_stay_ansi_safe(spark):
    """n=0 (everything ties the median / empty input) and n=1 must
    return a well-defined row with NULL moments — not ANSI
    DIVIDE_BY_ZERO, not a fake z=0 'perfectly random' verdict."""
    from bangumi_notion_data_integration_project_spark.operators.stats import (
        runs_test,
    )

    [r] = runs_test(
        spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "d long, x long"),
        "d",
        "x",
    ).collect()
    assert (r["n"], r["expected_runs"], r["z"]) == (0, None, None)
    [r1] = runs_test(
        spark.createDataFrame([(1, 2), (2, 2), (3, 3)], "d long, x long"),
        "d",
        "x",
    ).collect()
    assert (r1["n"], r1["n_runs"], r1["z"]) == (1, 1, None)
    [re_] = runs_test(
        spark.createDataFrame([], "d long, x long"), "d", "x"
    ).collect()
    assert (re_["n"], re_["median"]) == (0, None)


def test_holt_linear_empty_and_null_inputs(spark):
    """Empty input degenerates to an n_periods=0 row with NULL
    level/trend (never an ANSI element_at index error); a NULL x fails
    loudly naming the offending period (the pacf_from_acf
    convention)."""
    import pytest as _pytest

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        holt_linear,
    )

    [r] = holt_linear(
        spark.createDataFrame([], "d long, x long"), "d", "x"
    ).collect()
    # the fold's init is (null level, 0.0 trend); an empty slice
    # returns it unchanged
    assert (r["n_periods"], r["level"], r["trend"]) == (0, None, 0.0)
    with _pytest.raises(Exception, match="NULL x value at 2"):
        holt_linear(
            spark.createDataFrame([(1, 42), (2, None)], "d long, x long"),
            "d",
            "x",
        ).collect()


def test_segmented_trend_grouped_matches_global_per_group(spark):
    """The grouped changepoint fit shares _segmented_core with the
    global operator (the _km_steps pattern), so each group's row must
    be IDENTICAL to running the global operator on that group alone;
    undersized groups (< 2*min_seg rows) produce no row."""
    import pytest as _pytest

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        segmented_trend,
        segmented_trend_grouped,
    )

    rows = []
    # group a: slope +10 then -5 with breakpoint at t=12 (of 24)
    rows += [("a", t, 10 * t if t <= 12 else 120 - 5 * (t - 12)) for t in range(1, 25)]
    # group b: pure noise-free rise, different length
    rows += [("b", t, 3 * t + (7 if t > 9 else 0)) for t in range(1, 19)]
    # group c: undersized (5 rows < 2*min_seg)
    rows += [("c", t, t) for t in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, d long, y long")

    got = {
        r["g"]: tuple(r)[1:]
        for r in segmented_trend_grouped(
            df, ["g"], "d", "y", min_seg=3
        ).collect()
    }
    assert set(got) == {"a", "b"}  # c is undersized -> no row
    for g in ("a", "b"):
        [want] = segmented_trend(
            df.filter(F.col("g") == g).select("d", "y"), "d", "y", min_seg=3
        ).collect()
        assert got[g] == tuple(want), g
    # both k=11 and k=12 split the tent apex into two exact lines
    # (SSE 0 + 0); the (sse, k) total order picks the earlier k
    assert got["a"][0] == 11

    with _pytest.raises(ValueError, match="group_cols"):
        segmented_trend_grouped(df, [], "d", "y")


def test_segmented_trend_grouped_windows_are_key_partitioned(spark):
    """Every window in the grouped plan keys on the group — a dropped
    partition clause would serialize all groups through one task."""
    import re as _re

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        segmented_trend_grouped,
    )

    df = spark.createDataFrame(
        [("a", t, t * 2) for t in range(1, 10)], "g string, d long, y long"
    )
    out = segmented_trend_grouped(df, ["g"], "d", "y", min_seg=3)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    keys = set(_re.findall(r"windowspecdefinition\((\w+)#", plan))
    assert keys == {"g"}, keys


def test_holt_linear_grouped_matches_global_per_group(spark):
    """Grouped Holt shares _holt_core with the global operator: each
    group's row equals running the global fold on that group alone."""
    import random

    import pytest as _pytest

    from bangumi_notion_data_integration_project_spark.operators.stats import (
        holt_linear,
        holt_linear_grouped,
    )

    rng = random.Random(23)
    rows = [
        (g, i + 1, rng.randrange(0, 10_000))
        for g in ("a", "b", "c")
        for i in range(rng.randint(5, 40))
    ]
    df = spark.createDataFrame(rows, "g string, d long, x long")
    got = {
        r["g"]: tuple(r)[1:]
        for r in holt_linear_grouped(
            df, ["g"], "d", "x", horizons=(1, 7)
        ).collect()
    }
    for g in ("a", "b", "c"):
        [want] = holt_linear(
            df.filter(F.col("g") == g).select("d", "x"),
            "d",
            "x",
            horizons=(1, 7),
        ).collect()
        assert got[g] == tuple(want), g

    with _pytest.raises(ValueError, match="group_cols"):
        holt_linear_grouped(df, [], "d", "x")
