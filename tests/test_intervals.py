"""Property tests for the interval boundary sweep (operators/intervals).

The two-phase (key, day) decomposition must be bit-identical to the
single-phase per-key sweep — that equivalence is the whole claim that
lets the scale path replace the skew-prone form. Both are checked
against an independent pure-Python sweep.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.intervals import (
    peak_concurrency,
)

BASE = dt.datetime(2024, 1, 1)


def py_peak(intervals):
    """Pure-Python sweep with the same peer-group tie semantics: events
    at the same instant net out before the level is observed."""
    out = {}
    by_key = {}
    for k, s, e in intervals:
        by_key.setdefault(k, []).append((s, 1))
        by_key[k].append((e, -1))
    for k, pts in by_key.items():
        net = {}
        for t, d in pts:
            net[t] = net.get(t, 0) + d
        cur, best = 0, None
        for t in sorted(net):
            cur += net[t]
            best = cur if best is None else max(best, cur)
        out[k] = best
    return out


def _mk_intervals(rng, n, max_minutes):
    rows = []
    for i in range(n):
        start = BASE + dt.timedelta(minutes=rng.randint(0, 5000))
        dur = dt.timedelta(minutes=rng.randint(1, max_minutes))
        rows.append((f"k{rng.randint(0, 2)}", start, start + dur))
    return rows


def _spark_peaks(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    got = peak_concurrency(df, "k", F.col("s"), F.col("e"), **kw).collect()
    return {r["k"]: r["max_concurrent"] for r in got}


def test_sweep_matches_python_and_two_phase_is_identical(spark):
    rng = random.Random(7)
    for trial in range(4):
        # long intervals deliberately cross many day boundaries — the
        # decomposition must stay exact when an interval spans days
        rows = _mk_intervals(rng, 60, max_minutes=3000)
        want = py_peak(rows)
        assert _spark_peaks(spark, rows) == want
        assert _spark_peaks(spark, rows, split_by_day=True) == want


def test_sweep_ties_net_out(spark):
    # one interval ends exactly when two start: peer-group (RANGE)
    # semantics count the net level at that instant, i.e. 2, not 3
    t0 = BASE
    rows = [
        ("k", t0, t0 + dt.timedelta(minutes=10)),
        ("k", t0 + dt.timedelta(minutes=10), t0 + dt.timedelta(minutes=20)),
        ("k", t0 + dt.timedelta(minutes=10), t0 + dt.timedelta(minutes=20)),
    ]
    assert _spark_peaks(spark, rows) == {"k": 2}
    assert _spark_peaks(spark, rows, split_by_day=True) == {"k": 2}


def test_sweep_interval_spanning_midnight(spark):
    # carry-in: interval opens 23:50 day 1, closes 00:10 day 2; a second
    # interval overlaps it inside day 2
    rows = [
        ("k", BASE + dt.timedelta(hours=23, minutes=50), BASE + dt.timedelta(hours=24, minutes=10)),
        ("k", BASE + dt.timedelta(hours=24), BASE + dt.timedelta(hours=24, minutes=5)),
    ]
    assert _spark_peaks(spark, rows, split_by_day=True) == {"k": 2}


def py_coverage(rows, dur):
    """Independent pure-Python union-length: materialize covered
    integer seconds per key (durations are small in the test)."""
    by_key = {}
    for k, s in rows:
        by_key.setdefault(k, set()).update(range(s, s + dur))
    merged = {}
    for k, covered in by_key.items():
        pts = sorted(covered)
        n_iv = 1 + sum(
            1 for a, b in zip(pts, pts[1:]) if b > a + 1
        )
        merged[k] = (len(pts), n_iv)
    return merged


def test_interval_coverage_handmade(spark):
    """Overlaps merge (counted once), a gap starts a new interval."""
    from bangumi_notion_data_integration_project_spark.operators.intervals import (
        interval_coverage,
    )

    rows = [
        # user a: [0,100) and [50,150) overlap -> 150s, one interval;
        # [400,500) after a gap -> second interval
        ("a", 0, 1),
        ("a", 50, 2),
        ("a", 400, 3),
        # user b: [0,100), [10,110), [20,120) chain-overlap into one
        # merged interval [0,120) -> each later one adds only 10s
        ("b", 0, 4),
        ("b", 10, 5),
        ("b", 20, 6),
    ]
    df = spark.createDataFrame(rows, "user string, u long, event_id long")
    got = {
        r["user"]: (r["n_rows"], r["n_intervals"], r["covered_s"])
        for r in interval_coverage(
            df, "user", F.col("u"), 100, ["event_id"]
        ).collect()
    }
    assert got == {"a": (3, 2, 250), "b": (3, 1, 120)}


def test_interval_coverage_matches_python(spark):
    rng = random.Random(7)
    rows = [
        (f"u{rng.randrange(5)}", rng.randrange(0, 500))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(k, s, i) for i, (k, s) in enumerate(rows)],
        "user string, u long, event_id long",
    )
    from bangumi_notion_data_integration_project_spark.operators.intervals import (
        interval_coverage,
    )

    got = {
        r["user"]: (r["covered_s"], r["n_intervals"])
        for r in interval_coverage(df, "user", F.col("u"), 37, ["event_id"]).collect()
    }
    want = py_coverage(rows, 37)
    assert got == {k: (c, n) for k, (c, n) in want.items()}


def test_interval_coverage_touching_windows_merge(spark):
    """A window starting exactly where the previous one ends touches
    it: the union is contiguous, so it must count as ONE maximal run
    (and contribute its full length) — the semantics the pure-Python
    contiguity reference and the SQL oracle both pin."""
    from bangumi_notion_data_integration_project_spark.operators.intervals import (
        interval_coverage,
    )

    df = spark.createDataFrame(
        [("a", 0, 1), ("a", 100, 2), ("a", 201, 3)],
        "user string, u long, event_id long",
    )
    [r] = interval_coverage(df, "user", F.col("u"), 100, ["event_id"]).collect()
    # [0,100) + [100,200) touch -> one run; [201,301) starts past 200
    assert (r["n_intervals"], r["covered_s"]) == (2, 300)
