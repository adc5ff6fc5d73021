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
