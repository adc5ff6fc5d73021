"""Property tests for the N-step funnel operator (operators/funnel)."""

from __future__ import annotations

import datetime as dt
import random

from bangumi_notion_data_integration_project_spark.operators.funnel import (
    funnel_counts,
    funnel_times,
)

import pytest

BASE = dt.datetime(2024, 3, 1)
STEPS = ["a", "b", "c", "d"]


def py_funnel(rows, steps):
    """Greedy-earliest funnel per key: step i is the earliest event of
    that type strictly after step i-1's timestamp."""
    by_key = {}
    for k, t, s in rows:
        by_key.setdefault(k, []).append((t, s))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        reached = []
        prev = None
        for step in steps:
            cand = [t for t, s in evs if s == step and (prev is None or t > prev)]
            if not cand:
                break
            prev = min(cand)
            reached.append(prev)
        out[k] = reached
    return out


def _mk_rows(rng, n_keys=8, n_events=120):
    rows = []
    for i in range(n_events):
        rows.append(
            (
                f"u{rng.randint(0, n_keys - 1)}",
                BASE + dt.timedelta(minutes=rng.randint(0, 500)),
                rng.choice(STEPS + ["noise"]),
            )
        )
    return rows


def test_funnel_times_match_python(spark):
    rng = random.Random(11)
    for _ in range(3):
        rows = _mk_rows(rng)
        want = py_funnel(rows, STEPS)
        df = spark.createDataFrame(rows, ["k", "t", "s"])
        got = funnel_times(df, "k", "t", "s", STEPS).collect()
        assert len(got) == len(want)
        for r in got:
            times = [r[f"step_{i}"] for i in range(len(STEPS))]
            reached = [t for t in times if t is not None]
            # NULLs must be a suffix (missed step kills the rest)
            assert times[: len(reached)] == reached
            assert reached == want[r["k"]]


def test_funnel_counts_sum_to_times(spark):
    rng = random.Random(12)
    rows = _mk_rows(rng)
    df = spark.createDataFrame(rows, ["k", "t", "s"])
    want = py_funnel(rows, STEPS)
    got = {r["step_index"]: r for r in funnel_counts(df, "k", "t", "s", STEPS).collect()}
    assert got[-1]["n_reached"] == len(want)
    for i, step in enumerate(STEPS):
        assert got[i]["step"] == step
        assert got[i]["n_reached"] == sum(1 for v in want.values() if len(v) > i)
    # monotone non-increasing completion
    counts = [got[i]["n_reached"] for i in range(len(STEPS))]
    assert counts == sorted(counts, reverse=True)


def test_funnel_rejects_empty_steps(spark):
    df = spark.createDataFrame([("u", BASE, "a")], ["k", "t", "s"])
    with pytest.raises(ValueError):
        funnel_times(df, "k", "t", "s", [])
