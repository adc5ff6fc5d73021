"""Batch debounce operator (operators/debounce.py): the anchor must be
the last KEPT row, not the last raw row — differential-tested against a
driver-side reference fold, under shuffled input order."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.debounce import debounce

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(spec):
    """spec: list of (key, offset_s) → rows with deterministic ids."""
    return [
        (i, key, T0 + dt.timedelta(seconds=off))
        for i, (key, off) in enumerate(spec)
    ]


def _reference(spec, gap):
    """Driver-side sequential fold: keep iff >= gap since last kept."""
    by_key: dict[str, list[tuple[int, int]]] = {}
    for i, (key, off) in enumerate(spec):
        by_key.setdefault(key, []).append((off, i))
    kept = set()
    for key, evs in by_key.items():
        last = None
        for off, i in sorted(evs):
            if last is None or off - last >= gap:
                kept.add(i)
                last = off
    return kept


def _run(spark, spec, gap, shuffle=False):
    rows = _rows(spec)
    if shuffle:
        random.Random(7).shuffle(rows)
    df = spark.createDataFrame(rows, "event_id long, key string, ts timestamp")
    out = debounce(df, ["key"], "ts", ["ts", "event_id"], gap)
    return {r.event_id for r in out.collect()}


def test_anchor_is_last_kept_not_last_raw(spark):
    # Burst at 0, 30, 60, 90 s with gap 50: lag-vs-raw keeps {0, 60}
    # via gaps (30,30,30 all < 50 → only first)... the KEPT-anchor walk
    # keeps 0 (anchor 0), drops 30, keeps 60 (60-0>=50? yes), drops 90
    # (90-60=30). A raw-lag filter would keep only 0 — different set.
    spec = [("a", 0), ("a", 30), ("a", 60), ("a", 90)]
    assert _run(spark, spec, 50) == {0, 2}


def test_first_row_per_key_always_kept(spark):
    spec = [("a", 5), ("b", 5), ("c", 5)]
    assert _run(spark, spec, 10_000) == {0, 1, 2}


def test_matches_reference_fold_shuffled_arrival(spark):
    rng = random.Random(13)
    spec = [
        (key, rng.randrange(0, 5000))
        for key in ["a", "b", "c", "d"]
        for _ in range(40)
    ]
    # Duplicate offsets within a key are possible: the (ts, event_id)
    # order makes survivors deterministic; the reference sorts the same
    # (off, i) pairs, so both resolve ties identically.
    gap = 300
    assert _run(spark, spec, gap, shuffle=True) == _reference(spec, gap)


def test_input_order_irrelevant(spark):
    rng = random.Random(99)
    spec = [("k", rng.randrange(0, 2000)) for _ in range(60)]
    assert _run(spark, spec, 100, shuffle=True) == _run(spark, spec, 100)


def test_zero_gap_keeps_everything(spark):
    spec = [("a", 0), ("a", 0), ("a", 1)]
    assert _run(spark, spec, 0) == {0, 1, 2}


def test_whole_second_truncation(spark):
    # 0.9 s apart but in the same whole second → gap 0 < 1 → dropped;
    # unix_timestamp truncation is the cross-engine contract.
    rows = [
        (0, "a", T0 + dt.timedelta(microseconds=50_000)),
        (1, "a", T0 + dt.timedelta(microseconds=950_000)),
        (2, "a", T0 + dt.timedelta(seconds=1, microseconds=100_000)),
    ]
    df = spark.createDataFrame(rows, "event_id long, key string, ts timestamp")
    out = debounce(df, ["key"], "ts", ["ts", "event_id"], 1)
    assert {r.event_id for r in out.collect()} == {0, 2}


def test_random_cases_match_reference_in_one_job(spark):
    """20 random (gap, spec) scenarios, each under its own case key, in
    ONE DataFrame per gap family — broad randomized coverage of the JVM
    fold without 20 Spark jobs. Duplicate offsets and bursts included."""
    rng = random.Random(2024)
    for gap in (1, 60, 500):
        spec = []  # (key, off) with case-disambiguating key
        for case in range(20):
            n = rng.randrange(1, 60)
            base = rng.randrange(0, 3000)
            for _ in range(n):
                # bursts: half the offsets cluster tightly around base
                off = base + (
                    rng.randrange(0, 5 * gap)
                    if rng.random() < 0.5
                    else rng.randrange(0, 5000)
                )
                spec.append((f"c{case}", off))
        assert _run(spark, spec, gap, shuffle=True) == _reference(spec, gap)


def test_null_timestamps_dropped_not_anchor_poison(spark):
    # a kept null would reset the anchor and disable the throttle for
    # the whole key; the contract is: null-ts rows are dropped, the
    # fold over the rest is unaffected
    rows = [
        (0, "a", None),
        (1, "a", T0),
        (2, "a", T0 + dt.timedelta(seconds=30)),
        (3, "a", T0 + dt.timedelta(seconds=60)),
    ]
    df = spark.createDataFrame(rows, "event_id long, key string, ts timestamp")
    out = debounce(df, ["key"], "ts", ["ts", "event_id"], 50)
    assert {r.event_id for r in out.collect()} == {1, 3}
