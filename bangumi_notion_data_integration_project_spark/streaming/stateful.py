"""Custom stateful streaming operators via ``applyInPandasWithState``.

Windowed/session aggregations cover time-bucketed state; anything with
per-key *running* semantics (lifetime totals, threshold alerts, decayed
scores) needs an explicit state store. ``applyInPandasWithState`` gives
the Arrow-batched form: state lives in Spark's HDFS-backed state store,
keyed by the group key, and survives restarts through the checkpoint —
each micro-batch hands the operator only that key's new rows.

Scale shape: state is partitioned by the grouping key across executors
(same hash partitioning as a streaming agg), each key's state is a few
scalars, and rows stream through Arrow batches — no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_STATE_SCHEMA = "n bigint, total double, mx double"


def running_totals(events: DataFrame, *, key_col: str = "user_id") -> DataFrame:
    """Per-key lifetime running totals, emitted once per micro-batch in
    update mode: (count, sum, max) over every event the key has EVER
    seen — unbounded lookback that no watermark-windowed agg expresses.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n,
                    "total_value": total,
                    "max_value": mx,
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PEAK_CONCURRENCY_SCHEMA = (
    "event_type string, open_now bigint, max_concurrent bigint"
)
_PEAK_STATE_SCHEMA = "open_ends array<bigint>, peak bigint"


def peak_concurrency_stream(
    events: DataFrame, *, key_col: str = "event_type", duration_minutes: int = 15
) -> DataFrame:
    """Streaming twin of ``operators/intervals.peak_concurrency``: each
    event opens a ``duration_minutes`` interval; per key, track the
    running and peak number of concurrently open intervals.

    State per key is the list of currently-open interval end times
    (bounded by the instantaneous concurrency, NOT the stream length —
    expired ends are dropped every batch) plus the lifetime peak.
    Events sharing a timestamp are applied atomically — expirations
    first, then all starts, then the level is observed — which matches
    the batch sweep's RANGE-frame peer netting exactly, so an in-order
    replay is differential-testable against the batch operator
    (tests/test_streaming.py). Exact for event-time-ordered input
    (e.g. replays, log-shipped partitions); out-of-order arrivals
    within an interval length of the frontier can under-count the peak
    — front the operator with a watermark-sorted stage when that
    matters.
    """
    dur_us = duration_minutes * 60 * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored_ends, peak = state.get
            open_ends = list(stored_ends)
        else:
            open_ends, peak = [], 0
        ts_us: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts_us.extend((pdf["ts"].astype("int64") // 1000).tolist())
        ts_us.sort()
        i = 0
        while i < len(ts_us):
            t = ts_us[i]
            j = i
            while j < len(ts_us) and ts_us[j] == t:
                j += 1
            # atomically: expire ends <= t, open all starts at t, observe
            open_ends = [e for e in open_ends if e > t]
            open_ends.extend([t + dur_us] * (j - i))
            peak = max(peak, len(open_ends))
            i = j
        state.update((open_ends, peak))
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "open_now": len(open_ends),
                    "max_concurrent": peak,
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=PEAK_CONCURRENCY_SCHEMA,
        stateStructType=_PEAK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
