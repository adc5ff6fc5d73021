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


PEAK_CONCURRENCY_WM_SCHEMA = (
    "event_type string, open_now bigint, max_concurrent bigint, "
    "n_pending bigint, n_dropped bigint"
)
_PEAK_WM_STATE_SCHEMA = (
    "buf array<bigint>, open_ends array<bigint>, frontier bigint, "
    "peak bigint, dropped bigint"
)
_FRONTIER_MIN = -(2**62)


def peak_concurrency_stream_watermarked(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    duration_minutes: int = 15,
    lateness_minutes: int = 30,
) -> DataFrame:
    """Out-of-order-tolerant twin of :func:`peak_concurrency_stream`.

    Per key, an application-level watermark ("frontier") trails the
    maximum event time seen by ``lateness_minutes``. Arrivals land in a
    pending buffer; each batch, the buffer's CLOSED portion (ts <=
    frontier) is drained **in event-time order** through the same
    atomic expire→open→observe sweep as the in-order twin, so any
    arrival order with displacement bounded by the lateness produces
    the exact batch answer on the closed portion (differential-tested
    under shuffled replays). Events arriving after their timestamp is
    already closed are counted in ``n_dropped`` — never silently
    mis-merged into a sweep that already passed them.

    The frontier is kept in the operator state rather than
    ``withWatermark`` because the engine watermark is global and
    advances nondeterministically with micro-batch boundaries; the
    per-key frontier makes the closed portion a deterministic function
    of the arrival sequence, which is what a differential property can
    pin down. (Fronting with ``withWatermark`` additionally bounds
    TOTAL state when keys go quiet — compose both in production.)

    State per key: pending buffer (bounded by events within one
    lateness window), open interval ends (bounded by instantaneous
    concurrency), frontier, lifetime peak, dropped count.
    """
    dur_us = duration_minutes * 60 * 1_000_000
    late_us = lateness_minutes * 60 * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf_stored, ends_stored, frontier, peak, dropped = state.get
            buf, open_ends = list(buf_stored), list(ends_stored)
        else:
            buf, open_ends, frontier, peak, dropped = [], [], _FRONTIER_MIN, 0, 0
        new_ts: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                new_ts.extend((pdf["ts"].astype("int64") // 1000).tolist())
        for t in new_ts:
            if t <= frontier:
                dropped += 1  # beyond lateness bound: its sweep already closed
            else:
                buf.append(t)
        if new_ts:
            frontier = max(frontier, max(new_ts) - late_us)
        ready = sorted(t for t in buf if t <= frontier)
        buf = [t for t in buf if t > frontier]
        i = 0
        while i < len(ready):
            t = ready[i]
            j = i
            while j < len(ready) and ready[j] == t:
                j += 1
            open_ends = [e for e in open_ends if e > t]
            open_ends.extend([t + dur_us] * (j - i))
            peak = max(peak, len(open_ends))
            i = j
        state.update((buf, open_ends, frontier, peak, dropped))
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "open_now": len(open_ends),
                    "max_concurrent": peak,
                    "n_pending": len(buf),
                    "n_dropped": dropped,
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=PEAK_CONCURRENCY_WM_SCHEMA,
        stateStructType=_PEAK_WM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


COVERAGE_WM_SCHEMA = (
    "user_id bigint, n_events bigint, n_intervals bigint,"
    " covered_s bigint, n_pending bigint, n_dropped bigint"
)
_COVERAGE_WM_STATE_SCHEMA = (
    "buf array<bigint>, frontier bigint, covered bigint,"
    " n_iv bigint, run_end bigint, dropped bigint, n_seen bigint"
)


def coverage_stream_watermarked(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    duration_s: int = 1800,
    lateness_s: int = 3600,
) -> DataFrame:
    """Streaming twin of ``operators/intervals.interval_coverage``:
    per-key union length of fixed ``[t, t+duration_s)`` activity
    windows, tolerant of out-of-order arrival up to ``lateness_s``.

    Same frontier + pending-buffer design as
    :func:`peak_concurrency_stream_watermarked`: arrivals buffer until
    the per-key event-time frontier (max seen − lateness) passes them,
    then drain in event-time order through the same merge the batch
    operator does — a single running ``run_end``: a drained window
    starting at or before it extends the current maximal run
    (contributing only its overhang), one starting strictly after it
    opens a new run. Whole-second arithmetic and the touching-windows-
    merge rule match the batch operator exactly, which is what the
    closed-portion differential test pins. Events older than the
    frontier at arrival count in ``n_dropped`` — the already-drained
    prefix cannot be re-merged without unbounded state.

    State per key: the pending buffer (bounded by events inside one
    lateness window) plus five scalars. Unlike the sketch twins this
    fold is NOT replay-idempotent by algebra — covered_s is a sum — so
    exactly-once delivery relies on the engine checkpoint, same as the
    concurrency twin.
    """
    late = int(lateness_s)
    dur = int(duration_s)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf_stored, frontier, covered, n_iv, run_end, dropped, n_seen = state.get
            buf = list(buf_stored)
        else:
            buf, frontier, covered, n_iv, run_end, dropped, n_seen = (
                [], _FRONTIER_MIN, 0, 0, _FRONTIER_MIN, 0, 0,
            )
        new_s: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                new_s.extend(
                    (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
                )
        n_seen += len(new_s)
        for t in new_s:
            if t <= frontier:
                dropped += 1  # its stretch of the timeline already drained
            else:
                buf.append(t)
        if new_s:
            frontier = max(frontier, max(new_s) - late)
        ready = sorted(t for t in buf if t <= frontier)
        buf = [t for t in buf if t > frontier]
        for t in ready:
            e = t + dur
            if t > run_end:  # strict: touching windows merge (batch rule)
                n_iv += 1
                covered += dur
                run_end = e
            elif e > run_end:
                covered += e - run_end
                run_end = e
        state.update((buf, frontier, covered, n_iv, run_end, dropped, n_seen))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n_seen,
                    "n_intervals": n_iv,
                    "covered_s": covered,
                    "n_pending": len(buf),
                    "n_dropped": dropped,
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=COVERAGE_WM_SCHEMA,
        stateStructType=_COVERAGE_WM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
