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
