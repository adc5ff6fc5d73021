"""Batch debounce / throttle: keep an event only if at least ``min_gap_s``
seconds have elapsed since the previously KEPT event of the same key.

This is the classic rate-limit semantics (throttle with leading edge):
the anchor is the last *surviving* event, not the last raw event, so a
burst of events 1 s apart collapses to one survivor per window — a
plain ``lag()`` gap filter cannot express it (its anchor drifts with
every dropped row). The decision for row *i* depends on the keep/drop
decisions of all earlier rows in the key, i.e. a sequential left-to-right
scan per key — exactly the shape of a stateful streaming operator
(``streaming/stateful.py`` is the continuous twin), run here in batch.

Scale shape: the scan is per-key and keys are independent, so the
operator distributes as one shuffle on the key columns followed by an
Arrow-batched ``applyInPandas`` walk of each group. Group size — not
table size — bounds the sequential work; at 100 TB the per-key event
counts are what must stay bounded (they are: per-user-per-type streams),
and a hot key can always be range-split by day first. The Python-side
walk is one native-int scan per group over a bulk-extracted column
(Arrow batch -> list once, no per-row pandas access), not a
row-at-a-time UDF over the table.

Oracle shape (see ``ORACLES['events_debounce']``): a DuckDB recursive
CTE advances one row per key per iteration, carrying the last-kept
epoch — the same fold, replayed in SQL.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def debounce(
    df: DataFrame,
    key_cols: Iterable[str],
    ts_col: str,
    order_cols: Iterable[str],
    min_gap_s: int,
) -> DataFrame:
    """Keep rows whose whole-second timestamp is >= ``min_gap_s`` after
    the previously kept row of the same key; the first row of every key
    is always kept. ``order_cols`` must make the per-key order total
    (e.g. ``[ts, event_id]``) or survivors are not deterministic.

    Timestamps compare in whole seconds (``unix_timestamp`` semantics,
    truncation toward zero) so the gap test is integer-exact across
    engines.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    tagged = df.withColumn("__u", F.unix_timestamp(F.col(ts_col)).cast("long"))

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        u = pdf["__u"].to_numpy().tolist()  # native ints: no numpy boxing in the scan
        keep = [False] * len(u)
        last = None
        for i in range(len(u)):
            if last is None or u[i] - last >= min_gap_s:
                keep[i] = True
                last = u[i]
        return pdf[pd.Series(keep, index=pdf.index)]

    out_schema = tagged.schema
    kept = tagged.groupBy(*key_cols).applyInPandas(walk, schema=out_schema)
    return kept.drop("__u")
