"""Row-wise REST sink (K4) — the Notion page-insert path, Spark-native.

Reference: iterrows + one POST per row with per-type property
formatting, success/error counters, progress logging
(notion_data_ingestion.py:294-402), retry/backoff (:215-242), and a
soft-delete update (:206-244).

Spark restatement: ``foreachPartition`` — each executor partition gets
one transport (session reuse), posts its rows with the reference's
backoff policy, and reports success/error via accumulators. Property
formatting (P8) is a plain-Python helper mirroring format_property
(:247-291), including its int-vs-float quirk ('.' in str) and the
2000-char rich_text truncation (:258,268).

Transports are injectable; tests use a file-backed fake — no network.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import time
from typing import Any

from pyspark.sql import DataFrame

MAX_RICH_TEXT = 2000  # notion_data_ingestion.py:258,268
MAX_RETRIES = 3
RETRY_BACKOFF = 1.0


def format_property(value: Any, prop_type: str) -> dict | None:
    """Notion property payload for one value (reference format_property
    notion_data_ingestion.py:247-291). None/NaN → None (property omitted,
    :250-251)."""
    if value is None:
        return None
    if isinstance(value, float) and math.isnan(value):
        return None
    if prop_type == "title":
        return {"title": [{"text": {"content": str(value)[:MAX_RICH_TEXT]}}]}
    if prop_type == "rich_text":
        return {"rich_text": [{"text": {"content": str(value)[:MAX_RICH_TEXT]}}]}
    if prop_type == "number":
        # reference quirk (:275): int-vs-float decided by '.' in str(value)
        return {"number": float(value) if "." in str(value) else int(value)}
    if prop_type == "date":
        if isinstance(value, (_dt.datetime, _dt.date)):
            return {"date": {"start": value.isoformat()}}
        return {"date": {"start": str(value)}}
    if prop_type == "checkbox":
        return {"checkbox": bool(value)}
    raise ValueError(f"unsupported property type: {prop_type}")


class FileTransport:
    """Test transport: append each POST payload as a JSON line to a
    per-partition file (local-mode executors share the filesystem)."""

    def __init__(self, out_dir: str, fail_on: frozenset | None = None):
        self.out_dir = out_dir
        self.fail_on = fail_on or frozenset()

    def post_row(self, partition_id: int, payload: dict) -> None:
        key = payload.get("__key")
        if key in self.fail_on:
            raise RuntimeError(f"injected failure for {key}")
        path = f"{self.out_dir}/part-{partition_id}.jsonl"
        with open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(payload, ensure_ascii=False, default=str) + "\n")


class HttpPostTransport:
    """Live transport: POST each payload with backoff (never in tests)."""

    def __init__(self, url: str, headers: dict | None = None):
        self.url = url
        self.headers = headers or {}

    def post_row(self, partition_id: int, payload: dict) -> None:
        import requests

        last: object = None
        for attempt in range(MAX_RETRIES):
            try:
                resp = requests.post(self.url, json=payload, headers=self.headers, timeout=30)
                if resp.status_code == 429:
                    # record the cause so an all-429 run doesn't raise
                    # "...: None"; rate-limit sleeps escalate with the
                    # attempt number instead of a flat 10 s forever
                    last = "rate-limited (HTTP 429)"
                    time.sleep(10.0 * (attempt + 1))
                    continue
                resp.raise_for_status()
                return
            except Exception as e:  # noqa: BLE001
                last = e
                time.sleep(RETRY_BACKOFF * 2**attempt)
        raise RuntimeError(f"REST post failed after {MAX_RETRIES} retries: {last}")


def write_rest(
    df: DataFrame,
    transport,
    property_types: dict[str, str],
    *,
    key_col: str | None = None,
) -> dict[str, int]:
    """Post every row through the transport; returns {'success': n,
    'errors': n} from accumulators (reference counters :388-401)."""
    sc = df.sparkSession.sparkContext
    ok_acc = sc.accumulator(0)
    err_acc = sc.accumulator(0)
    cols = list(property_types.items())

    def post_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nonlocal_ok = 0
        nonlocal_err = 0
        for row in rows:
            # formatting failures (non-numeric string in a 'number'
            # column, unsupported property type) count as row errors,
            # matching the reference's tolerate-and-continue semantics
            # (notion_data_ingestion.py:247-291, 388-401) — one bad row
            # must not kill the whole partition task
            try:
                d = row.asDict()
                payload = {"properties": {}}
                if key_col is not None:
                    payload["__key"] = d.get(key_col)
                for col, ptype in cols:
                    formatted = format_property(d.get(col), ptype)
                    if formatted is not None:
                        payload["properties"][col] = formatted
                transport.post_row(pid, payload)
                nonlocal_ok += 1
            except Exception:  # noqa: BLE001
                nonlocal_err += 1
        ok_acc.add(nonlocal_ok)
        err_acc.add(nonlocal_err)

    df.foreachPartition(post_partition)
    return {"success": ok_acc.value, "errors": err_acc.value}
