"""Streaming interval-coverage twin scale probe.

The twin's (streaming/stateful.coverage_stream_watermarked) 100 TB
claim is (a) state is O(keys), NOT O(events) — per key: one pending
buffer bounded by the events inside ONE lateness window plus five
scalars, so 10× the keys means 10× the state rows and the same bytes
per key, and (b) the closed portion (event time ≤ the per-key
frontier) equals the BATCH interval_coverage over exactly those
events, under out-of-order arrival, at every scale.

Probe: synthetic out-of-order streams (jitter < lateness) with K and
10·K keys at a fixed events-per-key rate, each drained through three
availableNow batches. Reports wall per scale, final state-row count
(= keys seen), max pending-buffer size, and the closed-portion
equality check at BOTH scales.

Run: python tools/scale_probe_coverage.py     (~2-3 min)
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.intervals import (  # noqa: E402
    interval_coverage,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402
from bangumi_notion_data_integration_project_spark.streaming.stateful import (  # noqa: E402
    coverage_stream_watermarked,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
EVENTS_PER_KEY = 40
DURATION_S = 900
LATENESS_S = 1800


def make_rows(n_keys: int, seed: int) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    eid = 0
    for k in range(n_keys):
        for _ in range(EVENTS_PER_KEY):
            m = rng.randint(0, 600)
            rows.append(
                (eid, f"2024-01-01 {m // 60:02d}:{m % 60:02d}:00", k, "e", 0.0)
            )
            eid += 1
    # arrival order: event time + jitter well under the lateness, so
    # nothing can arrive behind an already-drained frontier
    rng.shuffle(rows)
    rows.sort(
        key=lambda r: int(r[1][11:13]) * 60
        + int(r[1][14:16])
        + rng.uniform(-10, 10)
    )
    return rows


def run_scale(spark, n_keys: int, seed: int) -> dict:
    rows = make_rows(n_keys, seed)
    tmp = tempfile.mkdtemp(prefix=f"covprobe_{n_keys}_")
    inp, ckpt = os.path.join(tmp, "in"), os.path.join(tmp, "ckpt")
    emitted: dict[int, tuple] = {}

    def sink(batch, _bid):
        for r in batch.collect():
            emitted[r["user_id"]] = (
                r["n_intervals"],
                r["covered_s"],
                r["n_pending"],
                r["n_dropped"],
            )

    def drain():
        q = (
            coverage_stream_watermarked(
                spark.readStream.schema(SCHEMA).parquet(inp),
                duration_s=DURATION_S,
                lateness_s=LATENESS_S,
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    third = len(rows) // 3
    t0 = time.time()
    for i in range(3):
        hi = None if i == 2 else (i + 1) * third
        chunk = rows[i * third : hi]
        spark.createDataFrame(
            chunk,
            "event_id long, ts string, user_id long, event_type string,"
            " value double",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
            4
        ).write.mode("append").parquet(inp)
        drain()
    wall = time.time() - t0

    # batch truth over the closed portion (ts <= final per-key frontier)
    by_key: dict[int, list[int]] = {}
    for _, ts, uid, _, _ in rows:
        s = (int(ts[11:13]) * 60 + int(ts[14:16])) * 60
        by_key.setdefault(uid, []).append(s)
    frontier = {k: max(v) - LATENESS_S for k, v in by_key.items()}
    closed = [
        r
        for r in rows
        if (int(r[1][11:13]) * 60 + int(r[1][14:16])) * 60 <= frontier[r[2]]
    ]
    want = {
        r["user_id"]: (r["n_intervals"], r["covered_s"])
        for r in interval_coverage(
            spark.createDataFrame(
                closed,
                "event_id long, ts string, user_id long, event_type string,"
                " value double",
            )
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .select(
                "user_id",
                "event_id",
                F.unix_timestamp("ts").cast("long").alias("u"),
            ),
            "user_id",
            F.col("u"),
            DURATION_S,
            ["event_id"],
        ).collect()
    }
    # pending events (open tail) per key must reconcile:
    # n_seen(closed) + n_pending == total per key, nothing dropped
    got = {k: v[:2] for k, v in emitted.items()}
    ok = got == want and all(v[3] == 0 for v in emitted.values())
    max_pending = max(v[2] for v in emitted.values())
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "keys": n_keys,
        "events": len(rows),
        "wall_s": wall,
        "state_rows": len(emitted),
        "max_pending": max_pending,
        "closed_equal": ok,
    }


def main() -> None:
    spark = get_spark("scale_probe_coverage")
    small = run_scale(spark, 500, seed=11)
    big = run_scale(spark, 5000, seed=11)
    for r in (small, big):
        print(
            f"keys={r['keys']} events={r['events']} wall={r['wall_s']:.1f}s "
            f"state_rows={r['state_rows']} max_pending={r['max_pending']} "
            f"closed_equal={r['closed_equal']}"
        )
    ratio = big["wall_s"] / small["wall_s"]
    print(f"wall ratio at 10x keys: {ratio:.1f}x")
    if not (small["closed_equal"] and big["closed_equal"]):
        sys.exit(1)
    if big["state_rows"] != 5000 or small["state_rows"] != 500:
        sys.exit(1)


if __name__ == "__main__":
    main()
