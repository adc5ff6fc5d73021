"""Streaming KMV set-sketch twin scale probe — the numbers for
SCALING.md's three-sketch algebra story (quantile / HLL / KMV).

The twin's (streaming/incremental.start_streaming_set_sketch) 100 TB
claim is algebraic: the stored table is a pure function of the union
of distinct (key, hash) pairs seen, so (a) state is O(k · keys)
regardless of history, (b) a checkpoint-wipe FULL replay re-absorbs
every row as a no-op — the kept set is bit-identical, with no batch-id
watermark or manifest machinery, and (c) post-replay arrivals merge in
exactly as if the wipe never happened. Per batch the work is one
map-side distinct over the batch plus a (≤ 2k per key)-row merge.

Probe: synthetic streams at K and 10·K keys (fixed ids-per-key rate,
id cardinality above k so the estimator path is live), each drained
through three availableNow batches. Reports wall per scale, state
rows, then — at the large scale — the wipe-replay identity and the
post-replay-arrival differential against the batch ``set_sketch`` over
the full corpus.

Run: python tools/scale_probe_setsketch_stream.py     (~3 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.operators.setsketch import (  # noqa: E402
    set_sketch,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402
from bangumi_notion_data_integration_project_spark.streaming.incremental import (  # noqa: E402
    start_streaming_set_sketch,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
K = 64
IDS_PER_KEY = 600  # distinct user ids per key: 211 > k -> estimator live


def make_rows(n_keys: int) -> list[tuple]:
    rows = []
    eid = 0
    for g in range(n_keys):
        for i in range(IDS_PER_KEY):
            rows.append(
                (eid, "2024-01-01 00:00:00", i % 211, f"k{g:04d}", 1.0)
            )
            eid += 1
    return rows


def write_chunk(spark, inp: str, chunk: list[tuple]) -> None:
    spark.createDataFrame(
        chunk,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
        4
    ).write.mode("append").parquet(inp)


def drain(spark, inp: str, sk_dir: str, ckpt: str) -> None:
    q = start_streaming_set_sketch(
        spark.readStream.schema(SCHEMA).parquet(inp),
        sk_dir,
        id_cols=["user_id"],
        k=K,
        key_cols=["event_type"],
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(300)


def stored(spark, sk_dir: str):
    return sorted(
        (r["event_type"], r["__ss_h"])
        for r in spark.read.parquet(sk_dir).collect()
    )


def direct(spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    )
    return sorted(
        (r["event_type"], r["__ss_h"])
        for r in set_sketch(df, ["event_type"], ["user_id"], k=K).collect()
    )


def run_scale(spark, n_keys: int) -> tuple[float, int, str]:
    rows = make_rows(n_keys)
    tmp = tempfile.mkdtemp(prefix=f"ssprobe_{n_keys}_")
    inp, sk_dir, ckpt = (
        os.path.join(tmp, "in"),
        os.path.join(tmp, "sketch"),
        os.path.join(tmp, "ckpt"),
    )
    third = len(rows) // 3
    t0 = time.time()
    for i in range(3):
        hi = None if i == 2 else (i + 1) * third
        write_chunk(spark, inp, rows[i * third : hi])
        drain(spark, inp, sk_dir, ckpt)
    wall = time.time() - t0
    n_state = spark.read.parquet(sk_dir).count()
    return wall, n_state, tmp


def main() -> None:
    spark = get_spark("scale_probe_setsketch_stream")
    w1, s1, _ = run_scale(spark, 40)
    w10, s10, tmp10 = run_scale(spark, 400)
    print(
        f"1x  (40 keys, {40 * IDS_PER_KEY} rows): wall {w1:.1f}s,"
        f" state rows {s1}"
    )
    print(
        f"10x (400 keys, {400 * IDS_PER_KEY} rows): wall {w10:.1f}s"
        f" ({w10 / w1:.1f}x), state rows {s10} ({s10 / s1:.1f}x)"
    )

    # wipe-replay identity + post-replay arrivals at the large scale
    inp = os.path.join(tmp10, "in")
    sk_dir = os.path.join(tmp10, "sketch")
    ckpt = os.path.join(tmp10, "ckpt")
    rows = make_rows(400)
    before = stored(spark, sk_dir)
    shutil.rmtree(ckpt)
    t0 = time.time()
    drain(spark, inp, sk_dir, ckpt)
    t_replay = time.time() - t0
    assert stored(spark, sk_dir) == before, "wipe-replay changed the kept set"
    print(f"checkpoint-wipe FULL replay: {t_replay:.1f}s, kept set identical")

    extra = [
        (10_000_000 + i, "2024-01-02 00:00:00", 300 + i, f"k{i % 400:04d}", 1.0)
        for i in range(4000)
    ]
    write_chunk(spark, inp, extra)
    drain(spark, inp, sk_dir, ckpt)
    assert stored(spark, sk_dir) == direct(spark, rows + extra), (
        "post-replay arrivals diverged from the batch build"
    )
    print("post-replay arrivals: stored == batch set_sketch over full corpus")


if __name__ == "__main__":
    main()
