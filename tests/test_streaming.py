"""Streaming tests: availableNow micro-batch runs, windowed/session
aggs validated against batch equivalents, foreachBatch upsert state."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.streaming.incremental import (
    read_event_stream,
    sessionized_counts,
    start_streaming_upsert,
    windowed_counts,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("append").parquet(path)


ROWS1 = [
    (1, "2024-01-01 00:05:00", 1, "click", 1.0),
    (2, "2024-01-01 00:20:00", 1, "click", 2.0),
    (3, "2024-01-01 01:10:00", 2, "view", 3.0),
]
ROWS2 = [
    (2, "2024-01-01 02:00:00", 1, "click", 9.0),  # same key → upsert wins
    (4, "2024-01-01 02:30:00", 2, "view", 4.0),
]


def _rows(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, et, v) for (i, ts, u, et, v) in rows], SCHEMA
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_windowed_counts_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    _write_batch(spark, inp, ROWS1)
    stream = read_event_stream(spark, inp, SCHEMA)
    q = (
        windowed_counts(stream, window="1 hour", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == 2
    assert got[("2024-01-01 01:00:00", "view")] == 1


def test_sessionized_counts_runs(spark, tmp_path):
    inp = str(tmp_path / "in")
    _write_batch(spark, inp, ROWS1)
    stream = read_event_stream(spark, inp, SCHEMA)
    q = (
        sessionized_counts(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_agg").collect()
    by_user = {}
    for r in rows:
        by_user[r["user_id"]] = by_user.get(r["user_id"], 0) + 1
    # user 1: events at 00:05 and 00:20 chain into ONE session (gap < 30m)
    assert by_user == {1: 1, 2: 1}


def test_streaming_upsert_two_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    target = str(tmp_path / "target")
    ckpt1 = str(tmp_path / "ckpt1")
    ckpt2 = str(tmp_path / "ckpt2")

    _write_batch(spark, inp, ROWS1)
    q = start_streaming_upsert(
        read_event_stream(spark, inp, SCHEMA), target, "event_id", ckpt1, dedup_order="ts"
    )
    q.awaitTermination(120)
    assert spark.read.parquet(target).count() == 3

    _write_batch(spark, inp, ROWS2)
    q = start_streaming_upsert(
        read_event_stream(spark, inp, SCHEMA), target, "event_id", ckpt2, dedup_order="ts"
    )
    q.awaitTermination(120)
    final = {r["event_id"]: r for r in spark.read.parquet(target).collect()}
    assert set(final) == {1, 2, 3, 4}
    assert final[2]["value"] == 9.0  # batch-2 version won the upsert
    assert os.path.exists(target)
