"""Property tests for the snapshot merge operator (SURVEY §5.2 —
idempotence, delete-when-absent, NA-row passthrough; reference
implement_incremental_load data_loading_to_mysql_database.py:185-277)."""

from __future__ import annotations

from bangumi_notion_data_integration_project_spark.operators.merge import (
    merge_parts,
    merge_snapshot,
)

COLS = ["k", "v"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k: long, v: string")


def test_merge_parts_classification(spark):
    source = _df(spark, [(1, "s1"), (2, "s2"), (None, "sna")])
    target = _df(spark, [(2, "t2"), (3, "t3"), (None, "tna")])
    parts = merge_parts(source, target, "k")
    assert [r["k"] for r in parts["inserts"].collect()] == [1]
    assert [r["k"] for r in parts["deletes"].collect()] == [3]
    assert [r["v"] for r in parts["updates"].collect()] == ["s2"]  # source wins
    assert [r["v"] for r in parts["source_na"].collect()] == ["sna"]


def test_full_sync_equals_source_plus_na(spark):
    # delete-when-absent: final state == source rows + source NA rows
    source = _df(spark, [(1, "a"), (2, "b"), (None, "na")])
    target = _df(spark, [(2, "old"), (9, "gone")])
    out = merge_snapshot(source, target, "k", delete_absent=True)
    got = sorted([(r["k"], r["v"]) for r in out.collect()], key=lambda x: (x[0] is None, x[0]))
    assert got == [(1, "a"), (2, "b"), (None, "na")]


def test_upsert_keeps_absent_target_rows(spark):
    source = _df(spark, [(1, "new")])
    target = _df(spark, [(1, "old"), (9, "keep")])
    out = merge_snapshot(source, target, "k", delete_absent=False)
    got = dict((r["k"], r["v"]) for r in out.collect())
    assert got == {1: "new", 9: "keep"}


def test_merge_idempotent(spark):
    # merging the same snapshot twice is a no-op
    snap = _df(spark, [(1, "a"), (2, "b")])
    once = merge_snapshot(snap, snap, "k", delete_absent=True)
    twice = merge_snapshot(snap, once, "k", delete_absent=True)
    assert sorted((r["k"], r["v"]) for r in twice.collect()) == [(1, "a"), (2, "b")]


def test_initial_load_empty_target(spark):
    source = _df(spark, [(1, "a")])
    target = _df(spark, []).limit(0)
    out = merge_snapshot(source, target, "k", delete_absent=True)
    assert [(r["k"], r["v"]) for r in out.collect()] == [(1, "a")]
