"""Manifest-committed table: atomicity, pruning, merge parity.

The property under test throughout: the visible table is EXACTLY what
the last successfully-renamed MANIFEST references — a crash at any
point before the rename leaves the previous version byte-identical,
and nothing a reader resolves ever depends on cleanup having run.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.manifest_table import (
    ManifestTable,
    merge_into_manifest,
)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def _mk(spark, data):
    return spark.createDataFrame(
        data, "grain string, yr int, k string, v long"
    )


def test_commit_read_roundtrip_and_versioning(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"), ["grain", "yr"])
    assert t.read(spark) is None
    v1 = t.commit(
        _mk(spark, [("day", 2024, "a", 1), ("week", 2024, "b", 2)]),
        meta={"batch_id": 0},
    )
    assert v1 == 1
    assert t.meta() == {"batch_id": 0}
    assert _rows(t.read(spark)) == [
        ("day", 2024, "a", 1),
        ("week", 2024, "b", 2),
    ]
    # second commit replaces ONLY the partition it carries
    v2 = t.commit(_mk(spark, [("day", 2024, "a", 10)]), meta={"batch_id": 1})
    assert v2 == 2
    assert _rows(t.read(spark)) == [
        ("day", 2024, "a", 10),
        ("week", 2024, "b", 2),
    ]
    assert t.meta() == {"batch_id": 1}


def test_metadata_only_commit_advances_version_not_data(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"), ["grain", "yr"])
    t.commit(_mk(spark, [("day", 2024, "a", 1)]), meta={"batch_id": 0})
    v = t.commit(None, meta={"batch_id": 1})
    assert v == 2
    assert t.meta() == {"batch_id": 1}
    assert _rows(t.read(spark)) == [("day", 2024, "a", 1)]


def test_driver_side_pruning_scans_only_selected_dirs(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"), ["grain", "yr"])
    t.commit(
        _mk(
            spark,
            [("day", 2023, "a", 1), ("day", 2024, "b", 2), ("week", 2024, "c", 3)],
        )
    )
    pruned = t.read(spark, partition_filter=lambda v: v["grain"] == "day")
    assert _rows(pruned) == [("day", 2023, "a", 1), ("day", 2024, "b", 2)]
    # objective pruning check: the scan's input files live only under
    # the two selected partition dirs
    m = t.manifest()
    day_dirs = {
        os.path.join(t.table_dir, e["dir"])
        for e in m["partitions"].values()
        if e["values"]["grain"] == "day"
    }
    from urllib.parse import urlparse

    for f in pruned.inputFiles():
        path = urlparse(f).path
        assert any(path.startswith(d + "/") for d in day_dirs), f
    # filter matching nothing keeps the schema, returns no rows
    none = t.read(spark, partition_filter=lambda v: v["grain"] == "nope")
    assert none.columns == ["grain", "yr", "k", "v"]
    assert none.count() == 0


def test_null_partition_value_roundtrip(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"), ["grain", "yr"])
    t.commit(
        spark.createDataFrame(
            [(None, 2024, "a", 1), ("day", None, "b", 2)],
            "grain string, yr int, k string, v long",
        )
    )
    vals = sorted(
        (
            (e["values"]["grain"], e["values"]["yr"])
            for e in t.manifest()["partitions"].values()
        ),
        key=str,
    )
    assert vals == [("day", None), (None, "2024")]
    assert _rows(t.read(spark)) == [("day", None, "b", 2), (None, 2024, "a", 1)]
    only_null = t.read(spark, partition_filter=lambda v: v["grain"] is None)
    assert _rows(only_null) == [(None, 2024, "a", 1)]


def test_drop_partition(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"), ["grain", "yr"])
    t.commit(_mk(spark, [("day", 2024, "a", 1), ("week", 2024, "b", 2)]))
    t.commit(None, drop=[{"grain": "week", "yr": "2024"}])
    assert _rows(t.read(spark)) == [("day", 2024, "a", 1)]


def test_crash_before_swap_leaves_old_version_intact(
    spark, tmp_path, monkeypatch
):
    """Kill the commit after staging + adoption but BEFORE the rename:
    a reader still sees version 1 exactly; gc() reclaims the orphans;
    a retried commit then succeeds normally."""
    t = ManifestTable(str(tmp_path / "t"), ["grain", "yr"])
    t.commit(_mk(spark, [("day", 2024, "a", 1)]), meta={"batch_id": 0})
    before = _rows(t.read(spark))

    real_swap = ManifestTable._swap

    def boom(self, manifest):
        raise OSError("simulated crash at the commit point")

    monkeypatch.setattr(ManifestTable, "_swap", boom)
    with pytest.raises(OSError):
        t.commit(_mk(spark, [("day", 2024, "a", 99)]), meta={"batch_id": 1})
    monkeypatch.setattr(ManifestTable, "_swap", real_swap)

    assert t.manifest()["version"] == 1
    assert t.meta() == {"batch_id": 0}
    assert _rows(t.read(spark)) == before
    # orphaned adopted dirs exist on disk but are invisible; gc removes
    removed = t.gc()
    assert removed
    assert _rows(t.read(spark)) == before
    # retry lands cleanly
    t.commit(_mk(spark, [("day", 2024, "a", 99)]), meta={"batch_id": 1})
    assert _rows(t.read(spark)) == [("day", 2024, "a", 99)]


def test_crash_after_swap_is_fully_committed(spark, tmp_path, monkeypatch):
    """Kill the commit AFTER the rename (cleanup never runs): the new
    version is complete and correct; gc() only removes garbage."""
    t = ManifestTable(str(tmp_path / "t"), ["grain", "yr"])
    t.commit(_mk(spark, [("day", 2024, "a", 1), ("week", 2024, "b", 2)]))

    real_rmtree = __import__(
        "bangumi_notion_data_integration_project_spark.manifest_table",
        fromlist=["shutil"],
    ).shutil.rmtree

    calls = {"n": 0}

    def boom(path, ignore_errors=False):
        calls["n"] += 1
        raise OSError("simulated crash during post-commit cleanup")

    import bangumi_notion_data_integration_project_spark.manifest_table as mt

    monkeypatch.setattr(mt.shutil, "rmtree", boom)
    try:
        with pytest.raises(OSError):
            t.commit(_mk(spark, [("day", 2024, "a", 5)]))
    finally:
        monkeypatch.setattr(mt.shutil, "rmtree", real_rmtree)
    assert calls["n"] == 1
    # the swap happened before cleanup: new data visible and complete
    assert t.manifest()["version"] == 2
    assert _rows(t.read(spark)) == [("day", 2024, "a", 5), ("week", 2024, "b", 2)]
    t.gc()
    assert _rows(t.read(spark)) == [("day", 2024, "a", 5), ("week", 2024, "b", 2)]


def test_torn_manifest_tmp_is_ignored_and_collected(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"), ["grain", "yr"])
    t.commit(_mk(spark, [("day", 2024, "a", 1)]))
    torn = os.path.join(t.table_dir, "MANIFEST.deadbeef.tmp")
    with open(torn, "w") as fh:
        fh.write('{"version": 99, "partiti')  # torn mid-write
    assert t.manifest()["version"] == 1
    assert _rows(t.read(spark)) == [("day", 2024, "a", 1)]
    t.gc()
    assert not os.path.exists(torn)


def test_merge_into_manifest_matches_partitioned_merge(spark, tmp_path):
    """Same upsert semantics as merge_into_partitioned on the same
    inputs: identical final logical table."""
    from bangumi_notion_data_integration_project_spark.operators.merge import (
        merge_into_partitioned,
    )

    base = [
        ("day", 2023, "a", 1),
        ("day", 2024, "b", 2),
        ("week", 2024, "c", 3),
        ("month", 2025, "d", 4),
    ]
    delta = [
        ("day", 2024, "b", 20),  # update in place
        ("day", 2024, "e", 50),  # insert into touched partition
        ("week", 2024, "f", 60),  # insert
    ]
    # hive twin
    hive_dir = str(tmp_path / "hive")
    _mk(spark, base).write.partitionBy("grain", "yr").parquet(hive_dir)
    merge_into_partitioned(
        spark, _mk(spark, delta), hive_dir, "k", ["grain", "yr"],
        delete_absent=False,
    )
    expect = _rows(
        spark.read.parquet(hive_dir).select("grain", "yr", "k", "v")
    )
    # manifest twin
    t = ManifestTable(str(tmp_path / "mt"), ["grain", "yr"])
    t.commit(_mk(spark, base))
    merge_into_manifest(spark, _mk(spark, delta), t, "k")
    got = _rows(t.read(spark).select("grain", "yr", "k", "v"))
    assert got == expect
    # untouched partitions were not rewritten: their dirs carry the v1 txid
    m = t.manifest()
    untouched = [
        e["dir"]
        for e in m["partitions"].values()
        if (e["values"]["grain"], e["values"]["yr"]) in {("day", "2023"), ("month", "2025")}
    ]
    assert untouched and all(d.startswith("data/000001-") for d in untouched)
    touched = [
        e["dir"]
        for e in m["partitions"].values()
        if (e["values"]["grain"], e["values"]["yr"]) not in {("day", "2023"), ("month", "2025")}
    ]
    assert touched and all(d.startswith("data/000002-") for d in touched)


def test_merge_into_manifest_first_commit_bootstraps(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"), ["grain", "yr"])
    merge_into_manifest(
        spark, _mk(spark, [("day", 2024, "a", 1)]), t, "k", meta={"b": 1}
    )
    assert _rows(t.read(spark)) == [("day", 2024, "a", 1)]
    assert t.meta() == {"b": 1}


def test_compact_merges_small_files_preserving_rows_and_meta(spark, tmp_path):
    """compact() rewrites fragmented partitions down to one file each
    through the normal commit path: rows byte-identical, stored commit
    meta (a streaming watermark) carried forward, untouched partitions
    left alone, orphaned fragment dirs reclaimed."""
    t = ManifestTable(str(tmp_path / "t"), ["grain"])
    frag = _mk(
        spark,
        [("day", 2024, f"k{i}", i) for i in range(24)]
        + [("week", 2024, "w", 99)],
    ).repartition(6)
    t.commit(frag, meta={"batch_id": 7})
    m = t.manifest()

    def n_files(key):
        d = os.path.join(t.table_dir, t.manifest()["partitions"][key]["dir"])
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    day_key = json.dumps(["day"])
    week_key = json.dumps(["week"])
    assert n_files(day_key) > 1  # repartition(6) fragments the leaf
    before = _rows(t.read(spark))
    before_week_dir = m["partitions"][week_key]["dir"]

    rewritten = t.compact(spark, min_files=2)
    assert day_key in rewritten
    assert n_files(day_key) == 1
    assert _rows(t.read(spark)) == before
    assert t.meta() == {"batch_id": 7}, "compaction must not wipe the watermark"
    m2 = t.manifest()
    assert m2["version"] == m["version"] + 1
    if week_key not in rewritten:  # single-file partition untouched
        assert m2["partitions"][week_key]["dir"] == before_week_dir

    # idempotent: nothing left to compact
    assert t.compact(spark, min_files=2) == []

    # non-convergent parameterizations are rejected up front
    with pytest.raises(ValueError, match="never converges"):
        t.compact(spark, min_files=2, files_per_partition=2)
    with pytest.raises(ValueError, match=">= 1"):
        t.compact(spark, min_files=2, files_per_partition=0)


def test_compact_occ_never_overwrites_interleaved_commit(spark, tmp_path):
    """The r7 advisory: compact() commits meta captured from the
    snapshot it selected victims from; if a writer commit (e.g. a
    watermark advance) interleaves, that stale meta must NOT silently
    overwrite the newer state. The optimistic-concurrency check aborts
    the stale commit and compact retries from a fresh snapshot."""
    t = ManifestTable(str(tmp_path / "t"), ["grain"])
    frag = _mk(spark, [("day", 2024, f"k{i}", i) for i in range(12)]).repartition(4)
    t.commit(frag, meta={"batch_id": 7})
    before = _rows(t.read(spark))

    # interleave a metadata-only watermark advance between compact's
    # snapshot read and its commit, exactly once
    real_commit = ManifestTable.commit
    fired = {"n": 0}

    def racing_commit(self, updates, **kw):
        if fired["n"] == 0 and kw.get("expect_version") is not None:
            fired["n"] += 1
            real_commit(self, None, meta={"batch_id": 8})
        return real_commit(self, updates, **kw)

    try:
        ManifestTable.commit = racing_commit
        rewritten = t.compact(spark, min_files=2)
    finally:
        ManifestTable.commit = real_commit
    assert rewritten, "retry must converge after the interleaved commit"
    assert _rows(t.read(spark)) == before
    # the NEWER watermark survives — the stale snapshot's meta lost
    assert t.meta() == {"batch_id": 8}

    # with retries exhausted the conflict surfaces loudly
    from bangumi_notion_data_integration_project_spark.manifest_table import (
        ConcurrentCommitError,
    )

    t.commit(
        _mk(spark, [("day", 2024, f"x{i}", i) for i in range(12)]).repartition(4),
        meta={"batch_id": 9},
    )
    fired["n"] = 0
    try:
        ManifestTable.commit = racing_commit
        with pytest.raises(ConcurrentCommitError):
            t.compact(spark, min_files=2, max_retries=0)
    finally:
        ManifestTable.commit = real_commit
    # aborted commit left nothing visible; gc reclaims the staged files
    assert t.meta() == {"batch_id": 8}
    t.gc()
