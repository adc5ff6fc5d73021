"""Bench coverage is self-enforcing: every registry entry is timed by
bench.py or sits on the explicit BENCH_SKIP list with a reason — the
r7 verdict's silent-coverage-drift hazard (a new heavy query added to
the registry but never benched would otherwise go unmeasured)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from bangumi_notion_data_integration_project_spark.queries import QUERIES  # noqa: E402


def test_every_registry_entry_is_benched_or_skiplisted():
    missing = [
        q
        for q in QUERIES
        if q not in bench.BENCH_QUERIES and q not in bench.BENCH_SKIP
    ]
    assert not missing, (
        f"registry entries neither benched nor skip-listed: {missing}"
    )


def test_bench_lists_are_well_formed():
    # no dangling names, no duplicates, no overlap, every skip reasoned
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))
    unknown = [q for q in bench.BENCH_QUERIES if q not in QUERIES]
    assert not unknown, f"benched but not registered: {unknown}"
    unknown_skip = [q for q in bench.BENCH_SKIP if q not in QUERIES]
    assert not unknown_skip, f"skip-listed but not registered: {unknown_skip}"
    overlap = set(bench.BENCH_QUERIES) & set(bench.BENCH_SKIP)
    assert not overlap, f"both benched and skip-listed: {overlap}"
    for q, reason in bench.BENCH_SKIP.items():
        assert isinstance(reason, str) and len(reason) >= 10, q


def test_bench_asserts_codegen_cache_sized(spark):
    # The r9 codegen-cache diagnosis (+20% whole-bench from the 100-
    # entry default) must stay guarded: the bench session's cache is
    # sized, and bench.main() carries a startup assert so a foreign
    # session would fail loud instead of silently regressing.
    assert (
        int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 1000
    )
    import inspect

    src = inspect.getsource(bench.main)
    assert "spark.sql.codegen.cache.maxEntries" in src
    assert "cache_entries >= 1000" in src
