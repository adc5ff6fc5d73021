"""Crash-safety tests for the rename-rename-delete state promotion."""

from __future__ import annotations

import os

from bangumi_notion_data_integration_project_spark.atomic import (
    promote_dir,
    recover_dir,
    staging_path,
)


def _mk_state(path, marker: str, complete: bool = True):
    os.makedirs(path)
    with open(os.path.join(path, "data"), "w") as f:
        f.write(marker)
    if complete:
        open(os.path.join(path, "_SUCCESS"), "w").close()


def _marker(path) -> str:
    with open(os.path.join(path, "data")) as f:
        return f.read()


def test_promote_replaces_and_cleans(tmp_path):
    target = str(tmp_path / "t")
    _mk_state(target, "v1")
    tmp = staging_path(target)
    _mk_state(tmp, "v2")
    promote_dir(tmp, target)
    assert _marker(target) == "v2"
    assert not os.path.exists(tmp)
    assert not os.path.exists(target + ".old")


def test_recover_noop_when_target_complete(tmp_path):
    target = str(tmp_path / "t")
    _mk_state(target, "v1")
    assert recover_dir(target)
    assert _marker(target) == "v1"


def test_recover_restores_old_after_crash_between_renames(tmp_path):
    # crash window: old was renamed aside, tmp not yet renamed in
    target = str(tmp_path / "t")
    _mk_state(target + ".old", "v1")
    assert recover_dir(target)
    assert _marker(target) == "v1"
    assert not os.path.exists(target + ".old")


def test_recover_prefers_tmp_over_old(tmp_path):
    # tmp (newer state) fully written; crash before any rename
    target = str(tmp_path / "t")
    _mk_state(target + ".old", "v1")
    _mk_state(staging_path(target), "v2")
    assert recover_dir(target)
    assert _marker(target) == "v2"


def test_recover_ignores_incomplete_candidates(tmp_path):
    target = str(tmp_path / "t")
    _mk_state(staging_path(target), "partial", complete=False)
    assert not recover_dir(target)


def test_recover_replaces_incomplete_target(tmp_path):
    target = str(tmp_path / "t")
    _mk_state(target, "broken", complete=False)
    _mk_state(target + ".old", "v1")
    assert recover_dir(target)
    assert _marker(target) == "v1"
