"""Crash-safe directory promotion for parquet state targets.

The naive swap (``rmtree(target); os.replace(tmp, target)``) has a
window where a crash leaves NO target at all — and because callers
detect an existing target via ``target/_SUCCESS``, the next run would
silently re-initialize and drop all accumulated state.

``promote_dir`` uses rename-rename-delete instead: the previous state
is moved aside (one atomic rename), the new state is moved in (another
atomic rename), and only then is the old state deleted. A crash at any
point leaves at least one complete state directory on disk, and
``recover_dir`` restores it on the next startup.

This is the documented stand-in for a transactional table format — at
scale the same call sites route to Delta ``MERGE INTO`` and this module
disappears.
"""

from __future__ import annotations

import os
import shutil

_OLD_SUFFIX = ".old"
_TMP_SUFFIX = ".tmp"


def staging_path(target_dir: str) -> str:
    return target_dir.rstrip("/") + _TMP_SUFFIX


def promote_dir(tmp: str, target_dir: str) -> None:
    """Atomically-enough promote ``tmp`` to ``target_dir``:
    rename old aside → rename tmp in → delete old. A crash between any
    two steps leaves a recoverable complete directory (see
    ``recover_dir``)."""
    old = target_dir.rstrip("/") + _OLD_SUFFIX
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target_dir):
        os.replace(target_dir, old)
    os.replace(tmp, target_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def recover_dir(target_dir: str) -> bool:
    """Startup recovery: if ``target_dir`` is missing or incomplete
    (no ``_SUCCESS``) but a complete ``.old`` or ``.tmp`` sibling
    exists, restore it. Returns True if the target is complete after
    recovery."""

    def complete(p: str) -> bool:
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    old = target_dir.rstrip("/") + _OLD_SUFFIX
    tmp = staging_path(target_dir)
    if complete(target_dir):
        # promoted successfully; clear any leftover siblings
        for p in (old, tmp):
            if os.path.exists(p):
                shutil.rmtree(p)
        return True
    for candidate in (tmp, old):  # tmp is newer state than old
        if complete(candidate):
            if os.path.exists(target_dir):
                shutil.rmtree(target_dir)
            os.replace(candidate, target_dir)
            for p in (old, tmp):
                if os.path.exists(p):
                    shutil.rmtree(p)
            return True
    return False
