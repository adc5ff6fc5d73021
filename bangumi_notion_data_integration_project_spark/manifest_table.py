"""Manifest-committed partitioned parquet table — atomic multi-partition
overwrite on a plain filesystem.

:func:`..operators.merge.merge_into_partitioned` (the dynamic-overwrite
MERGE used by the reference-shaped sync, vs the reference's whole-table
``if_exists='replace'`` rewrite, data_loading_to_mysql_database.py:268)
has one residual durability window: Spark's dynamic partition overwrite
commits each touched partition directory independently, so a crash
mid-job can leave SOME touched partitions replaced and others stale —
a mixed-vintage table no reader can detect. The streaming rollup twin
(``streaming/incremental.start_streaming_time_rollup_partitioned``)
papers over it with a fail-loud replay guard that proves full commit
key-by-key; this module removes the window instead, with the mechanism
every transactional table format (Iceberg, Delta) uses: data files are
immutable and unreferenced until a SINGLE small metadata file is
swapped by an atomic rename.

Layout::

    table_dir/
      MANIFEST            <- JSON; the one-file commit point
      staging/<txid>/     <- in-flight hive-partitioned write (orphaned
                             by a crash, reclaimed by gc(), never read)
      data/<txid>/<n>/    <- immutable per-partition data dirs; plain
                             parquet files carrying the FULL schema

A commit stages all touched partitions in ONE Spark job, moves each
staged partition dir under ``data/``, then atomically renames a new
``MANIFEST`` into place.  Readers resolve live partition dirs through
the manifest only, so they see the old table until the rename and the
complete new table after it — never a mix.  Because data files keep
their real columns (the hive write runs on *duplicated* shadow
columns), a read is a plain multi-path parquet scan with no partition
value reconstruction.

The manifest doubles as partition-level metadata (Iceberg-style):
``read(partition_filter=...)`` prunes directories on the DRIVER from
the manifest's decoded partition values — the scan never lists, let
alone reads, a pruned partition.  At 100 TB the manifest stays
O(live partitions), a few MB of JSON; beyond that the same design
splits it into manifest files per partition range, which is exactly
the Iceberg manifest-list layering and out of scope here.

Commit metadata: ``commit(..., meta=...)`` stores a small user dict in
the manifest itself, so bookkeeping like a streaming batch watermark
commits ATOMICALLY with the data it describes — the property that
makes ``streaming/incremental.start_streaming_time_rollup_manifest``'s
replay guard exact where the plain-parquet twin's can only fail
loudly on a detected partial commit.

Commit-point filesystem contract: the atomic rename exists on POSIX
filesystems, HDFS, and ABFS — NOT on S3, where object "rename" is
copy+delete. There the manifest swap must become a conditional put
(If-None-Match on a versioned manifest key) or a catalog commit,
which is precisely why Iceberg commits through a catalog rather than
the object store; the data-dir layout and everything else here is
store-agnostic.

Concurrency contract: single writer (the streaming fold / merge job),
snapshot-isolated readers.  ``gc()`` and the post-commit cleanup
delete directories no longer referenced by the CURRENT manifest; in a
multi-reader production deployment that cleanup runs behind a
retention window (Iceberg ``expire_snapshots`` semantics) instead of
immediately.
"""

from __future__ import annotations

import json
import os
import secrets
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "MANIFEST"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_SHADOW = "__mp_"  # shadow partition-column prefix for the hive write


class ConcurrentCommitError(RuntimeError):
    """Raised when a commit carrying ``expect_version`` finds the
    manifest advanced past that version — another writer interleaved.
    The table is untouched (nothing swapped; staged files are
    unreferenced and :func:`ManifestTable.gc` reclaims them)."""


def _unescape(token: str) -> str | None:
    """Decode one hive partition-value token (``%xx`` escapes applied
    by Spark's path escaping; the null sentinel becomes None)."""
    if token == _HIVE_NULL:
        return None
    from urllib.parse import unquote

    return unquote(token)


class ManifestTable:
    """A partitioned parquet table whose visible state is defined by
    one atomically-swapped JSON manifest. See the module docstring."""

    def __init__(self, table_dir: str, partition_cols: list[str]):
        if not partition_cols:
            raise ValueError("a manifest table needs >= 1 partition column")
        self.table_dir = table_dir.rstrip("/")
        self.partition_cols = list(partition_cols)

    # -- manifest I/O -------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.table_dir, _MANIFEST)

    def manifest(self) -> dict | None:
        """The current committed manifest, or None before the first
        commit. A torn ``.tmp`` sibling is never read — only the
        atomically-renamed ``MANIFEST`` defines table state."""
        try:
            with open(self._manifest_path) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def meta(self) -> dict:
        m = self.manifest()
        return {} if m is None else dict(m.get("meta") or {})

    def _swap(self, manifest: dict) -> None:
        """The commit point: write the manifest beside the target and
        atomically rename it in. fsync file and directory so the
        rename is durable before any cleanup deletes old data."""
        os.makedirs(self.table_dir, exist_ok=True)
        tmp = self._manifest_path + "." + secrets.token_hex(4) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._manifest_path)
        try:  # best-effort directory-entry durability (POSIX)
            dfd = os.open(self.table_dir, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass

    # -- write path ---------------------------------------------------

    def commit(
        self,
        updates: DataFrame | None,
        *,
        drop: "list[dict] | None" = None,
        meta: dict | None = None,
        expect_version: int | None = None,
    ) -> int:
        """Atomically replace every partition present in ``updates``
        (dynamic-partition-overwrite semantics), drop the partitions
        named by ``drop`` (decoded-value dicts), and store ``meta`` in
        the manifest. Returns the new version.

        All staged data becomes visible at one ``os.replace`` of the
        manifest; a crash anywhere before that leaves the table
        byte-identical to the previous version (staged files are
        unreferenced), and a crash after it leaves the new version
        complete (cleanup of now-orphaned old dirs is deferred work
        :func:`gc` finishes).  ``updates=None`` / no staged rows is a
        metadata-only commit — e.g. advancing a stream watermark for
        an empty batch — and costs one small file rename.

        ``expect_version`` makes the commit optimistic-concurrency
        checked: if the manifest version at entry OR immediately before
        the swap differs, :class:`ConcurrentCommitError` is raised and
        nothing becomes visible. Read-modify-write callers (compact)
        pass the version of the snapshot they read. Scope of the
        guarantee: this guards SINGLE-DRIVER interleavings (two commit
        paths racing inside one Spark application — the case the tests
        pin); the re-check and :meth:`_swap` are not one atomic step,
        so a genuinely concurrent writer in another process can still
        land between the final re-read and ``os.replace`` and be
        overwritten. Multi-process writers need an external lock (or a
        rename-based ``O_EXCL`` version file) — see DEPLOYMENT.md;
        at 100 TB the single-writer-per-table rule is the norm anyway
        (Iceberg/Delta put this CAS in a catalog, not the filesystem).
        """
        prior = self.manifest()
        if expect_version is not None:
            pv = 0 if prior is None else int(prior["version"])
            if pv != int(expect_version):
                raise ConcurrentCommitError(
                    f"manifest at version {pv}, expected {expect_version}"
                )
        version = 1 if prior is None else int(prior["version"]) + 1
        txid = f"{version:06d}-{secrets.token_hex(4)}"
        new_parts: dict[str, dict] = {}
        if updates is not None:
            staging = os.path.join(self.table_dir, "staging", txid)
            staged = updates
            shadows = []
            for c in self.partition_cols:
                staged = staged.withColumn(_SHADOW + c, F.col(c))
                shadows.append(_SHADOW + c)
            staged.write.mode("errorifexists").partitionBy(*shadows).parquet(
                staging
            )
            if not os.path.exists(os.path.join(staging, "_SUCCESS")):
                raise RuntimeError(
                    f"staged write at {staging} left no _SUCCESS marker"
                )
            new_parts = self._adopt_staged(staging, txid)
        parts: dict[str, dict] = (
            {} if prior is None else dict(prior["partitions"])
        )
        replaced = [
            parts.pop(k)["dir"] for k in list(parts) if k in new_parts
        ]
        for d in drop or []:
            key = self._key_for_values(d)
            if key in parts:
                replaced.append(parts.pop(key)["dir"])
        parts.update(new_parts)
        if expect_version is not None:
            # re-check right before the swap: the staged write above
            # takes long enough for another writer to land a commit
            cur = self.manifest()
            cv = 0 if cur is None else int(cur["version"])
            if cv != int(expect_version):
                raise ConcurrentCommitError(
                    f"manifest advanced to version {cv} during commit,"
                    f" expected {expect_version}"
                )
        self._swap(
            {"version": version, "partitions": parts, "meta": meta or {}}
        )
        # Post-commit cleanup of dirs orphaned by THIS swap. Failure
        # here never corrupts — gc() reclaims later.
        for rel in replaced:
            shutil.rmtree(os.path.join(self.table_dir, rel), ignore_errors=True)
        staging_root = os.path.join(self.table_dir, "staging", txid)
        shutil.rmtree(staging_root, ignore_errors=True)
        return version

    def _key_for_values(self, values: dict) -> str:
        # JSON list, not a path-style join: a value containing "/" or
        # "=" can never alias another partition's key.
        return json.dumps(
            [values.get(c) for c in self.partition_cols]
        )

    def _adopt_staged(self, staging: str, txid: str) -> dict[str, dict]:
        """Move each staged hive leaf dir under ``data/<txid>/<n>`` and
        return manifest entries for them. Plain renames inside one
        filesystem; NOT the commit point — a crash mid-way only
        orphans files that no manifest references."""
        leaves: list[tuple[str, dict]] = []

        def walk(path: str, depth: int, values: dict) -> None:
            if depth == len(self.partition_cols):
                leaves.append((path, values))
                return
            want = _SHADOW + self.partition_cols[depth] + "="
            for name in sorted(os.listdir(path)):
                if name.startswith(want):
                    walk(
                        os.path.join(path, name),
                        depth + 1,
                        {
                            **values,
                            self.partition_cols[depth]: _unescape(
                                name[len(want):]
                            ),
                        },
                    )

        walk(staging, 0, {})
        out: dict[str, dict] = {}
        data_root = os.path.join(self.table_dir, "data", txid)
        os.makedirs(data_root, exist_ok=True)
        for i, (leaf, values) in enumerate(leaves):
            rel = os.path.join("data", txid, str(i))
            os.replace(leaf, os.path.join(self.table_dir, rel))
            out[self._key_for_values(values)] = {
                "values": values,
                "dir": rel,
            }
        # Power-loss durability: the manifest swap fsyncs itself, but a
        # durable MANIFEST must never reference data bytes the OS never
        # flushed (post-commit cleanup deletes the old dirs, so a torn
        # data file would be unrecoverable). fsync every adopted file
        # and directory BEFORE commit() reaches the swap. On a DFS /
        # object store the close-to-visible durability contract makes
        # this a no-op-by-ownership; locally it closes the window.
        self._fsync_tree(data_root)
        try:  # the data/ dir entry naming the new txid dir
            fd = os.open(os.path.dirname(data_root), os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        except OSError:
            pass
        return out

    @staticmethod
    def _fsync_tree(root: str) -> None:
        """fsync every regular file and directory under ``root``
        (bottom-up so directory entries are flushed after their
        contents). Best-effort on filesystems that reject fsync."""
        for dirpath, _dirnames, filenames in os.walk(root, topdown=False):
            for name in filenames:
                try:
                    fd = os.open(os.path.join(dirpath, name), os.O_RDONLY)
                    try:
                        os.fsync(fd)
                    finally:
                        os.close(fd)
                except OSError:
                    pass
            try:
                fd = os.open(dirpath, os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
            except OSError:
                pass

    # -- read path ----------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        partition_filter: "Callable[[dict], bool] | None" = None,
    ) -> DataFrame | None:
        """The committed table (or the partitions whose decoded-value
        dict passes ``partition_filter``) as a plain parquet scan over
        exactly the live directories — pruning happens on the driver
        from manifest metadata, so a pruned partition is never even
        listed. Returns None before the first data commit."""
        m = self.manifest()
        if m is None or not m["partitions"]:
            return None
        entries = list(m["partitions"].values())
        picked = [
            e
            for e in entries
            if partition_filter is None or partition_filter(e["values"])
        ]
        if not picked:  # preserve schema: empty slice of one live dir
            only = spark.read.parquet(
                os.path.join(self.table_dir, entries[0]["dir"])
            )
            return only.filter(F.lit(False))
        return spark.read.parquet(
            *[os.path.join(self.table_dir, e["dir"]) for e in picked]
        )

    # -- maintenance --------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        *,
        min_files: int = 2,
        files_per_partition: int = 1,
        max_retries: int = 2,
    ) -> list[str]:
        """Small-files maintenance: rewrite every committed partition
        whose directory holds >= ``min_files`` parquet data files down
        to ``files_per_partition``, through the SAME atomic commit path
        as a data write — readers see either the fragmented version or
        the compacted one, never a mix, and a crash mid-compaction
        leaves the table untouched (staged files unreferenced, gc
        reclaims). Rows are byte-identical; the stored commit ``meta``
        (e.g. a streaming watermark) is carried forward unchanged.

        Returns the partition keys rewritten. At warehouse scale run
        it per-partition-subset on a schedule; each call's cost is one
        read+write of the touched partitions only (manifest pruning
        scopes the scan), which is the standard bin-packing OPTIMIZE
        shape."""
        if files_per_partition < 1:
            raise ValueError("files_per_partition must be >= 1")
        if min_files <= files_per_partition:
            # otherwise the rewrite can land back at >= min_files files
            # and every scheduled run re-selects the same victims forever
            raise ValueError(
                "min_files must exceed files_per_partition or compaction"
                " never converges"
            )
        for attempt in range(int(max_retries) + 1):
            m = self.manifest()
            if m is None:
                return []
            victims: list[str] = []
            dirs: list[str] = []
            for key, ent in m["partitions"].items():
                d = os.path.join(self.table_dir, ent["dir"])
                n = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
                if n >= min_files:
                    victims.append(key)
                    dirs.append(d)
            if not victims:
                return []
            # partition values ride IN the data files (commit() stages
            # shadow copies and keeps the originals), so reading the
            # leaf dirs yields exactly the rows + partition columns to
            # restage
            df = spark.read.parquet(*dirs).coalesce(int(files_per_partition))
            try:
                # meta carried from the SAME snapshot the victims were
                # selected from; expect_version makes that safe — if a
                # writer commit (data or watermark) interleaves, the
                # commit aborts instead of overwriting the newer meta
                # with this stale snapshot's, and compaction restarts
                # from a fresh snapshot
                self.commit(
                    df,
                    meta=dict(m.get("meta") or {}),
                    expect_version=int(m["version"]),
                )
                return victims
            except ConcurrentCommitError:
                if attempt >= int(max_retries):
                    raise
        raise AssertionError("unreachable")

    def gc(self) -> list[str]:
        """Reclaim everything the current manifest does not reference:
        abandoned staging roots, data dirs orphaned by crashes between
        swap and cleanup, torn manifest temp files. Writer-side only
        (see the concurrency contract). Returns removed paths."""
        removed: list[str] = []
        live = set()
        m = self.manifest()
        if m is not None:
            live = {
                os.path.normpath(e["dir"]) for e in m["partitions"].values()
            }
        staging_root = os.path.join(self.table_dir, "staging")
        if os.path.isdir(staging_root):
            for name in os.listdir(staging_root):
                p = os.path.join(staging_root, name)
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
        data_root = os.path.join(self.table_dir, "data")
        if os.path.isdir(data_root):
            for tx in os.listdir(data_root):
                txdir = os.path.join(data_root, tx)
                for n in os.listdir(txdir):
                    rel = os.path.normpath(os.path.join("data", tx, n))
                    if rel not in live:
                        shutil.rmtree(
                            os.path.join(txdir, n), ignore_errors=True
                        )
                        removed.append(os.path.join(txdir, n))
                if not os.listdir(txdir):
                    os.rmdir(txdir)
        if os.path.isdir(self.table_dir):
            for name in os.listdir(self.table_dir):
                if name.startswith(_MANIFEST + ".") and name.endswith(".tmp"):
                    p = os.path.join(self.table_dir, name)
                    os.unlink(p)
                    removed.append(p)
        return removed


def merge_into_manifest(
    spark: SparkSession,
    source: DataFrame,
    table: ManifestTable,
    key: str,
    *,
    meta: dict | None = None,
) -> int:
    """Partition-scoped MERGE with an atomic multi-partition commit:
    same upsert semantics as ``operators/merge.merge_into_partitioned``
    (source rows replace target rows by ``key`` inside every touched
    partition; untouched partitions are never read or written), but
    the swap of ALL touched partitions is one manifest rename — the
    mixed-vintage crash window of dynamic partition overwrite cannot
    occur. ``key`` must not migrate across partitions (same contract
    as merge_scoped).

    The touched-partition read is pruned on the DRIVER from manifest
    metadata — one ``collect()`` of the source's distinct partition
    tuples, bounded by the number of touched partitions exactly like
    the hive twin's dynamic-overwrite listing.
    """
    pcols = table.partition_cols
    # Canonicalize partition values through Spark's own string cast so
    # they compare equal to the manifest's decoded hive-path tokens
    # (int 2024 -> "2024", date -> "2024-01-01", NULL -> None). The
    # collect is bounded by the number of touched partitions.
    touched = {
        tuple(r[c] for c in pcols)
        for r in source.select(
            *[F.col(c).cast("string").alias(c) for c in pcols]
        )
        .distinct()
        .collect()
    }
    stored = table.read(
        spark,
        partition_filter=lambda v: tuple(v[c] for c in pcols) in touched,
    )
    if stored is None:
        return table.commit(source, meta=meta)
    # no forced broadcast: a backfill delta can be arbitrarily large,
    # and AQE already picks broadcast when the key set is small
    replaced = stored.join(
        source.select(key).distinct(), key, "left_anti"
    ).unionByName(source.select(*stored.columns))
    return table.commit(replaced, meta=meta)
