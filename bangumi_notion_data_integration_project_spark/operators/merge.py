"""Keyed snapshot merge — the reference's incremental load, Spark-first.

Reference semantics (`implement_incremental_load`,
data_loading_to_mysql_database.py:185-277):
  inserts  = source keys − target keys          (:236-240, M1 anti join)
  deletes  = target keys − source keys          (:243,     M2 anti join)
  updates  = source ∩ target, all rewritten     (:246-262, M3 semi join)
  NA-key rows bypass the merge, appended as-is  (:223-227, :265)
  final    = inserts ∪ updates [∪ survivors if keep_absent] ∪ NA rows

Physical notes for 100 TB: the three joins below share one shuffle on
`key` (Catalyst reuses the exchange); with `delete_absent=True` the
plan collapses to `source ∪ NA-rows` — Catalyst sees that via the
union of anti+semi = source. AQE picks broadcast when one snapshot is
small, skew-join when the key is hot. For a mutable target table the
same API would route to Delta `MERGE INTO`; on plain parquet this
full-rewrite is the correct equivalent (the reference also rewrites
the whole target: `if_exists='replace'`, :268).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_parts(source: DataFrame, target: DataFrame, key: str) -> dict[str, DataFrame]:
    """The M1/M2/M3 decomposition, each part its own DataFrame."""
    s = source.filter(F.col(key).isNotNull())
    t = target.filter(F.col(key).isNotNull())
    return {
        "inserts": s.join(t, key, "left_anti"),
        "deletes": t.join(s, key, "left_anti"),
        "updates": s.join(t, key, "left_semi"),
        "source_na": source.filter(F.col(key).isNull()),
        "target_na": target.filter(F.col(key).isNull()),
    }


def merge_snapshot(
    source: DataFrame,
    target: DataFrame,
    key: str,
    *,
    delete_absent: bool = True,
) -> DataFrame:
    """Return the post-merge state of the target.

    delete_absent=True  → reference full-sync semantics (rows absent
                          from source are dropped; :243).
    delete_absent=False → upsert-only (absent target rows survive).
    NA-key rows from the source pass through untouched (:223-227).
    """
    parts = merge_parts(source, target, key)
    pieces = [parts["inserts"], parts["updates"], parts["source_na"]]
    if not delete_absent:
        pieces.append(parts["deletes"])  # survivors: in target, not in source
    return reduce(lambda a, b: a.unionByName(b), pieces)


def merge_scd2(
    history: DataFrame,
    source: DataFrame,
    key: str,
    attrs: list[str],
    effective,
    *,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: version rows instead of
    overwriting them (the warehouse-grade extension of the reference's
    rewrite-everything update, data_loading_to_mysql_database.py:
    253-262 — which keeps no history at all).

    ``history`` carries ``key``, ``attrs``, ``from_col`` and ``to_col``
    (NULL ``to_col`` = the current version). For each incoming row:

    - attrs unchanged → current version stays open;
    - attrs changed   → current version closes at ``effective``, a new
                        open version is appended;
    - new key         → first open version appended;
    - key absent from source → current version stays open (SCD2 keeps
      dimension members; use ``merge_snapshot`` for delete semantics).

    Scale shape: every join below keys on ``key``, so Catalyst shares
    one exchange across the change-detection inner join and the
    semi/anti splits; closed history is unioned back untouched (never
    shuffled). Comparison is null-safe (``eqNullSafe``).
    """
    cur = history.filter(F.col(to_col).isNull())
    closed = history.filter(F.col(to_col).isNotNull())
    src = source.select(key, *attrs)

    any_diff = reduce(
        lambda a, b: a | b,
        [~F.col(f"c.{a}").eqNullSafe(F.col(f"s.{a}")) for a in attrs],
    )
    changed_keys = (
        cur.alias("c")
        .join(src.alias("s"), F.col(f"c.{key}") == F.col(f"s.{key}"))
        .filter(any_diff)
        .select(F.col(f"c.{key}").alias(key))
    )

    from_type = history.schema[from_col].dataType
    to_type = history.schema[to_col].dataType
    closed_now = cur.join(changed_keys, key, "left_semi").withColumn(
        to_col, F.lit(effective).cast(to_type)
    )
    open_kept = cur.join(changed_keys, key, "left_anti")
    incoming = src.join(cur, key, "left_anti").unionByName(
        src.join(changed_keys, key, "left_semi")
    )
    opened = incoming.withColumn(from_col, F.lit(effective).cast(from_type)).withColumn(
        to_col, F.lit(None).cast(to_type)
    ).select(*history.columns)
    return closed.unionByName(closed_now).unionByName(open_kept).unionByName(opened)
