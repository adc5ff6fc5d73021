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
