"""Array / map / JSON operators (SURVEY §2.3 J1-J6, §2.6 T1).

All native Catalyst higher-order functions — `transform`, `filter`,
`element_at`, `array_sort`, `slice` — so they vectorize JVM-side and
survive 100 TB inputs without Python serde.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tags_to_names(tags: Column | str, field: str = "name") -> Column:
    """Project an array<struct> down to one field (reference keeps only
    tag names: bangumi_data_ingestion.py:428)."""
    c = F.col(tags) if isinstance(tags, str) else tags
    return F.transform(c, lambda t: t[field])


def array_join_nonnull(arr: Column | str, sep: str = ", ") -> Column:
    """", "-join of non-null elements, NULL when nothing remains
    (reference all_tags: bangumi_data_ingestion.py:457-459)."""
    c = F.col(arr) if isinstance(arr, str) else arr
    filtered = F.filter(c, lambda x: x.isNotNull())
    return F.when(F.size(filtered) > 0, F.array_join(filtered, sep))


def positional_pivot(arr: Column | str, n: int, fields: list[str], prefix: str) -> list[Column]:
    """Top-N positional pivot: first `n` elements of an array<struct>
    become `n*len(fields)` scalar columns, null-padded past the end.

    Reference: 5-slot tag pivot → tag_{i}_name / tag_{i}_count columns
    (extract_top_tags, bangumi_data_ingestion.py:297-307).
    `try_element_at` is null-safe past the array end (plain element_at
    throws under ANSI mode, the Spark 4 default), which reproduces the
    null padding.
    """
    c = F.col(arr) if isinstance(arr, str) else arr
    cols = []
    for i in range(1, n + 1):
        for f in fields:
            cols.append(F.try_element_at(c, F.lit(i)).getField(f).alias(f"{prefix}_{i}_{f}"))
    return cols


def top_k_sorted_slice(arr: Column | str, k: int) -> Column:
    """First k elements of an array (reference relies on API pre-sorting
    tags by count desc and takes positions 0-4: bangumi_data_ingestion.py:297-307;
    in Spark we sort explicitly when the input ordering isn't guaranteed)."""
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.slice(c, 1, k)
