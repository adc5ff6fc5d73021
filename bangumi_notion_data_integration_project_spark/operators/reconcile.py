"""Snapshot reconciliation: bucketed checksum table-diff.

The reference pipeline re-syncs a whole table every run and trusts the
write (data_loading_to_mysql_database.py:268 `replace`); at 100 TB you
verify a sync instead of re-reading both sides row-by-row. The standard
trick: hash every row to a small integer checksum, aggregate
``(count, sum(checksum))`` per key-bucket on BOTH sides, and compare the
bucket summaries — two full scans, one tiny (``n_buckets``-row)
join, zero row-level shuffles. Mismatched buckets localize where a
row-level diff (a ``merge_parts`` anti/semi join restricted to those
buckets) is worth running.

The row checksum is the leading-6-decimal-digit projection of
``md5(key ':' payload)`` — engine-portable (identical in Spark and
DuckDB/ANSI, same property the sampling operators rely on) and integer,
so the per-bucket SUM is exact and order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_checksum(*cols: Column) -> Column:
    """Portable integer checksum of the given (string-cast) columns.

    First 6 decimal digits of the md5 hex digest (zero-padded so short
    digit sequences never shift), as BIGINT in [0, 999999].
    """
    joined = F.concat_ws(":", *[c.cast("string") for c in cols])
    digits = F.regexp_replace(F.md5(joined), "[a-f]", "")
    return F.substring(F.concat(digits, F.lit("000000")), 1, 6).cast("long")


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    key: str,
    payload: list[str],
    *,
    n_buckets: int = 64,
) -> DataFrame:
    """Compare two snapshots by bucketed (row-count, checksum-sum).

    Returns one row per bucket:
    ``(bucket, left_rows, right_rows, left_sum, right_sum, status)``
    with status 'ok' when both match, else 'diff'. Each side costs one
    scan + one ``n_buckets``-group aggregate (map-side partial combine
    makes the shuffle ~n_buckets rows per task); the final full-outer
    join is over ``n_buckets`` rows.
    """

    def summarize(df: DataFrame, side: str) -> DataFrame:
        cksum = row_checksum(F.col(key), *[F.col(c) for c in payload])
        return (
            df.select((F.col(key) % n_buckets).alias("bucket"), cksum.alias("cksum"))
            .groupBy("bucket")
            .agg(
                F.count("*").alias(f"{side}_rows"),
                F.sum("cksum").alias(f"{side}_sum"),
            )
        )

    l_sum = summarize(left, "left")
    r_sum = summarize(right, "right")
    joined = l_sum.join(r_sum, "bucket", "full_outer")
    same = (
        (F.coalesce(F.col("left_rows"), F.lit(0)) == F.coalesce(F.col("right_rows"), F.lit(0)))
        & (F.coalesce(F.col("left_sum"), F.lit(0)) == F.coalesce(F.col("right_sum"), F.lit(0)))
    )
    return joined.select(
        "bucket",
        F.coalesce(F.col("left_rows"), F.lit(0)).cast("long").alias("left_rows"),
        F.coalesce(F.col("right_rows"), F.lit(0)).cast("long").alias("right_rows"),
        F.coalesce(F.col("left_sum"), F.lit(0)).cast("long").alias("left_sum"),
        F.coalesce(F.col("right_sum"), F.lit(0)).cast("long").alias("right_sum"),
        F.when(same, F.lit("ok")).otherwise(F.lit("diff")).alias("status"),
    )
