"""Bucketed range join — point-in-interval joins that scale.

A naive ``l.ts BETWEEN r.start AND r.end`` equi-less join degenerates to
a broadcast-nested-loop (O(n*m) comparisons) on Spark. The scalable
restatement buckets time into fixed-width bins: each left point lands in
exactly one bin, each right interval is exploded to the bins it covers,
and the join becomes an equi-join on ``(key, bin)`` followed by an exact
range filter. Comparisons drop from n*m per key to only the pairs that
share a bin — the standard interval-bucketing trick used by Spark range
join hints and by time-series stores.

Bin width trades duplication for selectivity: one bin ≈ the median
interval length keeps the explode factor near 2 while the post-filter
stays cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    point: str,
    start: str,
    end: str,
    *,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join left rows (point column ``point``) to right rows whose
    ``[start, end]`` interval contains the point, matching on ``key``.
    Timestamps are compared at second precision for binning; the final
    filter uses the original values, so results are exact.

    Only ``how='inner'`` is supported: the containment filter runs
    AFTER the join, evaluates NULL for unmatched outer rows, and would
    silently turn any outer join back into an inner one.
    """
    if how != "inner":
        raise ValueError(
            "range_join supports how='inner' only: the post-join "
            "containment filter drops the NULL rows an outer join "
            "would produce"
        )

    def _epoch(c: str):
        # cast("timestamp") first: unix_timestamp rejects TIMESTAMP_NTZ,
        # and the session timezone is pinned to UTC so the cast is exact
        return F.unix_timestamp(F.col(c).cast("timestamp"))

    lhs = left.withColumn("__bin", (_epoch(point) / bucket_seconds).cast("long"))

    s_bin = (_epoch(start) / bucket_seconds).cast("long")
    e_bin = (_epoch(end) / bucket_seconds).cast("long")
    rhs = right.withColumn("__bin", F.explode(F.sequence(s_bin, e_bin)))

    joined = lhs.join(rhs, [key, "__bin"], how).filter(
        (F.col(point) >= F.col(start)) & (F.col(point) <= F.col(end))
    )
    return joined.drop("__bin")
