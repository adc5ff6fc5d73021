"""Measure what the Z-order layout buys: how many parquet row groups a
2-D predicate can prune, time-sorted layout vs Morton-clustered layout.

Row-group pruning is decided by footer min/max statistics, so the
honest metric is computed straight from the footers: a row group must
be READ iff its [min,max] ranges intersect the predicate box on BOTH
dimensions. A time-sorted file is perfectly selective on ts and
useless on user_id; the Z-curve makes both dimensions ~locally dense,
so the intersecting set shrinks multiplicatively.

Usage: python tools/bench_zorder.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.catalog import (  # noqa: E402
    load_table,
    write_zordered,
)
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

N_FILES = 64


def surviving_row_groups(path: str, user_lo, user_hi, ts_lo, ts_hi) -> tuple[int, int, int, int]:
    """(row groups read, total row groups, rows read, total rows) for a
    (user_id BETWEEN ..) AND (ts BETWEEN ..) predicate, per footer
    min/max."""
    read = total = rows_read = rows_total = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            total += 1
            rows_total += rg.num_rows
            su = rg.column(names["user_id"]).statistics
            st = rg.column(names["ts"]).statistics
            hit_user = su.max >= user_lo and su.min <= user_hi
            hit_ts = st.max >= ts_lo and st.min <= ts_hi
            if hit_user and hit_ts:
                read += 1
                rows_read += rg.num_rows
        # file-level: a file whose every row group misses is never opened
    return read, total, rows_read, rows_total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-zorder")
    e = load_table(spark, sf_dir, "events")
    time_path, z_path = "/tmp/zbench_time", "/tmp/zbench_z"
    e.repartitionByRange(N_FILES, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(time_path)
    write_zordered(e, z_path, x="user_id", y="ts", n_files=N_FILES)

    import datetime

    user_lo, user_hi = 100, 160
    ts_lo = datetime.datetime(2024, 1, 10, tzinfo=datetime.timezone.utc)
    ts_hi = datetime.datetime(2024, 1, 13, tzinfo=datetime.timezone.utc)

    for label, path in (("time-sorted", time_path), ("z-ordered", z_path)):
        r, t, rr, rt = surviving_row_groups(path, user_lo, user_hi, ts_lo, ts_hi)
        df = (
            spark.read.parquet(path)
            .filter(
                F.col("user_id").between(user_lo, user_hi)
                & F.col("ts").between(ts_lo, ts_hi)
            )
            .select("event_id")
        )
        t0 = time.perf_counter()
        n = df.count()
        dt = time.perf_counter() - t0
        print(
            f"{label}: row groups read {r}/{t}, rows read {rr}/{rt} "
            f"({100 * rr / rt:.1f}%), matches {n}, scan {dt:.2f}s"
        )


if __name__ == "__main__":
    main()
