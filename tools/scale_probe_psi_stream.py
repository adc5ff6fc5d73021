"""Scale probe for the streaming PSI twin: per-batch cost must be
O(batch + k) — the fold reduces the batch map-side to distinct values,
range-joins k−1 broadcast edges, and rewrites a k-row table. 10× the
batch volume should cost ~the scan of the extra rows and nothing else
(state size is k rows regardless of history).

Run: python tools/scale_probe_psi_stream.py     (~2 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402
from bangumi_notion_data_integration_project_spark.streaming.incremental import (  # noqa: E402
    start_streaming_psi,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_stream(spark, ref, rows_df, tag: str) -> float:
    base = tempfile.mkdtemp(prefix=f"psi_stream_{tag}_")
    inp, psi_dir, ckpt = (
        os.path.join(base, d) for d in ("in", "psi", "ckpt")
    )
    rows_df.write.mode("append").parquet(inp)
    t0 = time.time()
    q = start_streaming_psi(
        spark.readStream.schema("x long, ts timestamp").parquet(inp),
        psi_dir,
        value_col="x",
        ref=ref,
        n_buckets=10,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(300)
    dt = time.time() - t0
    n = spark.read.parquet(psi_dir).count()
    assert n == 10, n  # state is k rows, full stop
    shutil.rmtree(base)
    return dt


def main() -> None:
    spark = get_spark("scale_probe_psi_stream")
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ref = e.filter(F.dayofmonth("ts") % 2 == 0).select(
        F.round(F.col("value") * 100).cast("long").alias("x")
    ).localCheckpoint()

    def batch(copies: int):
        return (
            e.filter(F.dayofmonth("ts") % 2 == 1)
            .withColumn(
                "__c", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
            )
            .select(
                (F.round(F.col("value") * 100).cast("long") + F.col("__c"))
                .alias("x"),
                F.col("ts"),
            )
            .localCheckpoint()
        )

    one, ten = batch(1), batch(10)
    n1, n10 = one.count(), ten.count()
    t1 = run_stream(spark, ref, one, "1x")
    t10 = run_stream(spark, ref, ten, "10x")
    print(f"batch rows: 1x={n1}, 10x={n10}")
    print(
        f"streaming_psi fold: 1x {t1:.2f}s, 10x batch {t10:.2f}s,"
        f" ratio {t10 / t1:.1f}x (state fixed at k rows)"
    )


if __name__ == "__main__":
    main()
