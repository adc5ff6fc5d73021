"""SparkSession construction.

One shared session per process; every knob here is chosen for scale-out
behavior first (AQE, adaptive coalesce/skew-join, Arrow transfer) and
local[N] testing second. At cluster scale the same config holds — only
``spark.sql.shuffle.partitions`` should be raised to ~2-3× total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")


def get_spark(app_name: str = "bangumi_spark_engine", master: str | None = None) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    Timezone is pinned to UTC so timestamp semantics are stable across
    the DuckDB oracle, parquet ns/us truncation, and any cluster locale
    (reference strips timezones on purpose — SURVEY §1.2 / reference
    bangumi_data_ingestion.py:397-403).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Spark's default timestamp output is legacy INT96, which has NO
        # parquet min/max statistics — every downstream time-range scan
        # reads every row group. TIMESTAMP_MICROS restores footer stats,
        # making time predicates prunable on files this engine writes
        # (measured in tools/bench_zorder.py / SCALING.md).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # The default 100-entry generated-class cache evicts constantly
        # in any long-lived session running a diverse workload (the 212
        # bench queries compile ~1.5k codegen stages per sweep, so a
        # query's second visit recompiled everything — measured ~+8%
        # across the board as the registry grew). A long-lived cluster
        # sizes this to its workload; 5000 entries ≈ tens of MB of
        # compiled classes.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if master is None:
        master = f"local[{cpus}]"
    spark = builder.master(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
