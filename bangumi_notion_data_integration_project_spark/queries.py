"""Named query registry — the driver-facing surface.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` demonstrating
one operator family from SURVEY.md §2 on the star-schema testdata, with
a matching ANSI-SQL oracle in ``ORACLES`` that DuckDB runs over the same
parquet. Column names are aliased identically on both sides (the driver
compare sorts columns by name before hashing).

Reference citations in docstrings point into /root/reference/ so parity
can be checked; the implementations are Spark-first, not translations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .catalog import load_table


# ---------------------------------------------------------------------------
# A. Aggregation family (reference A1-A6: category summary, ratios, counts)
# ---------------------------------------------------------------------------


def q_category_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: grouped summary with counts, sums and a guarded ratio.

    Restates the reference's per-(subject_type, collection_type) category
    summary (bangumi_data_ingestion.py:487-499 accumulate :200-202,
    ratio-with-zero-guard :495) on the star schema: group `lineitem` by
    (l_returnflag, l_linestatus). Map-side partial aggregation + AQE
    handle this at 100 TB — one shuffle on the (tiny-cardinality) group
    key, no Python in the hot path.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("fetched_items"),
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
        )
        .withColumn(
            "qty_share_pct",
            F.when(
                F.col("sum_base_price") > 0,
                F.col("sum_qty") / F.col("sum_base_price") * 100.0,
            ).otherwise(F.lit(0.0)),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "fetched_items",
            F.round("sum_qty", 2).alias("sum_qty"),
            F.round("sum_base_price", 2).alias("sum_base_price"),
            F.round("sum_disc_price", 2).alias("sum_disc_price"),
            F.round("avg_qty", 6).alias("avg_qty"),
            F.round("avg_disc", 6).alias("avg_disc"),
            F.round("qty_share_pct", 6).alias("qty_share_pct"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_global_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sums + conditional count (bangumi_data_ingestion.py:538-543,
    :372,476 — overall fetched/total and categories-with-data count)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_finished"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "category_summary": q_category_summary,
    "global_summary": q_global_summary,
}

ORACLES: dict[str, str] = {
    "category_summary": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS fetched_items,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               round(CASE WHEN sum(l_extendedprice) > 0
                     THEN sum(l_quantity) / sum(l_extendedprice) * 100.0
                     ELSE 0.0 END, 6) AS qty_share_pct
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "global_summary": """
        SELECT count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               count(DISTINCT o_custkey) AS n_customers
        FROM orders
    """,
}
