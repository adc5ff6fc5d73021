"""As-of join operator tests (oracle-grade cases built by hand)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.asof import asof_join


def _ts(s):
    return s


def test_asof_basic(spark):
    quotes = spark.createDataFrame(
        [
            ("A", "2024-01-01 09:00:00", 10.0),
            ("A", "2024-01-01 10:00:00", 11.0),
            ("A", "2024-01-01 11:00:00", 12.0),
            ("B", "2024-01-01 09:30:00", 20.0),
        ],
        "sym: string, qts: string, px: double",
    ).withColumn("qts", F.col("qts").cast("timestamp"))
    trades = spark.createDataFrame(
        [
            ("A", "2024-01-01 10:30:00", 5),   # → px 11.0
            ("A", "2024-01-01 10:00:00", 6),   # equal ts → <= semantics, px 11.0
            ("A", "2024-01-01 08:00:00", 7),   # before any quote → null
            ("B", "2024-01-01 12:00:00", 8),   # → px 20.0
            ("C", "2024-01-01 12:00:00", 9),   # no quotes for key → null
        ],
        "sym: string, tts: string, qty: long",
    ).withColumn("tts", F.col("tts").cast("timestamp"))

    out = asof_join(trades, quotes, "sym", "tts", "qts")
    got = {r["qty"]: r["px_right"] for r in out.collect()}
    assert got == {5: 11.0, 6: 11.0, 7: None, 8: 20.0, 9: None}


def test_asof_multiple_value_cols_and_suffix(spark):
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "x", 1.5)],
        "k: long, rts: string, label: string, v: double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    left = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00")], "k: long, lts: string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    out = asof_join(left, right, "k", "lts", "rts", suffix="_prev")
    row = out.first()
    assert row["label_prev"] == "x" and row["v_prev"] == 1.5
    assert set(out.columns) == {"k", "lts", "label_prev", "v_prev"}
