"""operators/chunking.py — overlap-window chunking invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.chunking import chunk_documents


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_short_doc_single_chunk(spark):
    df = _mk(spark, ["a b c"])
    rows = chunk_documents(df, chunk_size=4, overlap=1).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "a b c"
    assert rows[0].n_chunk_tokens == 3
    assert rows[0].chunk_id == 0


def test_empty_doc_no_chunks(spark):
    df = _mk(spark, ["", "   "])
    assert chunk_documents(df).count() == 0


def test_exact_boundary_and_overlap(spark):
    # 10 tokens, chunk 4 / overlap 1 → stride 3 → starts 0,3,6 → 3 chunks
    words = [f"w{i}" for i in range(10)]
    df = _mk(spark, [" ".join(words)])
    rows = sorted(
        chunk_documents(df, chunk_size=4, overlap=1).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_text for r in rows] == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
    ]
    # consecutive chunks share exactly `overlap` tokens
    assert rows[0].chunk_text.split()[-1] == rows[1].chunk_text.split()[0]


def test_every_token_covered(spark):
    words = [f"t{i}" for i in range(257)]
    df = _mk(spark, [" ".join(words)])
    out = chunk_documents(df, chunk_size=64, overlap=8)
    covered = (
        out.select(F.explode(F.split("chunk_text", " ")).alias("tok"))
        .distinct()
        .count()
    )
    assert covered == 257
    # last chunk ends at the document's final token
    last = out.orderBy(F.desc("chunk_id")).first()
    assert last.chunk_text.split()[-1] == "t256"


def test_overlap_must_be_smaller():
    with pytest.raises(ValueError):
        chunk_documents(None, chunk_size=8, overlap=8)


def test_null_text_no_chunks(spark):
    df = spark.createDataFrame([(1, None), (2, "a b")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_size=4, overlap=1).collect()
    assert len(rows) == 1 and rows[0].doc_id == 2
