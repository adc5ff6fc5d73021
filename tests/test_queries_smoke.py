"""Smoke: every registered query runs at sf0.001 and returns a stable,
non-degenerate result; oracle keys stay aligned with query keys."""

from __future__ import annotations

import pytest

from bangumi_notion_data_integration_project_spark.queries import ORACLES, QUERIES

# Queries whose correct result may legitimately be empty at tiny scale.
# parts_kcore: the sf0.001 co-purchase graph is too sparse for an
# 80-core (every node peels); non-empty from sf0.01 up, oracle-checked
MAY_BE_EMPTY: set[str] = {"parts_kcore"}


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name} returned 0 rows at sf0.001"
    # column names must be lowercase + unique for driver hash compare
    cols = df.columns
    assert len(cols) == len(set(c.lower() for c in cols))


def test_zipf_and_seasonal_degenerate_inputs_ansi_safe(spark, tmp_path):
    """The r7 advisories: a degenerate corpus (one token type, or
    all-equal top counts) zeroes zipf's OLS denominators, and a span
    under ~10 days leaves seasonal-decompose dow groups with no full
    7-row window — each must report NULL, not DIVIDE_BY_ZERO under
    Spark 4 ANSI."""
    import datetime
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(
        [(1, "x x x", "en", "s", 5), (2, "x", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    spark.createDataFrame(
        [
            (i, 1, "F", 10.0 + i, datetime.datetime(2024, 1, 1 + i % 3), "1-URGENT")
            for i in range(6)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(os.path.join(d, "orders.parquet"))

    r = QUERIES["docs_zipf_fit"](spark, d).collect()
    assert len(r) == 1 and r[0]["n_types"] == 1
    assert r[0]["slope"] is None and r[0]["r2"] is None
    assert r[0]["intercept"] is None

    rows = QUERIES["orders_seasonal_decompose"](spark, d).collect()
    assert rows and all(x["seasonal_cents"] is None for x in rows)
    assert all(x["n_days_full"] == 0 for x in rows)

    # all-equal top counts: slope defined (0), r2 still NULL
    import shutil

    shutil.rmtree(os.path.join(d, "documents.parquet"))
    spark.createDataFrame(
        [(1, "a b", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    r = QUERIES["docs_zipf_fit"](spark, d).collect()
    assert r[0]["n_types"] == 2 and r[0]["slope"] == 0.0 and r[0]["r2"] is None
