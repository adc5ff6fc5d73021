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
