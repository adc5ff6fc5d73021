"""SQL front-end parity: the engine's DataFrame plans and the same
logic expressed through ``spark.sql`` must agree row-for-row — a user
of the reference could drive this engine from either API. Uses the
DuckDB oracle text where it is ANSI enough for Spark SQL to parse,
pinning all three surfaces (DataFrame, Spark SQL, DuckDB) together."""

from __future__ import annotations

import pytest

from bangumi_notion_data_integration_project_spark.catalog import TABLES, load_table
from bangumi_notion_data_integration_project_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

# oracle SQL that is engine-portable (no DuckDB-only functions)
PORTABLE = [
    "customer_set_ops",
    "orders_window_battery",
    "order_priority_counts",
    "revenue_by_nation",
]


@pytest.fixture(scope="module")
def sql_views(spark):
    for t in TABLES:
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    yield spark


@pytest.mark.parametrize("name", PORTABLE)
def test_spark_sql_matches_dataframe_api(sql_views, name):
    spark = sql_views
    df_rows = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
    sql_rows = sorted(map(tuple, spark.sql(ORACLES[name]).collect()))
    assert df_rows == sql_rows
