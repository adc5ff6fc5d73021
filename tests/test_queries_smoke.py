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


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_setsketch_overlap_self_validating_columns(spark, sf):
    """events_user_overlap_setsketch is rows-only (DuckDB has no
    Spark-compatible xxhash64), so its verdict lives in the tolerance
    columns — every union_within_tol / intersection_within_tol must
    read true, and below k the estimates must be EXACT (the KMV
    complete-set guarantee; at sf0.001 the merged sets hold < 512
    rows)."""
    rows = QUERIES["events_user_overlap_setsketch"](spark, sf).collect()
    assert len(rows) == 10  # C(5 event types, 2)
    assert all(r["union_within_tol"] for r in rows)
    assert all(r["intersection_within_tol"] for r in rows)
    for r in rows:
        if r["n_union_kept"] < 512:
            assert r["est_union"] == r["exact_union"]
            assert r["est_intersection"] == r["exact_intersection"]


def test_conversion_km_censoring_semantics(spark, tmp_path):
    """events_conversion_km's funnel construction: a purchase BEFORE
    the first signup must not count (duration needs ts >= t0), a user
    with no subsequent purchase is right-censored at the corpus max
    timestamp, and converted users step the curve at their lag."""
    import datetime
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d)

    def ev(i, ts, user, typ):
        return (i, ts, user, typ, 1.0, "{}")

    t = lambda day, h=0: datetime.datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        # user 1: signup d1, purchase d3 -> converted at t=2
        ev(1, t(1), 1, "signup"),
        ev(2, t(3), 1, "purchase"),
        # user 2: purchase d1 BEFORE signup d2, none after -> censored
        ev(3, t(1), 2, "purchase"),
        ev(4, t(2), 2, "signup"),
        # user 3: signup d1, never purchases -> censored at gmax (d5)
        ev(5, t(1), 3, "signup"),
        # corpus max timestamp carrier (no signup)
        ev(6, t(5), 4, "view"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))

    km = {r["duration_days"]: r for r in QUERIES["events_conversion_km"](spark, d).collect()}
    # only user 1 converts (t=2 with 2 still at risk: user 2 censored
    # at t=3=gmax-signup, user 3 at t=4); S(2) = 1 - 1/3
    assert list(km) == [2]
    assert km[2]["n_at_risk"] == 3 and km[2]["n_events"] == 1
    assert km[2]["survival"] == round(1.0 - 1.0 / 3.0, 6)
