"""End-to-end pipeline test: extract → export → warehouse load →
incremental merge → Notion-style sync, all on replay fixtures.

This is the integration counterpart of the reference's three chained
main()s (SURVEY §3) — run as explicit stages over persisted tables.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark import pipeline
from bangumi_notion_data_integration_project_spark.sinks.rest import FileTransport


def _page(total, offset, items):
    return {"total": total, "limit": 100, "offset": offset, "data": items}


def _item(sid, name_cn=""):
    return {
        "created_at": "2023-04-01T12:30:00+08:00",
        "updated_at": "2023-05-01T00:00:00+08:00",
        "ep_status": 3,
        "vol_status": 0,
        "subject": {
            "id": sid,
            "name": f"subject {sid}",
            "name_cn": name_cn,
            "score": 7.5,
            "rank": 100 + sid,
            "collection_total": 1000,
            "eps": 12,
            "volumes": 0,
            "date": "2013-04",
            "type": 2,
            "short_summary": "summary",
            "tags": [{"name": "科幻", "count": 50}],
            "infobox": [{"key": "导演", "value": "某导演"}],
        },
    }


CELLS = ["2_1", "2_3", "4_1"]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipeline_pages")
    (d / "2_1_page0.json").write_text(
        json.dumps(_page(3, 0, [_item(1, "中文一"), _item(2), _item(3)]), ensure_ascii=False),
        encoding="utf-8",
    )
    (d / "2_3_page0.json").write_text(
        json.dumps(_page(2, 0, [_item(10), _item(11)]), ensure_ascii=False), encoding="utf-8"
    )
    (d / "4_1_page0.json").write_text(json.dumps(_page(0, 0, [])), encoding="utf-8")
    return str(d)


@pytest.fixture(scope="module")
def tables(spark, fixture_dir):
    return pipeline.extract(
        spark, cells=CELLS, fixture_dir=fixture_dir, user_id="tester"
    )


def test_extract_builds_three_tables(tables):
    assert tables["raw"].count() == 5
    assert tables["analytics"].count() == 5
    summary = {r["cell_id"]: r for r in tables["summary"].collect()}
    assert set(summary) == set(CELLS)  # empty cell present with zeros
    assert summary["2_1"]["fetched_items"] == 3
    assert summary["2_1"]["completion_pct"] == 100.0
    assert summary["4_1"]["fetched_items"] == 0
    assert summary["4_1"]["completion_pct"] == 0.0


def test_export_writes_bom_csvs(tables, tmp_path):
    paths = pipeline.export_tables(tables, str(tmp_path / "export"))
    for name in ("raw", "analytics", "summary"):
        with open(paths[name], "rb") as f:
            assert f.read(3) == b"\xef\xbb\xbf", f"{name} CSV missing BOM"
    # container has no Excel engine → gated to None; path key still present
    assert "excel" in paths


def test_load_warehouse_prunes_columns(spark, tables, tmp_path):
    wh = str(tmp_path / "wh")
    stats = pipeline.load_warehouse(tables, wh)
    # observe() metrics ride the write action: row count with no extra scan
    assert stats["n_rows"] == 5
    loaded = spark.read.parquet(os.path.join(wh, "fact_view_logs"))
    assert "tag_1_name" not in loaded.columns
    assert "all_tags" in loaded.columns and "name_cn" in loaded.columns
    raw = spark.read.parquet(os.path.join(wh, "fact_view_logs_raw"))
    assert raw.count() == 5


def test_incremental_load_full_cycle(spark, tables, tmp_path):
    wh = str(tmp_path / "wh_inc")
    os.makedirs(wh)
    analytics = tables["analytics"]

    first = pipeline.incremental_load(spark, analytics, wh)
    assert first["initial_load"] == 5

    # same snapshot again → pure update pass, no inserts/deletes
    again = pipeline.incremental_load(spark, analytics, wh)
    assert again["inserts"] == 0 and again["deletes"] == 0
    assert again["updates"] == 5 and again["final_rows"] == 5

    # drop one, add one → one delete, one insert
    changed = analytics.filter(F.col("subject_id") != 11).unionByName(
        analytics.limit(1).withColumn("subject_id", F.lit(99))
    )
    third = pipeline.incremental_load(spark, changed, wh)
    assert third["inserts"] == 1 and third["deletes"] == 1 and third["updates"] == 4
    assert third["final_rows"] == 5
    final_ids = {
        r["subject_id"]
        for r in spark.read.parquet(os.path.join(wh, "fact_view_logs_incremental")).collect()
    }
    assert 99 in final_ids and 11 not in final_ids


def test_notion_sync_insert_update_softdelete(spark, tables, tmp_path):
    out = tmp_path / "notion"
    out.mkdir()
    # sink already holds ids 1, 2 and a stale id 777 absent from source
    existing = spark.createDataFrame([(1,), (2,), (777,)], "subject_id: long")

    metrics = pipeline.notion_sync(
        tables["analytics"], existing, FileTransport(str(out))
    )
    assert metrics == {"inserted": 3, "updated": 2, "soft_deleted": 1, "errors": 0}

    posted = []
    for p in glob.glob(f"{out}/part-*.jsonl"):
        with open(p, encoding="utf-8") as f:
            posted += [json.loads(line) for line in f]
    deletes = [p for p in posted if "is_active" in p["properties"]]
    assert len(deletes) == 1 and deletes[0]["__key"] == 777
    assert deletes[0]["properties"]["is_active"] == {"checkbox": False}
    titled = [p for p in posted if "name_cn" in p["properties"]]
    assert len(titled) == 5  # 3 inserts + 2 updates carry full properties


def test_run_report(tmp_path):
    path = pipeline.run_report(
        str(tmp_path / "report.json"), sync={"inserted": 3}, status="ok"
    )
    with open(path, encoding="utf-8") as f:
        report = json.load(f)
    assert report["sync"]["inserted"] == 3 and report["status"] == "ok"
