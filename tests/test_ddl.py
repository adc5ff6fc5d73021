"""K5 REST DDL + K7 error-log sink tests (FileDdlTransport — no network)."""

from __future__ import annotations

import json
import logging

from bangumi_notion_data_integration_project_spark.sinks.ddl import (
    DATABASE_PROPERTIES,
    FileDdlTransport,
    create_database,
    create_page,
    setup_error_logging,
)


def test_create_page_idempotent_skip(tmp_path):
    t = FileDdlTransport(str(tmp_path / "ddl.jsonl"))
    # existing id → no POST at all (reference :77-80)
    assert create_page(t, "page-existing") == "page-existing"
    assert not (tmp_path / "ddl.jsonl").exists()


def test_create_page_posts_workspace_parent(tmp_path):
    out = tmp_path / "ddl.jsonl"
    t = FileDdlTransport(str(out))
    pid = create_page(t, None)
    assert pid == "page-1"
    rec = json.loads(out.read_text().splitlines()[0])
    assert rec["endpoint"].endswith("/v1/pages")
    assert rec["payload"]["parent"] == {"type": "workspace", "workspace": True}


def test_create_database_idempotent_skip(tmp_path):
    t = FileDdlTransport(str(tmp_path / "ddl.jsonl"))
    assert create_database(t, "page-1", "db-existing") == "db-existing"
    assert not (tmp_path / "ddl.jsonl").exists()


def test_create_database_declares_reference_schema(tmp_path):
    out = tmp_path / "ddl.jsonl"
    t = FileDdlTransport(str(out))
    did = create_database(t, "page-1", None)
    assert did == "db-1"
    rec = json.loads(out.read_text().splitlines()[0])
    assert rec["endpoint"].endswith("/v1/databases")
    assert rec["payload"]["parent"] == {"type": "page_id", "page_id": "page-1"}
    props = rec["payload"]["properties"]
    # the declared schema (notion_data_ingestion.py:106-119): exactly one
    # title property, typed columns as fixed in the reference
    assert props == DATABASE_PROPERTIES
    assert [k for k, v in props.items() if "title" in v] == ["subject_id"]
    assert props["name_cn"] == {"rich_text": {}}
    assert props["updated_at"] == {"date": {}}


def test_page_then_database_chain(tmp_path):
    out = tmp_path / "ddl.jsonl"
    t = FileDdlTransport(str(out))
    pid = create_page(t, None)
    did = create_database(t, pid, None)
    recs = [json.loads(line) for line in out.read_text().splitlines()]
    assert [r["id"] for r in recs] == [pid, did]
    assert recs[1]["payload"]["parent"]["page_id"] == pid


def test_setup_error_logging_utf8_and_idempotent(tmp_path):
    log_path = tmp_path / "errors.log"
    lg = setup_error_logging(str(log_path), logger_name="test-ddl-log")
    again = setup_error_logging(str(log_path), logger_name="test-ddl-log")
    assert lg is again
    n_file_handlers = sum(
        isinstance(h, logging.FileHandler) for h in lg.handlers
    )
    assert n_file_handlers == 1  # no duplicate handlers on re-setup
    lg.error("加载失败: 日本語テキスト")  # CJK must round-trip
    for h in lg.handlers:
        h.flush()
    assert "加载失败: 日本語テキスト" in log_path.read_text(encoding="utf-8")
