"""REST DDL — driver-side connector setup (K5) and the error-log
sink (K7).

Reference: ``create_page`` (notion_data_ingestion.py:48-80) creates a
workspace parent page unless an id is already configured;
``create_database`` (:83-132) creates a property-typed database under
that page unless ``database_id`` is already set — both idempotent
skips. These are connector *setup*, not query operators, so they run
on the driver with an injectable transport (tests use a file-backed
fake; no network ever).

The error-log sink mirrors data_loading_to_mysql_database.py:16-32:
UTF-8 console + file handler so CJK payloads survive logging.
"""

from __future__ import annotations

import json
import logging
import sys


# The declared database schema (reference notion_data_ingestion.py:
# 106-119 — post-"FIXED" property types).
DATABASE_PROPERTIES: dict[str, dict] = {
    "subject_id": {"title": {}},
    "subject_type": {"number": {}},
    "collection_type": {"number": {}},
    "name_cn": {"rich_text": {}},
    "score": {"number": {}},
    "rank": {"number": {}},
    "collection_total": {"number": {}},
    "created_at": {"rich_text": {}},
    "updated_at": {"date": {}},
    "eps": {"number": {}},
    "air_date": {"rich_text": {}},
    "all_tags": {"rich_text": {}},
}


class FileDdlTransport:
    """Test transport: records each DDL POST as a JSON line and returns
    deterministic ids (``page-1``, ``db-1``, ...)."""

    def __init__(self, out_path: str):
        self.out_path = out_path
        self._n = 0

    def post(self, endpoint: str, payload: dict) -> dict:
        self._n += 1
        kind = "db" if endpoint.endswith("/databases") else "page"
        new_id = f"{kind}-{self._n}"
        with open(self.out_path, "a", encoding="utf-8") as f:
            f.write(
                json.dumps(
                    {"endpoint": endpoint, "payload": payload, "id": new_id},
                    ensure_ascii=False,
                )
                + "\n"
            )
        return {"id": new_id}


class HttpDdlTransport:
    """Live transport (never in tests): POST with bearer auth headers
    (reference headers block, notion_data_ingestion.py:40-46)."""

    def __init__(self, token: str, api_version: str = "2022-06-28"):
        self.headers = {
            "Authorization": f"Bearer {token}",
            "Content-Type": "application/json",
            "Notion-Version": api_version,
        }

    def post(self, endpoint: str, payload: dict) -> dict:
        import requests

        resp = requests.post(endpoint, headers=self.headers, json=payload, timeout=30)
        if resp.status_code != 200:
            raise RuntimeError(f"DDL POST {endpoint} failed: {resp.text}")
        return resp.json()


def create_page(transport, parent_id: str | None, *, title: str = "Bangumi Data Import") -> str:
    """Create the parent page unless an id is already configured
    (reference create_page :48-80, idempotent skip :77-80)."""
    if parent_id is not None:
        return parent_id
    resp = transport.post(
        "https://api.notion.com/v1/pages",
        {
            "parent": {"type": "workspace", "workspace": True},
            "properties": {"title": {"title": [{"text": {"content": title}}]}},
        },
    )
    return resp["id"]


def create_database(
    transport,
    parent_id: str,
    database_id: str | None,
    *,
    title: str = "Bangumi Database",
    properties: dict[str, dict] | None = None,
) -> str:
    """Create the property-typed database unless ``database_id`` is
    already set (reference create_database :83-132, skip :93-96)."""
    if database_id is not None:
        return database_id
    resp = transport.post(
        "https://api.notion.com/v1/databases",
        {
            "parent": {"type": "page_id", "page_id": parent_id},
            "title": [{"type": "text", "text": {"content": title}}],
            "properties": properties or DATABASE_PROPERTIES,
        },
    )
    return resp["id"]


def setup_error_logging(
    log_path: str = "data-loading-errors.log", *, logger_name: str = __name__
) -> logging.Logger:
    """K7: UTF-8 console + file error log (reference
    data_loading_to_mysql_database.py:16-32). Idempotent — calling
    twice does not duplicate handlers."""
    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    have = {
        getattr(h, "baseFilename", None) or type(h).__name__
        for h in logger.handlers
    }
    if "StreamHandler" not in have:
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(fmt)
        logger.addHandler(console)
    import os

    if os.path.abspath(log_path) not in have:
        fh = logging.FileHandler(log_path, encoding="utf-8")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
