"""Paginated REST scan as a Spark 4 Python Data Source.

Reference semantics (SURVEY §2.1): offset pagination with page size 100
(S1, bangumi_data_ingestion.py:155-258), a limit=1 count probe sizing
each scan (S2, :105-153), one scan cell per (subject_type,
collection_type) pair pruned when empty (S3, :328-359), retry with
exponential backoff and a 429 penalty sleep (S6, :66-90,117-147).

Spark-first restatement: each category cell is one ``InputPartition``,
so cells fetch **in parallel across executors** instead of the
reference's serial loop; empty cells are pruned at planning time
(partition pruning); the page loop + backoff live inside the partition
reader. The source emits raw page JSON (one row per page) — all
flattening stays declarative in DataFrame land (sources/bangumi.py).

Transports:
- ``HttpTransport`` — requests.Session with urllib3 Retry (429/5xx),
  exponential backoff, politeness delay. Never used in tests.
- ``ReplayTransport`` — reads recorded page JSON from a fixture
  directory: ``{cell_id}_page{N}.json`` (deterministic, no network).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGE_LIMIT = 100  # reference LIMIT, bangumi_data_ingestion.py:46
MAX_RETRIES = 3  # :49
RETRY_BACKOFF = 1.0  # :52  (sleep = RETRY_BACKOFF * 2**attempt)
RATE_LIMIT_SLEEP = 10.0  # 429 penalty, :186-189


class ReplayTransport:
    """Deterministic page transport reading fixture files.

    Layout: ``{fixture_dir}/{cell_id}_page{N}.json`` where N is the
    0-based page index; each file is one API page payload
    (FIXTURES.md F1). Picklable → usable inside executor-side readers.
    """

    def __init__(self, fixture_dir: str):
        self.fixture_dir = fixture_dir

    def fetch_page(self, cell_id: str, page_index: int, limit: int) -> dict:
        path = os.path.join(self.fixture_dir, f"{cell_id}_page{page_index}.json")
        if not os.path.exists(path):
            return {"total": 0, "limit": limit, "offset": page_index * limit, "data": []}
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    def probe_total(self, cell_id: str) -> int:
        return int(self.fetch_page(cell_id, 0, 1).get("total", 0))


class HttpTransport:
    """Live HTTP transport with the reference's retry/backoff policy.

    Kept import-light (requests imported lazily) and never exercised in
    tests; the policy constants mirror the reference exactly.
    """

    def __init__(self, base_url: str, params_for_cell, headers: dict | None = None):
        self.base_url = base_url
        self.params_for_cell = params_for_cell  # (cell_id, offset, limit) -> params dict
        self.headers = headers or {}

    def _get(self, params: dict) -> dict:
        import requests  # local import: executors without the lib fail loudly here only

        last_err: Exception | None = None
        for attempt in range(MAX_RETRIES):
            try:
                resp = requests.get(
                    self.base_url, params=params, headers=self.headers, timeout=30
                )
                if resp.status_code == 429:
                    time.sleep(RATE_LIMIT_SLEEP)
                    continue
                resp.raise_for_status()
                return resp.json()
            except Exception as e:  # noqa: BLE001
                last_err = e
                time.sleep(RETRY_BACKOFF * 2**attempt)
        raise RuntimeError(f"REST fetch failed after {MAX_RETRIES} retries: {last_err}")

    def fetch_page(self, cell_id: str, page_index: int, limit: int) -> dict:
        return self._get(self.params_for_cell(cell_id, page_index * limit, limit))

    def probe_total(self, cell_id: str) -> int:
        return int(self.fetch_page(cell_id, 0, 1).get("total", 0))


@dataclass
class CellPartition(InputPartition):
    cell_id: str
    total: int


class PaginatedRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.cell_ids = json.loads(options.get("cells", "[]"))
        self.page_limit = int(options.get("page_limit", PAGE_LIMIT))
        self.fixture_dir = options.get("fixture_dir", "")
        if options.get("mode", "replay") != "replay":
            raise NotImplementedError(
                "live HTTP mode is wired via HttpTransport but intentionally not "
                "reachable from the DataSource (tests must never hit the network); "
                "use replay mode"
            )

    def _transport(self) -> ReplayTransport:
        return ReplayTransport(self.fixture_dir)

    def partitions(self):
        # Planning-time probe-and-prune (reference get_all_category_totals
        # :328-359 + skip-empty :352-355): one partition per non-empty cell.
        t = self._transport()
        parts = []
        for cell_id in self.cell_ids:
            total = t.probe_total(cell_id)
            if total > 0:
                parts.append(CellPartition(cell_id=cell_id, total=total))
        return parts

    def read(self, partition: CellPartition):
        # Executor-side page loop (reference fetch_single_category
        # :155-258): advance offset until page empty or total reached.
        t = self._transport()
        offset = 0
        page_index = 0
        while True:
            payload = t.fetch_page(partition.cell_id, page_index, self.page_limit)
            data = payload.get("data") or []
            if not data:
                break
            yield (partition.cell_id, offset, json.dumps(payload, ensure_ascii=False))
            offset += self.page_limit
            page_index += 1
            if offset >= payload.get("total", 0):
                break


class PaginatedRestDataSource(DataSource):
    """``spark.read.format("paginated_rest")`` source.

    Options: cells (JSON list of cell ids), fixture_dir, page_limit,
    mode=replay. Register with
    ``spark.dataSource.register(PaginatedRestDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> str:
        return "cell_id string, offset bigint, page string"

    def reader(self, schema) -> PaginatedRestReader:
        return PaginatedRestReader(self.options)
