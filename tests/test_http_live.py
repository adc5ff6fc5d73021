"""Live ``HttpTransport`` integration tests against an in-process
loopback ``http.server`` — zero external network.

The reference's S6 retry envelope (SURVEY §2.1; 429 → penalty sleep,
5xx → exponential backoff, pooled session: bangumi_data_ingestion.py
:66-90, :117-147, :186-189) was previously unit-covered only via
``ReplayTransport``; these tests drive the REAL requests/urllib3 code
path. The stub server scripts per-request status codes and records
every request's query params plus the client socket's ephemeral port,
so the tests can assert retry counts, backoff ordering (clock mocked),
429 penalty escalation, and TCP connection reuse.
"""

from __future__ import annotations

import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from bangumi_notion_data_integration_project_spark.sources import rest as rest_mod
from bangumi_notion_data_integration_project_spark.sources.rest import (
    LIVE_HTTP_ENV,
    MAX_RETRIES,
    RATE_LIMIT_SLEEP,
    RETRY_BACKOFF,
    HttpTransport,
    PaginatedRestReader,
)


class StubServer:
    """Loopback HTTP server with a scripted response queue.

    ``script`` is a list of (status, payload) consumed one per request;
    when it is empty, ``app(path, params)`` (if set) computes the
    response, else ``default`` is served. Every request is recorded as
    (path, params, client_port) — the client port identifies the TCP
    connection, so equal ports across requests prove pool reuse.
    """

    def __init__(self):
        self.script: list[tuple[int, dict]] = []
        self.app = None
        self.default = (200, {"total": 0, "data": []})
        self.requests: list[tuple[str, dict, int]] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"  # keep-alive → reuse observable

            def do_GET(self):  # noqa: N802 (http.server API)
                u = urlparse(self.path)
                params = {k: v[0] for k, v in parse_qs(u.query).items()}
                outer.requests.append((u.path, params, self.client_address[1]))
                if outer.script:
                    status, payload = outer.script.pop(0)
                elif outer.app is not None:
                    status, payload = outer.app(u.path, params)
                else:
                    status, payload = outer.default
                body = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-request stderr noise
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.httpd.daemon_threads = True
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}/api"
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def server():
    s = StubServer()
    yield s
    s.close()


@pytest.fixture()
def sleeps(monkeypatch):
    """Mock the module's clock; return the recorded sleep durations."""
    recorded: list[float] = []
    # patch the module-level alias, NOT time.sleep: rest_mod.time IS the
    # global time module, and mocking its sleep turns every other
    # thread's 1 s poll into a tight spin that floods the recording
    # (observed: 126k stray entries from a Spark poller)
    monkeypatch.setattr(rest_mod, "_sleep", recorded.append)
    return recorded


def _params_for_cell(cell_id, offset, limit):
    # module-level (not a lambda) so the pickle round-trip test can
    # serialize the transport the way an executor shipment would
    return {"subject_type": cell_id, "offset": offset, "limit": limit}


def _transport(server) -> HttpTransport:
    return HttpTransport(
        server.url, _params_for_cell, headers={"User-Agent": "spark-test"}
    )


PAGE1 = {"total": 3, "limit": 100, "offset": 0, "data": [{"id": 1}]}


def test_retry_envelope_429_then_500_then_200(server, sleeps):
    server.script = [(429, {}), (500, {}), (200, PAGE1)]
    t = _transport(server)
    payload = t.fetch_page("2_1", 0, 100)
    assert payload == PAGE1
    # three attempts hit the wire, all re-requesting the SAME page
    assert len(server.requests) == 3
    assert {tuple(sorted(p.items())) for _, p, _ in server.requests} == {
        (("limit", "100"), ("offset", "0"), ("subject_type", "2_1"))
    }
    # 429 → escalating penalty (attempt 0), 500 → exp backoff (attempt 1)
    assert sleeps == [RATE_LIMIT_SLEEP * 1, RETRY_BACKOFF * 2**1]


def test_all_429_raises_with_cause_and_escalating_penalty(server, sleeps):
    server.script = [(429, {})] * MAX_RETRIES
    t = _transport(server)
    with pytest.raises(RuntimeError, match=r"rate-limited \(HTTP 429\)"):
        t.fetch_page("2_1", 0, 100)
    assert len(server.requests) == MAX_RETRIES
    assert sleeps == [RATE_LIMIT_SLEEP * (i + 1) for i in range(MAX_RETRIES)]


def test_5xx_exponential_backoff_ordering(server, sleeps):
    server.script = [(500, {}), (503, {}), (200, PAGE1)]
    t = _transport(server)
    assert t.fetch_page("2_1", 0, 100) == PAGE1
    assert sleeps == [RETRY_BACKOFF * 2**0, RETRY_BACKOFF * 2**1]


def test_connection_pool_reuse_across_pages(server):
    t = _transport(server)
    for page in range(3):
        t.fetch_page("2_1", page, 100)
    # one Session → one pooled TCP connection: every request arrived on
    # the same client ephemeral port
    ports = {port for _, _, port in server.requests}
    assert len(server.requests) == 3
    assert len(ports) == 1
    assert t._get_session() is t._get_session()


def test_transport_pickles_without_socket_and_reopens(server):
    t = _transport(server)
    t.fetch_page("2_1", 0, 100)  # force session creation
    clone = pickle.loads(pickle.dumps(t))
    assert clone._session is None  # executor-side copy reopens its own pool
    assert clone.fetch_page("2_1", 1, 100) == server.default[1]


def test_reader_live_end_to_end_probe_prune_paginate(server, monkeypatch):
    """Full S1/S2/S3 offset scan through the live transport: planning-time
    count probe (limit=1), empty-cell prune, executor page loop."""
    items = [{"id": i} for i in range(3)]

    def app(path, params):
        cell = params["subject_type"]
        off, lim = int(params["offset"]), int(params["limit"])
        data = items[off : off + lim] if cell == "2_1" else []
        return 200, {"total": len(data) and 3, "limit": lim, "offset": off, "data": data}

    server.app = app
    monkeypatch.setenv(LIVE_HTTP_ENV, "1")
    reader = PaginatedRestReader(
        {
            "mode": "live",
            "base_url": server.url,
            "cells": json.dumps(["2_1", "2_2"]),
            "page_limit": "2",
            "cell_param": "subject_type",
        }
    )
    parts = reader.partitions()
    # probe used limit=1 once per cell; empty cell 2_2 pruned at planning
    probes = [p for _, p, _ in server.requests if p["limit"] == "1"]
    assert {p["subject_type"] for p in probes} == {"2_1", "2_2"}
    assert [(p.cell_id, p.total) for p in parts] == [("2_1", 3)]
    rows = list(reader.read(parts[0]))
    assert [(c, o) for c, o, _ in rows] == [("2_1", 0), ("2_1", 2)]
    got = [d["id"] for _, _, page in rows for d in json.loads(page)["data"]]
    assert got == [0, 1, 2]
