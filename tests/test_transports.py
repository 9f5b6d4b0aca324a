"""End-to-end transport bindings: real HTTP requests against the
``http.server`` facade binding (202 background-fetch path included) and
a real line-delimited JSON session against the stdio tool loop — the
reference's two front doors (FastAPI ``main.py:105-233``; MCP stdio
``server.py:147-181``) driven over actual wire bytes."""

from __future__ import annotations

import http.client
import io
import json
import urllib.error
import urllib.request

import pytest

from sec_financial_pipeline_spark.plans.background import BackgroundFetcher
from sec_financial_pipeline_spark.plans.facade import ServingFacade
from sec_financial_pipeline_spark.plans.tools import ToolRegistry
from sec_financial_pipeline_spark.transport.http import FacadeHTTPServer
from sec_financial_pipeline_spark.transport.stdio import (
    handle_request,
    serve_stdio,
)


@pytest.fixture(scope="module")
def http_srv(spark, sf_dir):
    fetched: list[str] = []
    fetcher = BackgroundFetcher(fetched.append)
    srv = FacadeHTTPServer(ServingFacade(spark, sf_dir), fetcher)
    srv.start()
    srv.fetched = fetched  # type: ignore[attr-defined]
    yield srv
    srv.shutdown()


def _get(srv, path: str):
    url = f"http://127.0.0.1:{srv.port}{path}"
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def _post(srv, path: str, body: dict | None = None):
    url = f"http://127.0.0.1:{srv.port}{path}"
    data = json.dumps(body or {}).encode()
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_http_health(http_srv):
    status, ctype, body = _get(http_srv, "/health")
    assert status == 200 and ctype == "application/json"
    assert json.loads(body)["status"] == "healthy"


def test_http_company_facts_and_cache(http_srv):
    status, _, body = _get(http_srv, "/financials/T01")
    assert status == 200
    out = json.loads(body)
    assert out["ticker"] == "T01" and out["n_facts"] == len(out["facts"]) > 0
    # warm-key repeat serves from the result cache
    status2, _, body2 = _get(http_srv, "/financials/T01")
    assert status2 == 200 and json.loads(body2) == out


def test_http_miss_returns_202_and_queues_fetch(http_srv):
    status, _, body = _get(http_srv, "/financials/ZZZZ")
    assert status == 202
    assert "Fetching in background" in json.loads(body)["detail"]
    http_srv.fetcher.run_pending()
    assert "ZZZZ" in http_srv.fetched


def test_http_metric_series_formats(http_srv):
    status, _, body = _get(http_srv, "/financials/T01/revenue")
    assert status == 200
    out = json.loads(body)
    assert out["metric"] == "revenue" and out["n_periods"] > 0

    status, ctype, csv = _get(http_srv, "/financials/T01/revenue?format=csv")
    assert status == 200 and ctype == "text/csv"
    header = csv.decode().splitlines()[0]
    assert "fiscal_year" in header and "value" in header

    status, ctype, pq = _get(http_srv, "/financials/T01/revenue?format=parquet")
    assert status == 200 and ctype == "application/octet-stream"
    assert pq[:4] == b"PAR1"  # parquet magic


def test_http_compare(http_srv):
    status, body = _post(
        http_srv,
        "/financials/compare",
        {"tickers": ["T01", "T02"], "metric": "revenue"},
    )
    assert status == 200
    out = json.loads(body)
    assert out["tickers"] == ["T01", "T02"] and len(out["rows"]) > 0
    assert {"fiscal_year", "T01", "T02"} <= set(out["rows"][0])


def test_http_years_clips_to_most_recent(http_srv):
    _, _, full = _get(http_srv, "/financials/T01/revenue")
    all_years = [r["fiscal_year"] for r in json.loads(full)["series"]]
    status, _, body = _get(http_srv, "/financials/T01/revenue?years=3")
    assert status == 200
    out = json.loads(body)
    assert out["n_periods"] == 3
    assert [r["fiscal_year"] for r in out["series"]] == sorted(all_years)[-3:]


def test_http_error_taxonomy(http_srv):
    assert _get(http_srv, "/financials/NOT%20OK!!!")[0] == 400  # bad ticker
    assert _get(http_srv, "/financials/T01/revenue?format=xml")[0] == 400
    assert _get(http_srv, "/financials/T01/revenue?years=0")[0] == 400
    assert _get(http_srv, "/financials/T01/revenue?years=21")[0] == 400
    assert _get(http_srv, "/financials/T01/revenue?years=abc")[0] == 400
    assert _get(http_srv, "/nope")[0] == 404


def test_http_data_management_routes(http_srv):
    status, _, body = _get(http_srv, "/data/tickers")
    assert status == 200
    out = json.loads(body)
    assert out["total_tickers"] == len(out["tickers"]) > 0
    assert "T01" in out["freshness_sample"]
    sample = out["freshness_sample"]["T01"]
    assert sample["n_facts"] > 0 and sample["covered_periods"]

    status, _, body = _get(http_srv, "/data/ticker/T01/info")
    assert status == 200
    info = json.loads(body)
    assert info["ticker"] == "T01" and info["total_files"] >= 1
    assert info["total_records"] == sum(
        f["record_count"] for f in info["files"]
    )
    assert _get(http_srv, "/data/ticker/QQQQ/info")[0] == 404

    status, _, body = _get(http_srv, "/storage/stats")
    assert status == 200
    st = json.loads(body)
    assert "orders" in st["tables"] and st["total_rows"] > 0
    assert st["total_bytes"] == sum(
        v["total_bytes"] for v in st["tables"].values()
    )

    status, _, body = _get(http_srv, "/etl/status")
    assert status == 200
    assert "counts" in json.loads(body)

    status, _, body = _get(http_srv, "/cache/stats")
    assert status == 200 and json.loads(body)["size"] >= 1

    status, body = _post(http_srv, "/cache/clear")
    assert status == 200
    cleared = json.loads(body)
    assert cleared["cleared_count"] >= 1
    _, _, after = _get(http_srv, "/cache/stats")
    assert json.loads(after)["size"] == 0


def test_http_etl_trigger_and_invalidate(http_srv):
    status, body = _post(http_srv, "/etl/fetch/T07")
    assert status == 200 and json.loads(body)["ticker"] == "T07"

    # warm a T01 key first (an earlier test may have cleared the cache)
    assert _get(http_srv, "/financials/T01")[0] == 200
    url = f"http://127.0.0.1:{http_srv.port}/cache/T01"
    req = urllib.request.Request(url, method="DELETE")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert json.loads(r.read())["invalidated"] >= 1  # warm keys dropped


@pytest.fixture(scope="module")
def registry(spark, sf_dir):
    return ToolRegistry(spark, sf_dir)


def test_stdio_list_and_call_roundtrip(registry):
    stdin = io.StringIO(
        json.dumps({"id": 1, "method": "tools/list"})
        + "\n"
        + json.dumps(
            {
                "id": 2,
                "method": "tools/call",
                "params": {
                    "name": "get_financial_metric",
                    "arguments": {"ticker": "T01", "metric": "revenue"},
                },
            }
        )
        + "\nnot json at all\n"
        + json.dumps({"id": 4, "method": "tools/call", "params": {"name": "nope"}})
        + "\n"
    )
    stdout = io.StringIO()
    n = serve_stdio(registry, stdin, stdout)
    assert n == 4
    r1, r2, r3, r4 = [json.loads(x) for x in stdout.getvalue().splitlines()]

    assert r1["id"] == 1
    names = {t["name"] for t in r1["result"]["tools"]}
    assert {
        "get_company_financials",
        "get_financial_metric",
        "compare_companies",
        "analyze_financial_trends",
        "generate_financial_report",
        "get_available_metrics",
    } <= names

    assert r2["id"] == 2
    content = r2["result"]["content"]
    assert content[0]["type"] == "text"
    payload = json.loads(content[0]["text"])
    assert payload["ticker"] == "T01" and payload["metric"] == "revenue"

    assert r3["id"] is None and "bad JSON" in r3["error"]
    assert r4["id"] == 4 and "Unknown tool" in r4["error"]


def test_stdio_resources(registry):
    listed = handle_request(registry, {"id": 5, "method": "resources/list"})
    uris = {r["uri"] for r in listed["result"]["resources"]}
    assert uris == {"sec://companies/all", "sec://metrics/available"}

    read = handle_request(
        registry,
        {"id": 6, "method": "resources/read",
         "params": {"uri": "sec://companies/all"}},
    )
    contents = read["result"]["contents"][0]
    assert contents["uri"] == "sec://companies/all"
    companies = json.loads(contents["text"])["companies"]
    assert len(companies) == 25 and {"ticker", "cik", "sector"} <= set(companies[0])

    metrics = handle_request(
        registry,
        {"id": 7, "method": "resources/read",
         "params": {"uri": "sec://metrics/available"}},
    )
    assert "revenue" in metrics["result"]["contents"][0]["text"]

    unknown = handle_request(
        registry,
        {"id": 8, "method": "resources/read", "params": {"uri": "sec://nope"}},
    )
    assert "Unknown resource" in unknown["result"]["contents"][0]["text"]


def test_stdio_unknown_method(registry):
    resp = handle_request(registry, {"id": 9, "method": "prompts/list"})
    assert resp["id"] == 9 and "unknown method" in resp["error"]


# ---------------------------------------------------------------------------
# GZip at the HTTP edge (reference GZipMiddleware, main.py:54): bodies
# >= 1000 bytes compress when the client advertises gzip; small bodies
# and clients without Accept-Encoding get identity bytes.
# ---------------------------------------------------------------------------


def _get_hdr(srv, path: str, headers: dict[str, str]):
    url = f"http://127.0.0.1:{srv.port}{path}"
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req) as r:
        return r.status, dict(r.headers), r.read()


def test_http_gzip_large_json_body(http_srv):
    import gzip as gz

    _, _, plain = _get(http_srv, "/financials/T01")
    assert len(plain) >= 1000  # precondition for the threshold path

    status, hdrs, body = _get_hdr(
        http_srv, "/financials/T01", {"Accept-Encoding": "gzip"}
    )
    assert status == 200 and hdrs.get("Content-Encoding") == "gzip"
    assert len(body) < len(plain)  # actually smaller on the wire
    assert json.loads(gz.decompress(body)) == json.loads(plain)


def test_http_gzip_skips_small_and_identity_clients(http_srv):
    # /health is tiny -> identity even when gzip is accepted
    status, hdrs, body = _get_hdr(
        http_srv, "/health", {"Accept-Encoding": "gzip"}
    )
    assert status == 200 and hdrs.get("Content-Encoding") is None
    assert json.loads(body)["status"] == "healthy"

    # no Accept-Encoding -> identity regardless of size
    status, hdrs, body = _get(http_srv, "/financials/T01")
    assert status == 200 and json.loads(body)["ticker"] == "T01"


def test_http_gzip_exempts_parquet(http_srv):
    status, hdrs, body = _get_hdr(
        http_srv,
        "/financials/T01/revenue?format=parquet",
        {"Accept-Encoding": "gzip"},
    )
    assert status == 200 and hdrs.get("Content-Encoding") is None
    assert body[:4] == b"PAR1"


# ---------------------------------------------------------------------------
# 202 path actually resolves: a completed background fetch invalidates
# the cached known-ticker set, so the promised retry can see new data.
# ---------------------------------------------------------------------------


def test_http_fetch_completion_invalidates_known_set(http_srv):
    status, _, _ = _get(http_srv, "/financials/ZZZX")
    assert status == 202
    assert http_srv._known is not None  # probe populated the cache
    http_srv.fetcher.run_pending()
    assert http_srv._known is None  # completion listener dropped it


def test_known_set_not_republished_after_midflight_invalidation(http_srv):
    """Generation-counter guard: a fetch completing while known_tickers'
    collect is in flight must not have its invalidation overwritten by
    the stale snapshot (the snapshot is still RETURNED to that caller,
    it just isn't re-cached)."""
    http_srv.invalidate_known()
    real_facts = http_srv.facade._facts

    def facts_with_midflight_completion():
        # simulate a background fetch landing during the collect
        http_srv.invalidate_known()
        return real_facts()

    http_srv.facade._facts = facts_with_midflight_completion
    try:
        snapshot = http_srv.known_tickers()
        assert len(snapshot) > 0  # caller still gets a usable set
        assert http_srv._known is None  # ...but it was NOT re-cached
    finally:
        http_srv.facade._facts = real_facts
    # next probe (no concurrent invalidation) caches normally
    http_srv.known_tickers()
    assert http_srv._known is not None


def test_http_etl_fetch_validates_ticker(http_srv):
    status, body = _post(http_srv, "/etl/fetch/NOT%20OK!!!")
    assert status == 400  # malformed ticker never reaches the queue
    assert "detail" in json.loads(body)
    assert not any("NOT" in t for t in http_srv.fetcher.status()["jobs"])


# ---------------------------------------------------------------------------
# SSE MCP transport: the reference's network mode
# (scripts/run_mcp_server.py:43-69) — endpoint handshake on GET /sse,
# requests via POST /messages, responses as on-stream message events,
# sharing handle_request with the stdio loop.
# ---------------------------------------------------------------------------


def _read_event(fp):
    """Parse one SSE frame (event name, joined data) off a stream."""
    event, data = None, []
    while True:
        line = fp.readline().decode()
        if not line:
            raise AssertionError("SSE stream closed mid-frame")
        if line.strip() == "":
            if event is not None or data:
                return event, "\n".join(data)
            continue
        if line.startswith("event:"):
            event = line.split(":", 1)[1].strip()
        elif line.startswith("data:"):
            data.append(line.split(":", 1)[1].strip())


@pytest.fixture(scope="module")
def sse_srv(registry):
    from sec_financial_pipeline_spark.transport.sse import MCPSSEServer

    srv = MCPSSEServer(registry)
    srv.start()
    yield srv
    srv.shutdown()


@pytest.fixture()
def sse_stream(sse_srv):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", sse_srv.port, timeout=30)
    conn.request("GET", "/sse")
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "text/event-stream"
    yield sse_srv, conn, resp
    conn.close()


def test_sse_handshake_and_tool_call(sse_stream):
    sse_srv, conn, resp = sse_stream
    event, endpoint = _read_event(resp.fp)
    assert event == "endpoint" and endpoint.startswith("/messages?session_id=")

    def post(obj):
        c = http.client.HTTPConnection("127.0.0.1", sse_srv.port, timeout=30)
        c.request(
            "POST", endpoint, body=json.dumps(obj),
            headers={"Content-Type": "application/json"},
        )
        r = c.getresponse()
        out = (r.status, json.loads(r.read()))
        c.close()
        return out

    status, ack = post({"id": 1, "method": "tools/list"})
    assert status == 202 and ack["status"] == "accepted"
    event, data = _read_event(resp.fp)
    assert event == "message"
    listed = json.loads(data)
    names = {t["name"] for t in listed["result"]["tools"]}
    assert listed["id"] == 1 and "get_financial_metric" in names

    # a real tool call over the same session — identical result shape to
    # the stdio loop (shared dispatch)
    status, _ = post(
        {
            "id": 2,
            "method": "tools/call",
            "params": {
                "name": "get_financial_metric",
                "arguments": {"ticker": "T01", "metric": "revenue"},
            },
        }
    )
    assert status == 202
    event, data = _read_event(resp.fp)
    called = json.loads(data)
    payload = json.loads(called["result"]["content"][0]["text"])
    assert called["id"] == 2
    assert payload["ticker"] == "T01" and payload["metric"] == "revenue"

    # malformed JSON never kills the stream: id-less error frame
    c = http.client.HTTPConnection("127.0.0.1", sse_srv.port, timeout=30)
    c.request("POST", endpoint, body="{nope")
    assert c.getresponse().status == 202
    c.close()
    event, data = _read_event(resp.fp)
    err = json.loads(data)
    assert err["id"] is None and "bad JSON" in err["error"]


def test_sse_unknown_session_and_routes(sse_srv):
    import http.client

    c = http.client.HTTPConnection("127.0.0.1", sse_srv.port, timeout=30)
    c.request("POST", "/messages?session_id=deadbeef", body="{}")
    assert c.getresponse().status == 404
    c.close()

    c = http.client.HTTPConnection("127.0.0.1", sse_srv.port, timeout=30)
    c.request("GET", "/nope")
    assert c.getresponse().status == 404
    c.close()


# ---------------------------------------------------------------------------
# WebSocket MCP transport: the reference's third mode
# (scripts/run_mcp_server.py:72-97) — RFC 6455 handshake + masked text
# frames from a raw-socket client, same dispatch as stdio/SSE.
# ---------------------------------------------------------------------------


def _ws_connect(port):
    import base64
    import os
    import socket

    from sec_financial_pipeline_spark.transport.ws import accept_key

    s = socket.create_connection(("127.0.0.1", port), timeout=30)
    key = base64.b64encode(os.urandom(16)).decode()
    s.sendall(
        (
            f"GET /ws HTTP/1.1\r\nHost: 127.0.0.1:{port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += s.recv(4096)
    assert buf.split(b"\r\n", 1)[0].endswith(b"101 Switching Protocols")
    assert accept_key(key).encode() in buf  # RFC 6455 accept echo
    return s


def _ws_send(s, opcode: int, payload: bytes):
    import os
    import struct

    mask = os.urandom(4)
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    n = len(payload)
    if n < 126:
        header = bytes([0x80 | opcode, 0x80 | n])
    elif n < (1 << 16):
        header = bytes([0x80 | opcode, 0x80 | 126]) + struct.pack(">H", n)
    else:
        header = bytes([0x80 | opcode, 0x80 | 127]) + struct.pack(">Q", n)
    s.sendall(header + mask + masked)


def _ws_recv(s):
    import struct

    def readn(k):
        d = b""
        while len(d) < k:
            c = s.recv(k - len(d))
            if not c:
                raise AssertionError("ws closed mid-frame")
            d += c
        return d

    h = readn(2)
    op, ln = h[0] & 0x0F, h[1] & 0x7F
    if ln == 126:
        ln = struct.unpack(">H", readn(2))[0]
    elif ln == 127:
        ln = struct.unpack(">Q", readn(8))[0]
    return op, readn(ln)


@pytest.fixture(scope="module")
def ws_srv(registry):
    from sec_financial_pipeline_spark.transport.ws import MCPWebSocketServer

    srv = MCPWebSocketServer(registry)
    srv.start()
    yield srv
    srv.shutdown()


def test_ws_roundtrip_ping_and_close(ws_srv):
    s = _ws_connect(ws_srv.port)
    try:
        _ws_send(s, 0x1, json.dumps({"id": 1, "method": "tools/list"}).encode())
        op, payload = _ws_recv(s)
        assert op == 0x1
        listed = json.loads(payload)
        names = {t["name"] for t in listed["result"]["tools"]}
        assert listed["id"] == 1 and "get_financial_metric" in names

        _ws_send(
            s,
            0x1,
            json.dumps(
                {
                    "id": 2,
                    "method": "tools/call",
                    "params": {
                        "name": "get_financial_metric",
                        "arguments": {"ticker": "T01", "metric": "revenue"},
                    },
                }
            ).encode(),
        )
        op, payload = _ws_recv(s)
        out = json.loads(payload)
        body = json.loads(out["result"]["content"][0]["text"])
        assert out["id"] == 2 and body["ticker"] == "T01"

        # ping -> pong with echoed payload
        _ws_send(s, 0x9, b"hb")
        op, payload = _ws_recv(s)
        assert op == 0xA and payload == b"hb"

        # malformed JSON: id-less error frame, connection survives
        _ws_send(s, 0x1, b"{nope")
        op, payload = _ws_recv(s)
        err = json.loads(payload)
        assert err["id"] is None and "bad JSON" in err["error"]

        # clean close handshake
        _ws_send(s, 0x8, b"")
        op, _ = _ws_recv(s)
        assert op == 0x8
    finally:
        s.close()


def test_ws_rejects_non_upgrade(ws_srv):
    status, _, _ = _get(ws_srv, "/ws")
    assert status == 400
    status, _, _ = _get(ws_srv, "/nope")
    assert status == 404


# ---------------------------------------------------------------------------
# CORS (reference CORSMiddleware, main.py:45-52): wildcard default,
# preflight OPTIONS, configured-origin allowlist.
# ---------------------------------------------------------------------------


def test_cors_wildcard_and_preflight(http_srv):
    # wildcard config sends the LITERAL '*' and NO credentials header —
    # exactly the reference default. Reflecting the origin there would
    # be strictly MORE permissive (any site could make credentialed
    # calls); origin reflection + credentials is reserved for an
    # explicit allowlist (test_cors_origin_allowlist).
    status, hdrs, _ = _get_hdr(
        http_srv, "/health", {"Origin": "http://example.test"}
    )
    assert status == 200
    assert hdrs.get("Access-Control-Allow-Origin") == "*"
    assert hdrs.get("Access-Control-Allow-Credentials") is None
    assert "Origin" in hdrs.get("Vary", "")

    # no Origin header -> no CORS headers (not a browser request)
    status, hdrs, _ = _get_hdr(http_srv, "/health", {})
    assert status == 200 and hdrs.get("Access-Control-Allow-Origin") is None

    req = urllib.request.Request(
        f"http://127.0.0.1:{http_srv.port}/financials/compare",
        method="OPTIONS",
        headers={
            "Origin": "http://example.test",
            "Access-Control-Request-Method": "POST",
        },
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 204
        assert r.headers["Access-Control-Allow-Origin"] == "*"
        assert "POST" in r.headers["Access-Control-Allow-Methods"]

    # bare OPTIONS (no Origin, e.g. a capability probe) is answered,
    # not rejected
    req = urllib.request.Request(
        f"http://127.0.0.1:{http_srv.port}/health", method="OPTIONS"
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 204 and "GET" in r.headers["Allow"]


def test_cors_origin_allowlist(spark, sf_dir):
    srv = FacadeHTTPServer(
        ServingFacade(spark, sf_dir), cors_origins=["http://ok.test"]
    )
    srv.start()
    try:
        status, hdrs, _ = _get_hdr(srv, "/health", {"Origin": "http://ok.test"})
        assert hdrs.get("Access-Control-Allow-Origin") == "http://ok.test"
        assert hdrs.get("Access-Control-Allow-Credentials") == "true"
        status, hdrs, _ = _get_hdr(srv, "/health", {"Origin": "http://evil.test"})
        assert status == 200  # non-CORS clients unaffected
        assert hdrs.get("Access-Control-Allow-Origin") is None
    finally:
        srv.shutdown()


def test_non_object_json_yields_error_frame_everywhere(registry, sse_srv):
    """Valid JSON that is not an object (42, [], \"x\") must come back
    as an id-less error on every transport, never crash the loop."""
    # stdio: direct dispatch
    for payload in (42, [1, 2], "x"):
        resp = handle_request(registry, payload)  # type: ignore[arg-type]
        assert resp["id"] is None and "JSON object" in resp["error"]

    # stdio loop: the line parses as JSON but isn't an object
    stdin = io.StringIO("42\n")
    stdout = io.StringIO()
    assert serve_stdio(registry, stdin, stdout) == 1
    out = json.loads(stdout.getvalue())
    assert out["id"] is None and "JSON object" in out["error"]

    # SSE: the POST must still be acknowledged and the error framed
    conn = http.client.HTTPConnection("127.0.0.1", sse_srv.port, timeout=30)
    conn.request("GET", "/sse")
    resp = conn.getresponse()
    _, endpoint = _read_event(resp.fp)
    c = http.client.HTTPConnection("127.0.0.1", sse_srv.port, timeout=30)
    c.request("POST", endpoint, body="[1, 2]")
    assert c.getresponse().status == 202
    c.close()
    event, data = _read_event(resp.fp)
    err = json.loads(data)
    assert event == "message" and err["id"] is None
    assert "JSON object" in err["error"]
    conn.close()


def test_ws_non_object_json_survives(ws_srv):
    s = _ws_connect(ws_srv.port)
    try:
        _ws_send(s, 0x1, b"42")
        op, payload = _ws_recv(s)
        err = json.loads(payload)
        assert err["id"] is None and "JSON object" in err["error"]
        # connection still serves real requests afterwards
        _ws_send(s, 0x1, json.dumps({"id": 1, "method": "tools/list"}).encode())
        op, payload = _ws_recv(s)
        assert json.loads(payload)["id"] == 1
    finally:
        s.close()
