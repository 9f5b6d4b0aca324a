"""Line-delimited JSON tool loop over :class:`ToolRegistry` — the
stdlib twin of the reference MCP server's stdio transport
(``reference/src/sec_mcp/server.py:147-181`` name-based dispatch;
``scripts/run_mcp_server.py:22-47`` stdio wiring).

Protocol (one JSON object per line, request/response by ``id``):

    -> {"id": 1, "method": "tools/list"}
    <- {"id": 1, "result": {"tools": [{"name": ..., "inputSchema": ...}]}}

    -> {"id": 2, "method": "tools/call",
        "params": {"name": "get_financial_metric",
                   "arguments": {"ticker": "T01", "metric": "revenue"}}}
    <- {"id": 2, "result": {"content": [{"type": "text", "text": "..."}]}}

Tool results are serialized to a single text content block exactly like
the reference (``json.dumps(result, default=str)`` at server.py:170-176)
so any MCP-shaped client consumes them unchanged. Errors never kill the
loop: unknown tools / bad arguments come back as ``{"error": ...}`` on
the same ``id`` and the loop reads the next line — the reference's
catch-and-report behavior.
"""

from __future__ import annotations

import json
from typing import Any, TextIO

from sec_financial_pipeline_spark.plans.tools import ToolRegistry


#: The two MCP resources the reference publishes (``server.py:185-199``),
#: re-pointed at the engine's own datasets.
RESOURCES = [
    {
        "uri": "sec://companies/all",
        "name": "Companies",
        "description": "All companies with tickers, CIKs and sectors",
        "mimeType": "application/json",
    },
    {
        "uri": "sec://metrics/available",
        "name": "Available Financial Metrics",
        "description": "List of all available financial metrics",
        "mimeType": "application/json",
    },
]


def _read_resource(registry: ToolRegistry, uri: str) -> str:
    """Resource bodies (``server.py:202-237``): companies come from the
    engine's companies dim, metrics from the alias map."""
    from sec_financial_pipeline_spark.plans import domain

    if uri == "sec://companies/all":
        rows = (
            domain.companies_df(registry.spark, registry.sf_dir)
            .orderBy("ticker")
            .collect()
        )
        return json.dumps(
            {"companies": [r.asDict() for r in rows]}, indent=2, default=str
        )
    if uri == "sec://metrics/available":
        return json.dumps(
            registry.call("get_available_metrics"), indent=2, default=str
        )
    return f"Unknown resource: {uri}"


def handle_request(registry: ToolRegistry, request: dict[str, Any]) -> dict[str, Any]:
    """Dispatch one request object; always returns a response object."""
    if not isinstance(request, dict):
        # valid JSON that isn't an object (42, [], "x") must produce an
        # id-less error frame, not crash the transport loop
        return {"id": None, "error": f"request must be a JSON object, got {type(request).__name__}"}
    rid = request.get("id")
    method = request.get("method")
    try:
        if method == "tools/list":
            return {"id": rid, "result": {"tools": registry.list_tools()}}
        if method == "tools/call":
            params = request.get("params") or {}
            name = params.get("name", "")
            args = params.get("arguments") or {}
            result = registry.call(name, **args)
            text = json.dumps(result, indent=2, default=str)
            return {
                "id": rid,
                "result": {"content": [{"type": "text", "text": text}]},
            }
        if method == "resources/list":
            return {"id": rid, "result": {"resources": RESOURCES}}
        if method == "resources/read":
            uri = (request.get("params") or {}).get("uri", "")
            return {
                "id": rid,
                "result": {
                    "contents": [
                        {"uri": uri, "text": _read_resource(registry, uri)}
                    ]
                },
            }
        return {"id": rid, "error": f"unknown method: {method!r}"}
    except (KeyError, TypeError, ValueError) as e:
        return {"id": rid, "error": str(e)}
    except Exception as e:  # engine failure: report, keep serving
        return {"id": rid, "error": f"internal: {e}"}


def serve_stdio(registry: ToolRegistry, stdin: TextIO, stdout: TextIO) -> int:
    """Read JSON lines until EOF; returns how many requests were served.
    Malformed JSON produces an id-less error response (the loop always
    answers, never crashes)."""
    n = 0
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            resp: dict[str, Any] = {"id": None, "error": f"bad JSON: {e}"}
        else:
            resp = handle_request(registry, req)
        stdout.write(json.dumps(resp, default=str) + "\n")
        stdout.flush()
        n += 1
    return n


def main(sf_dir: str) -> None:
    """Blocking stdio entrypoint (the ``run_mcp_server.py`` analog)."""
    import sys

    from sec_financial_pipeline_spark.session import get_spark

    registry = ToolRegistry(get_spark(app_name="sfp-tools"), sf_dir)
    serve_stdio(registry, sys.stdin, sys.stdout)
