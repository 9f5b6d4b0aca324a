"""Network MCP transport: SSE over stdlib ``http.server`` — the twin of
the reference's SSE mode (``reference/scripts/run_mcp_server.py:43-69``,
endpoints ``/sse`` + ``/messages``), sharing the exact dispatch loop
with the stdio binding (:func:`transport.stdio.handle_request`), so the
tool semantics are transport-independent by construction.

Wire protocol (the MCP HTTP+SSE shape):

- ``GET /sse`` opens a long-lived ``text/event-stream``. The first frame
  is the session handshake::

      event: endpoint
      data: /messages?session_id=<hex>

  After that, every response to a posted request arrives on THIS stream
  as::

      event: message
      data: {"id": ..., "result": ...}

- ``POST /messages?session_id=<hex>`` accepts one JSON request object
  (same schema as a stdio line), dispatches it through
  :func:`handle_request`, enqueues the response onto the session's
  stream, and answers ``202 Accepted`` — responses travel down the SSE
  channel, never the POST body (the MCP SSE contract).

Unknown session ids are 404; malformed JSON comes back on-stream as an
id-less error frame, mirroring the stdio loop's never-crash behavior.
The server is threading: each SSE stream holds one handler thread
blocked on its session queue; POSTs are served concurrently.
"""

from __future__ import annotations

import json
import queue
import secrets
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlparse

from sec_financial_pipeline_spark.plans.tools import ToolRegistry
from sec_financial_pipeline_spark.transport.stdio import handle_request

#: poll granularity for the stream loop — how quickly shutdown is
#: noticed; responses themselves are pushed without added latency
_POLL_SECONDS = 0.1

#: idle polls between keepalive comment frames (~15 s). The write is
#: what detects a silently-dead client: without it, a handler blocked
#: on its queue would leak the thread + session forever.
_KEEPALIVE_POLLS = 150


class _Session:
    def __init__(self) -> None:
        self.outbox: queue.Queue[dict[str, Any]] = queue.Queue()
        self.closed = threading.Event()


class MCPSSEServer:
    """Bind a :class:`ToolRegistry` to a TCP port over SSE. ``port=0``
    picks a free port (exposed as ``.port``) — the shape the tests
    drive, like :class:`transport.http.FacadeHTTPServer`."""

    def __init__(
        self,
        registry: ToolRegistry,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.registry = registry
        self._sessions: dict[str, _Session] = {}
        self._lock = threading.Lock()
        self._stopping = threading.Event()
        # bounded dispatch pool: POSTs 202 and return immediately, but a
        # flood of requests queues here instead of spawning an OS thread
        # (and a concurrent Spark job) per request
        from concurrent.futures import ThreadPoolExecutor

        self._dispatch_pool = ThreadPoolExecutor(
            max_workers=8, thread_name_prefix="sse-dispatch"
        )
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # -- session registry --------------------------------------------------

    def open_session(self) -> tuple[str, _Session]:
        sid = secrets.token_hex(8)
        sess = _Session()
        with self._lock:
            self._sessions[sid] = sess
        return sid, sess

    def get_session(self, sid: str) -> _Session | None:
        with self._lock:
            return self._sessions.get(sid)

    def close_session(self, sid: str) -> None:
        with self._lock:
            sess = self._sessions.pop(sid, None)
        if sess is not None:
            sess.closed.set()

    # -- lifecycle ---------------------------------------------------------

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def start(self) -> None:
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._stopping.set()
        with self._lock:
            for sess in self._sessions.values():
                sess.closed.set()
            self._sessions.clear()
        self._dispatch_pool.shutdown(wait=False, cancel_futures=True)
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)


def _sse_frame(event: str, data: str) -> bytes:
    # multi-line data must become one data: line per line (SSE spec)
    lines = "".join(f"data: {ln}\n" for ln in data.splitlines() or [""])
    return f"event: {event}\n{lines}\n".encode()


def _make_handler(srv: MCPSSEServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt: str, *args: Any) -> None:
            pass

        def _send_json(self, status: int, obj: Any) -> None:
            body = json.dumps(obj, default=str).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        # -- GET /sse: the long-lived stream -------------------------------

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            if urlparse(self.path).path != "/sse":
                self._send_json(404, {"detail": "not found"})
                return
            sid, sess = srv.open_session()
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "keep-alive")
            self.end_headers()
            try:
                self.wfile.write(
                    _sse_frame("endpoint", f"/messages?session_id={sid}")
                )
                self.wfile.flush()
                idle = 0
                while not sess.closed.is_set():
                    try:
                        resp = sess.outbox.get(timeout=_POLL_SECONDS)
                    except queue.Empty:
                        idle += 1
                        if idle >= _KEEPALIVE_POLLS:
                            # SSE comment frame: ignored by clients,
                            # raises on a dead socket -> session cleanup
                            self.wfile.write(b": keepalive\n\n")
                            self.wfile.flush()
                            idle = 0
                        continue
                    idle = 0
                    self.wfile.write(
                        _sse_frame("message", json.dumps(resp, default=str))
                    )
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError, OSError):
                pass  # client went away — tear down the session below
            finally:
                srv.close_session(sid)

        # -- POST /messages: requests in, 202 out, responses on-stream -----

        def do_POST(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/messages":
                self._send_json(404, {"detail": "not found"})
                return
            sid = parse_qs(url.query).get("session_id", [""])[0]
            sess = srv.get_session(sid)
            if sess is None:
                self._send_json(404, {"detail": f"unknown session: {sid!r}"})
                return
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n) if n else b""
            # acknowledge FIRST — 202 means "accepted", and a slow tool
            # call must not hold the POST past the client's timeout; the
            # response travels down the SSE stream when dispatch finishes
            self._send_json(202, {"status": "accepted"})
            try:
                req = json.loads(raw or b"")
            except json.JSONDecodeError as e:
                sess.outbox.put({"id": None, "error": f"bad JSON: {e}"})
            else:
                # the SAME dispatch the stdio loop uses — one tool
                # surface. Run it on the server's BOUNDED worker pool:
                # the 202 promises the POST returns promptly (a
                # keep-alive client pipelining a second request must not
                # stall behind an in-flight tool call), while a request
                # flood queues instead of spawning an unbounded thread —
                # and Spark job — per POST. MCP matches responses by id,
                # so completion order on the stream is free to differ
                # from submission order.
                srv._dispatch_pool.submit(
                    lambda: sess.outbox.put(handle_request(srv.registry, req))
                )

    return Handler


def main(sf_dir: str, host: str = "127.0.0.1", port: int = 8001) -> None:
    """Blocking SSE entrypoint (the ``run_mcp_server.py --transport sse``
    analog, default port 8001 like the reference)."""
    from sec_financial_pipeline_spark.session import get_spark

    registry = ToolRegistry(get_spark(app_name="sfp-tools-sse"), sf_dir)
    srv = MCPSSEServer(registry, host=host, port=port)
    srv.serve_forever()
