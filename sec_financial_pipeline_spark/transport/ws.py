"""WebSocket MCP transport (RFC 6455 over stdlib) — the twin of the
reference's third transport mode
(``reference/scripts/run_mcp_server.py:72-97``, default port 8002),
completing the stdio / SSE / WebSocket trio. Dispatch is the shared
:func:`transport.stdio.handle_request`, so all three front doors serve
byte-identical tool semantics.

Protocol: each client text frame carries one JSON request object (the
same schema as a stdio line); the server answers with one text frame on
the same connection. Malformed JSON yields an id-less error frame;
ping frames are answered with pong; a close frame (or EOF) ends the
session. Only the server side of RFC 6455 is implemented, and only
what this duplex request/response loop needs: handshake, masked
client→server frames, text/ping/close opcodes, unfragmented messages
up to 64-bit lengths.
"""

from __future__ import annotations

import base64
import hashlib
import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, BinaryIO

from sec_financial_pipeline_spark.plans.tools import ToolRegistry
from sec_financial_pipeline_spark.transport.stdio import handle_request

#: RFC 6455 §1.3 handshake GUID (fixed by the spec)
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

_OP_TEXT = 0x1
_OP_CLOSE = 0x8
_OP_PING = 0x9
_OP_PONG = 0xA


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept for a Sec-WebSocket-Key (RFC 6455 §4.2.2)."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def read_frame(rfile: BinaryIO) -> tuple[int, bytes] | None:
    """Read one frame; returns (opcode, payload) or None on EOF.
    Client→server payloads are unmasked per the RFC's mask bit."""
    head = rfile.read(2)
    if len(head) < 2:
        return None
    opcode = head[0] & 0x0F
    masked = bool(head[1] & 0x80)
    length = head[1] & 0x7F
    if length == 126:
        length = struct.unpack(">H", rfile.read(2))[0]
    elif length == 127:
        length = struct.unpack(">Q", rfile.read(8))[0]
    mask = rfile.read(4) if masked else b""
    payload = rfile.read(length)
    if masked:
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return opcode, payload


def write_frame(wfile: BinaryIO, opcode: int, payload: bytes) -> None:
    """Write one unmasked (server→client) frame, FIN set."""
    header = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        header += bytes([n])
    elif n < (1 << 16):
        header += bytes([126]) + struct.pack(">H", n)
    else:
        header += bytes([127]) + struct.pack(">Q", n)
    wfile.write(header + payload)
    wfile.flush()


class MCPWebSocketServer:
    """Bind a :class:`ToolRegistry` to a TCP port over WebSocket.
    ``port=0`` picks a free port (exposed as ``.port``), matching the
    other transport servers' test-driven shape."""

    def __init__(
        self,
        registry: ToolRegistry,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.registry = registry
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def start(self) -> None:
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)


def _make_handler(srv: MCPWebSocketServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt: str, *args: Any) -> None:
            pass

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            key = self.headers.get("Sec-WebSocket-Key")
            upgrade = (self.headers.get("Upgrade") or "").lower()
            if self.path != "/" and self.path != "/ws":
                self.send_response(404)
                self.end_headers()
                return
            if upgrade != "websocket" or not key:
                self.send_response(400)
                self.end_headers()
                return
            # RFC 6455 §4.2.2 server handshake — raw write: http.server
            # must not add its own headers after the 101
            self.wfile.write(
                b"HTTP/1.1 101 Switching Protocols\r\n"
                b"Upgrade: websocket\r\n"
                b"Connection: Upgrade\r\n"
                + f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n".encode()
            )
            self.wfile.flush()
            self.close_connection = True
            self._message_loop()

        def _message_loop(self) -> None:
            while True:
                frame = read_frame(self.rfile)
                if frame is None:
                    return
                opcode, payload = frame
                if opcode == _OP_CLOSE:
                    write_frame(self.wfile, _OP_CLOSE, payload[:2])
                    return
                if opcode == _OP_PING:
                    write_frame(self.wfile, _OP_PONG, payload)
                    continue
                if opcode != _OP_TEXT:
                    continue  # binary/continuation: not in this protocol
                try:
                    req = json.loads(payload.decode("utf-8"))
                except (json.JSONDecodeError, UnicodeDecodeError) as e:
                    resp: dict[str, Any] = {"id": None, "error": f"bad JSON: {e}"}
                else:
                    resp = handle_request(srv.registry, req)
                write_frame(
                    self.wfile,
                    _OP_TEXT,
                    json.dumps(resp, default=str).encode(),
                )

    return Handler


def main(sf_dir: str, host: str = "127.0.0.1", port: int = 8002) -> None:
    """Blocking WebSocket entrypoint (the ``run_mcp_server.py
    --transport websocket`` analog, default port 8002 like the
    reference)."""
    from sec_financial_pipeline_spark.session import get_spark

    registry = ToolRegistry(get_spark(app_name="sfp-tools-ws"), sf_dir)
    MCPWebSocketServer(registry, host=host, port=port).serve_forever()
