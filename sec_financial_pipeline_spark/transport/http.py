"""HTTP binding for the serving façade (stdlib ``http.server`` only).

Routes mirror the reference API (``reference/src/api/main.py:105-233``
plus the ETL triggers), served by the engine's
:class:`~sec_financial_pipeline_spark.plans.facade.ServingFacade`:

==========  =================================  ==============================
method      path                               semantics
==========  =================================  ==============================
GET         /health                            liveness + cache stats
GET         /financials/{ticker}               all facts; 202 + background
                                               fetch when the ticker is
                                               absent (``main.py:119-129``)
GET         /financials/{ticker}/{metric}      one metric series;
                                               ``?format=json|csv|parquet``
POST        /financials/compare                body {tickers, metric}
GET         /data/tickers                      tickers + freshness sample
GET         /data/ticker/{ticker}/info         freshness + backing files
                                               (404 when no data)
POST        /etl/fetch/{ticker}                explicit fetch trigger
POST        /etl/refresh                       full-refresh trigger
GET         /etl/status                        fetch-queue status
GET         /cache/stats                       result-cache statistics
POST        /cache/clear                       drop every cache entry
GET         /storage/stats                     per-table file/byte/row rollup
DELETE      /cache/{ticker}                    per-ticker invalidation
==========  =================================  ==============================

Error mapping: ``ValueError`` (bad ticker / unsupported format) -> 400,
unknown route -> 404, anything else -> 500 — the same status taxonomy
the reference's exception handlers produce.

The server is ``ThreadingHTTPServer``; Spark sessions are thread-safe
for job submission, and every handler serves from the facade's result
cache first, so concurrent GETs of warm keys never reach the engine.
"""

from __future__ import annotations

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlparse

from sec_financial_pipeline_spark.plans.background import BackgroundFetcher
from sec_financial_pipeline_spark.plans.facade import ServingFacade
from sec_financial_pipeline_spark.plans.serving import validate_ticker

_CONTENT_TYPES = {
    "json": "application/json",
    "csv": "text/csv",
    "parquet": "application/octet-stream",
}

#: GZip threshold — the reference's ``GZipMiddleware(minimum_size=1000)``
#: (``reference/src/api/main.py:54``); smaller bodies ship uncompressed.
GZIP_MIN_SIZE = 1000

#: CORS policy — the reference's ``CORSMiddleware`` with
#: ``allow_origins=config.performance.cors_origins or ["*"]``
#: (``reference/src/api/main.py:45-52``); None/empty -> wildcard.
CORS_ALLOW_METHODS = "GET, POST, DELETE, OPTIONS"
CORS_ALLOW_HEADERS = "Content-Type, Accept-Encoding, Authorization"

#: already-compressed payloads gain nothing from a second pass
_GZIP_EXEMPT_CTYPES = frozenset({"application/octet-stream"})


class FacadeHTTPServer:
    """Bind a :class:`ServingFacade` (and optionally a
    :class:`BackgroundFetcher`) to a TCP port. ``port=0`` picks a free
    port (exposed as ``.port``) — the shape the tests drive."""

    def __init__(
        self,
        facade: ServingFacade,
        fetcher: BackgroundFetcher | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        cors_origins: list[str] | None = None,
    ):
        self.facade = facade
        self.fetcher = fetcher
        #: reference semantics: configured list, or wildcard when unset
        self.cors_origins = cors_origins or ["*"]
        self._known_lock = threading.Lock()
        if fetcher is not None:
            fetcher.add_completion_listener(self.invalidate_known)
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # known tickers resolve once then serve from this set — the
    # membership probe must not run a Spark job per request. The set is
    # invalidated when a background fetch completes (wired in __init__),
    # so a 202'd ticker becomes servable once its job lands.
    _known: frozenset[str] | None = None
    _known_gen: int = 0

    def known_tickers(self) -> frozenset[str]:
        """The cached ticker set (resolved on first use). Callers get a
        LOCAL snapshot — the cache attribute may be nulled concurrently
        by the fetch-completion listener, so never re-read ``_known``
        after this returns.

        A generation counter guards the publish: if a background fetch
        completes (invalidating the cache) while the collect is in
        flight, the now-stale snapshot is returned to THIS caller but
        NOT re-cached — otherwise it would mask the just-completed
        ticker until some future completion fired."""
        known = self._known
        if known is None:
            with self._known_lock:
                gen = self._known_gen
            rows = (
                self.facade._facts().select("ticker").distinct().collect()
            )
            known = frozenset(r[0] for r in rows)
            with self._known_lock:
                if self._known_gen == gen:
                    self._known = known
        return known

    def has_data(self, ticker: str) -> bool:
        return ticker in self.known_tickers()

    def invalidate_known(self, ticker: str | None = None) -> None:
        """Drop the cached ticker set (next probe re-resolves)."""
        with self._known_lock:
            self._known_gen += 1
            self._known = None

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


def _make_handler(srv: FacadeHTTPServer):
    class Handler(BaseHTTPRequestHandler):
        # keep the test log quiet; a deployment would override
        def log_message(self, fmt: str, *args: Any) -> None:
            pass

        # -- plumbing ------------------------------------------------------

        def _cors_origin(self) -> tuple[str, bool] | None:
            """Resolve (Access-Control-Allow-Origin value, send
            Allow-Credentials) for this request; None = no CORS headers.

            Wildcard config sends the LITERAL ``*`` with no credentials
            header, matching the reference default exactly (browsers
            refuse ``*`` on credentialed requests, so reflecting the
            Origin there would be strictly MORE permissive — any site
            could make credentialed calls if auth is ever added).
            Origin reflection + ``allow_credentials=True`` (the
            reference middleware's behavior for a configured origin
            list) is reserved for an explicit allowlist."""
            origin = self.headers.get("Origin")
            if origin is None:
                return None
            if "*" in srv.cors_origins:
                return "*", False
            if origin in srv.cors_origins:
                return origin, True
            return None

        def _send(self, status: int, body: bytes, ctype: str) -> None:
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            # responses differ by Origin / Accept-Encoding: shared
            # caches must key on them
            self.send_header("Vary", "Origin, Accept-Encoding")
            allow = self._cors_origin()
            if allow is not None:
                origin, credentialed = allow
                self.send_header("Access-Control-Allow-Origin", origin)
                if credentialed:
                    self.send_header("Access-Control-Allow-Credentials", "true")
            if (
                len(body) >= GZIP_MIN_SIZE
                and ctype not in _GZIP_EXEMPT_CTYPES
                and "gzip"
                in (self.headers.get("Accept-Encoding") or "").lower()
            ):
                body = gzip.compress(body)
                self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, status: int, obj: Any) -> None:
            self._send(
                status, json.dumps(obj, default=str).encode(), "application/json"
            )

        def _body_json(self) -> Any:
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n) if n else b"{}"
            return json.loads(raw or b"{}")

        def _route(self, method: str) -> None:
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            try:
                self._dispatch(method, parts, url)
            except ValueError as e:
                self._send_json(400, {"detail": str(e)})
            except json.JSONDecodeError as e:
                self._send_json(400, {"detail": f"bad JSON body: {e}"})
            except KeyError as e:  # ticker with no data (main.py:271)
                self._send_json(404, {"detail": str(e).strip("'")})
            except _NotFound:
                self._send_json(404, {"detail": "not found"})
            except Exception as e:  # 500 taxonomy, reference-style
                self._send_json(500, {"detail": str(e)})

        # -- routes --------------------------------------------------------

        def _dispatch(self, method: str, parts: list[str], url) -> None:
            facade, fetcher = srv.facade, srv.fetcher
            if method == "GET" and parts == ["health"]:
                self._send_json(
                    200,
                    {"status": "healthy", "cache_stats": facade.cache.stats()},
                )
            elif method == "GET" and len(parts) == 2 and parts[0] == "financials":
                # format validation precedes the miss path: a malformed
                # ticker is a 400, never an enqueued background fetch
                t = validate_ticker(parts[1])
                # miss -> 202 + queued background fetch (main.py:119-129)
                if fetcher is not None:
                    status, payload = fetcher.get_or_serve(
                        t, srv.has_data, facade.company_facts
                    )
                    self._send_json(status, payload)
                else:
                    self._send_json(200, facade.company_facts(t))
            elif method == "GET" and len(parts) == 3 and parts[0] == "financials":
                q = parse_qs(url.query)
                fmt = q.get("format", ["json"])[0].lower()
                years_raw = q.get("years", [None])[0]
                try:
                    years = int(years_raw) if years_raw is not None else None
                except ValueError:
                    raise ValueError(f"years must be an integer, got {years_raw!r}")
                out = facade.metric_series(parts[1], parts[2], fmt=fmt, years=years)
                if isinstance(out, bytes):
                    self._send(200, out, _CONTENT_TYPES[fmt])
                else:
                    self._send_json(200, out)
            elif method == "POST" and parts == ["financials", "compare"]:
                q = self._body_json()
                self._send_json(
                    200, facade.compare(q.get("tickers", []), q.get("metric", ""))
                )
            elif (
                method == "POST"
                and len(parts) == 3
                and parts[:2] == ["etl", "fetch"]
                and fetcher is not None
            ):
                # validation precedes enqueue, matching the GET route —
                # a malformed ticker is a 400, never a queued job
                self._send_json(200, fetcher.trigger(validate_ticker(parts[2])))
            elif method == "POST" and parts == ["etl", "refresh"] and fetcher is not None:
                self._send_json(
                    200, fetcher.trigger_all(sorted(srv.known_tickers()))
                )
            elif method == "GET" and parts == ["data", "tickers"]:
                self._send_json(200, facade.tickers_overview())
            elif (
                method == "GET"
                and len(parts) == 4
                and parts[:2] == ["data", "ticker"]
                and parts[3] == "info"
            ):
                self._send_json(200, facade.ticker_info(parts[2]))
            elif method == "GET" and parts == ["etl", "status"] and fetcher is not None:
                self._send_json(200, fetcher.status())
            elif method == "GET" and parts == ["cache", "stats"]:
                self._send_json(200, facade.cache.stats())
            elif method == "POST" and parts == ["cache", "clear"]:
                n = facade.cache.clear()
                self._send_json(
                    200,
                    {"message": f"Cleared {n} cache entries", "cleared_count": n},
                )
            elif method == "GET" and parts == ["storage", "stats"]:
                self._send_json(200, facade.storage_overview())
            elif method == "DELETE" and len(parts) == 2 and parts[0] == "cache":
                self._send_json(
                    200, {"invalidated": facade.invalidate(parts[1])}
                )
            else:
                raise _NotFound

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            self._route("GET")

        def do_POST(self) -> None:  # noqa: N802
            self._route("POST")

        def do_DELETE(self) -> None:  # noqa: N802
            self._route("DELETE")

        def do_OPTIONS(self) -> None:  # noqa: N802 — CORS preflight
            allow = self._cors_origin()
            self.send_response(204)
            self.send_header("Vary", "Origin")
            if allow is not None:
                origin, credentialed = allow
                self.send_header("Access-Control-Allow-Origin", origin)
                self.send_header("Access-Control-Allow-Methods", CORS_ALLOW_METHODS)
                self.send_header("Access-Control-Allow-Headers", CORS_ALLOW_HEADERS)
                if credentialed:
                    self.send_header("Access-Control-Allow-Credentials", "true")
                self.send_header("Access-Control-Max-Age", "600")
            else:
                # bare (non-CORS) OPTIONS is a legitimate capability
                # probe — answer it, don't 400
                self.send_header("Allow", CORS_ALLOW_METHODS)
            self.send_header("Content-Length", "0")
            self.end_headers()

    return Handler


class _NotFound(Exception):
    pass


def serve(
    spark,
    sf_dir: str,
    host: str = "127.0.0.1",
    port: int = 8000,
    warehouse: str = "spark-warehouse/facts",
) -> None:
    """Blocking entrypoint: bind a facade plus a REAL warehouse
    materialization fetcher to ``host:port`` — the stdlib twin of the
    reference's ``uvicorn.run(app)``. A 202'd miss now resolves: the
    background job materializes the ticker into the warehouse and the
    completion listener drops the cached ticker set, so the retry the
    202 body promises actually serves data."""
    from sec_financial_pipeline_spark.cli import make_fetcher

    facade = ServingFacade(spark, sf_dir)
    fetcher = make_fetcher(spark, sf_dir, warehouse)
    fetcher.start()
    try:
        FacadeHTTPServer(facade, fetcher, host=host, port=port).serve_forever()
    finally:
        fetcher.stop()
