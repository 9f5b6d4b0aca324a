"""T7 — background on-demand fetch (reference ``src/api/main.py:105-144``
miss-triggered fetch + 202 response; ``main.py:302-340`` explicit
trigger / full-refresh endpoints; ``main.py:343+`` status endpoint).

The reference leans on FastAPI ``BackgroundTasks``; the engine-side twin
is an explicit per-ticker job queue with in-flight dedup and a
pluggable executor:

- ``get_or_serve`` is the data-miss path: serve when the engine has the
  ticker, otherwise enqueue ONE fetch job (repeat misses while a job is
  pending do not stack duplicates) and answer the 202-shaped payload;
- ``trigger`` / ``trigger_all`` are the explicit ETL endpoints;
- ``run_pending`` drains synchronously — the deterministic mode tests
  and batch schedulers use; ``start``/``stop`` run the same drain loop
  on a daemon thread for the serving deployment. On a real cluster the
  drain loop is wherever orchestration lives (Airflow task, Spark
  Connect job, k8s cron) — the queue contract is the engine's side of
  that boundary, which is why it is not welded to a thread.

The fetch job itself is an injected callable (ticker -> None) — in
production a ``sources/http_fetch.py`` distributed fetch + parse +
``sink.write_facts`` + ``ServingFacade.invalidate(ticker)``; in tests a
fake. This module owns ONLY queueing semantics: states, dedup,
failure capture, status rollup.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from collections.abc import Callable, Iterable
from typing import Any

#: job lifecycle: queued -> in_progress -> completed | failed
QUEUED = "queued"
IN_PROGRESS = "in_progress"
COMPLETED = "completed"
FAILED = "failed"

_ACTIVE = (QUEUED, IN_PROGRESS)


class BackgroundFetcher:
    """Per-ticker on-demand fetch queue with in-flight dedup and a job
    ledger (the reference's ETL job history, ``etl/pipeline.py:59-74``,
    ``316-353``: per-job id/type/timing/records/error, rolled up into
    pipeline stats served by ``GET /etl/status``)."""

    def __init__(self, fetch_fn: Callable[[str], Any]):
        #: fetch_fn may return an int (records processed) — recorded in
        #: the job ledger; any other return value is ignored.
        self._fetch_fn = fetch_fn
        self._lock = threading.Lock()
        #: ticker -> state; insertion order = FIFO drain order
        self._jobs: OrderedDict[str, str] = OrderedDict()
        self._job_types: dict[str, str] = {}
        self._errors: dict[str, str] = {}
        self._history: list[dict[str, Any]] = []
        self._seq = 0
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._wake = threading.Event()
        #: called with the ticker after a job COMPLETES — serving layers
        #: hook cache/known-set invalidation here so a 202'd ticker
        #: becomes visible once its fetch lands
        self._completion_listeners: list[Callable[[str], Any]] = []

    def add_completion_listener(self, fn: Callable[[str], Any]) -> None:
        self._completion_listeners.append(fn)

    # -- enqueue surface ---------------------------------------------------

    def trigger(self, ticker: str, job_type: str = "incremental") -> dict[str, Any]:
        """Explicit fetch trigger (``POST /etl/fetch/{ticker}``). Returns
        the reference's in-progress payload; re-triggering an active job
        is a no-op (dedup), re-triggering a finished one requeues."""
        t = ticker.upper()
        with self._lock:
            if self._jobs.get(t) not in _ACTIVE:
                self._jobs[t] = QUEUED
                self._jobs.move_to_end(t)
                self._job_types[t] = job_type
                self._errors.pop(t, None)
        self._wake.set()
        return {"message": f"Fetch triggered for {t}", "ticker": t, "status": IN_PROGRESS}

    def trigger_all(self, tickers: Iterable[str]) -> dict[str, Any]:
        """Full-refresh trigger (``POST /etl/refresh``)."""
        n = 0
        for t in tickers:
            self.trigger(t, job_type="full_refresh")
            n += 1
        return {"message": "Full data refresh triggered", "n_tickers": n, "status": IN_PROGRESS}

    def get_or_serve(
        self,
        ticker: str,
        has_data: Callable[[str], bool],
        serve: Callable[[str], Any],
    ) -> tuple[int, Any]:
        """The miss path of ``GET /financials/{ticker}``: (200, payload)
        when the engine has the ticker; otherwise enqueue (deduped) and
        return the 202 body verbatim from the reference."""
        t = ticker.upper()
        if has_data(t):
            return 200, serve(t)
        self.trigger(t)
        return 202, {
            "detail": (
                f"Data for {t} not available. Fetching in background. "
                "Please try again in a few minutes."
            )
        }

    # -- drain surface -----------------------------------------------------

    def run_pending(self) -> int:
        """Synchronously drain every queued job (FIFO); returns how many
        ran. Failures are captured per-ticker, never raised — the queue
        must survive a bad ticker (the reference logs and continues)."""
        import time

        n = 0
        while True:
            with self._lock:
                t = next(
                    (k for k, s in self._jobs.items() if s == QUEUED), None
                )
                if t is None:
                    return n
                self._jobs[t] = IN_PROGRESS
                self._seq += 1
                record = {
                    "job_id": f"job-{self._seq:06d}",
                    "ticker": t,
                    "job_type": self._job_types.get(t, "incremental"),
                    "status": IN_PROGRESS,
                    "started_at": time.time(),
                    "completed_at": None,
                    "records_processed": None,
                    "error_message": None,
                }
            try:
                result = self._fetch_fn(t)
                record["status"] = COMPLETED
                if isinstance(result, int):
                    record["records_processed"] = result
            except Exception as e:  # capture, don't kill the drain loop
                record["status"] = FAILED
                record["error_message"] = str(e)
                with self._lock:
                    self._errors[t] = str(e)
            record["completed_at"] = time.time()
            with self._lock:
                self._jobs[t] = record["status"]
                self._history.append(record)
            if record["status"] == COMPLETED:
                for fn in self._completion_listeners:
                    try:
                        fn(t)
                    except Exception:  # listeners never break the drain
                        pass
            n += 1

    def start(self) -> None:
        """Run the drain loop on a daemon thread (the deployment mode);
        woken by every trigger, idles otherwise."""
        if self._thread is not None:
            return
        self._stop.clear()

        def loop() -> None:
            while not self._stop.is_set():
                self.run_pending()
                self._wake.wait(timeout=0.05)
                self._wake.clear()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        """Drain what's queued, then stop the worker."""
        if self._thread is None:
            return
        self._stop.set()
        self._wake.set()
        self._thread.join()
        self._thread = None
        self.run_pending()  # anything enqueued during shutdown

    def join(self, timeout: float = 30.0) -> bool:
        """Block until no job is queued/in-progress (test determinism)."""
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                if not any(s in _ACTIVE for s in self._jobs.values()):
                    return True
            self._wake.set()
            time.sleep(0.01)
        return False

    # -- status surface ----------------------------------------------------

    def job_history(self, limit: int = 20) -> list[dict[str, Any]]:
        """Most-recent-first job records (``pipeline.py:316-318``)."""
        with self._lock:
            return [dict(r) for r in self._history[-limit:][::-1]]

    def pipeline_stats(self) -> dict[str, Any]:
        """Ledger rollup (``pipeline.py:320-353``): totals, success rate,
        records processed, last run."""
        with self._lock:
            done = [r for r in self._history if r["status"] == COMPLETED]
            failed = [r for r in self._history if r["status"] == FAILED]
            finished = len(done) + len(failed)
            return {
                "total_jobs": len(self._history),
                "completed": len(done),
                "failed": len(failed),
                "success_rate": len(done) / finished if finished else 0.0,
                "records_processed": sum(
                    r["records_processed"] or 0 for r in done
                ),
                "last_run": max(
                    (r["completed_at"] for r in self._history if r["completed_at"]),
                    default=None,
                ),
            }

    def status(self) -> dict[str, Any]:
        """``GET /etl/status`` rollup (``main.py:343-371``): per-state
        counts + failure detail + pipeline stats + recent job records."""
        with self._lock:
            counts = {s: 0 for s in (QUEUED, IN_PROGRESS, COMPLETED, FAILED)}
            for s in self._jobs.values():
                counts[s] += 1
            jobs = dict(self._jobs)
            errors = dict(self._errors)
        return {
            "jobs": jobs,
            "counts": counts,
            "errors": errors,
            "pipeline_stats": self.pipeline_stats(),
            "recent_jobs": self.job_history(20),
        }
