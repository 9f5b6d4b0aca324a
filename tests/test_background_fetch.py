"""T7 background on-demand fetch — queue semantics (202 on miss,
in-flight dedup, failure capture, status rollup) plus an end-to-end
wiring test: miss -> distributed fetch via the injected transport ->
facts land -> subsequent request serves 200."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.plans.background import (
    COMPLETED,
    FAILED,
    QUEUED,
    BackgroundFetcher,
)


def test_miss_returns_202_and_dedupes_inflight():
    fetched: list[str] = []
    bf = BackgroundFetcher(fetched.append)
    store: set[str] = set()

    code, body = bf.get_or_serve("t99", store.__contains__, lambda t: {"ticker": t})
    assert code == 202 and "T99" in body["detail"]
    # second miss while queued: still 202, but NO duplicate job
    code, _ = bf.get_or_serve("T99", store.__contains__, lambda t: None)
    assert code == 202
    assert bf.status()["counts"][QUEUED] == 1

    assert bf.run_pending() == 1
    assert fetched == ["T99"]
    assert bf.status()["jobs"]["T99"] == COMPLETED

    # after the fetch lands data, the same request serves 200
    store.add("T99")
    code, body = bf.get_or_serve("t99", store.__contains__, lambda t: {"ticker": t})
    assert code == 200 and body == {"ticker": "T99"}


def test_retrigger_after_completion_requeues_but_not_while_active():
    bf = BackgroundFetcher(lambda t: None)
    bf.trigger("T01")
    bf.trigger("T01")  # active -> dedup
    assert bf.status()["counts"][QUEUED] == 1
    bf.run_pending()
    bf.trigger("T01")  # finished -> requeue is allowed
    assert bf.status()["counts"][QUEUED] == 1
    assert bf.run_pending() == 1


def test_failure_captured_and_drain_survives():
    def fetch(t: str) -> None:
        if t == "BAD":
            raise RuntimeError("boom")

    bf = BackgroundFetcher(fetch)
    out = bf.trigger_all(["BAD", "T02"])
    assert out["n_tickers"] == 2
    assert bf.run_pending() == 2  # BAD's failure didn't stop T02
    st = bf.status()
    assert st["jobs"]["BAD"] == FAILED and st["jobs"]["T02"] == COMPLETED
    assert "boom" in st["errors"]["BAD"]


def test_background_thread_drains_on_trigger():
    done: list[str] = []
    bf = BackgroundFetcher(done.append)
    bf.start()
    try:
        bf.trigger("T07")
        assert bf.join(timeout=10.0)
        assert done == ["T07"]
        assert bf.status()["jobs"]["T07"] == COMPLETED
    finally:
        bf.stop()


def test_end_to_end_fetch_wiring(spark, tmp_path):
    """The production wiring of the fetch job: distributed HTTP fetch
    (scripted transport) -> from_json parse -> partitioned sink; the
    queue only sees ticker -> None."""
    from sec_financial_pipeline_spark.sources.http_fetch import (
        fetch_json_partitioned,
        parse_fetched,
    )

    body = json.dumps({"ticker": "T42", "fiscal_year": 2001, "value": 7.5})
    out_dir = str(tmp_path / "facts")

    def fetch_ticker(ticker: str) -> None:
        work = spark.createDataFrame(
            [(f"https://example.test/facts/{ticker}",)], "url string"
        )
        raw = fetch_json_partitioned(
            work,
            "url",
            fetcher_factory=lambda: (lambda url: (200, body)),
            rate_per_partition=10_000,
        )
        parsed = parse_fetched(
            raw, spark, "ticker string, fiscal_year int, value double"
        )
        parsed.drop("url").write.mode("append").partitionBy("fiscal_year").parquet(out_dir)

    bf = BackgroundFetcher(fetch_ticker)
    code, _ = bf.get_or_serve("T42", lambda t: False, lambda t: None)
    assert code == 202
    bf.run_pending()
    got = spark.read.parquet(out_dir).filter(F.col("ticker") == "T42").collect()
    assert len(got) == 1 and got[0].value == 7.5
    assert bf.status()["jobs"]["T42"] == COMPLETED


def test_job_ledger_records_and_stats():
    """Reference ETL job history (pipeline.py:59-74, 316-353): per-job
    id/type/timing/records/error, rolled up into pipeline stats."""
    from sec_financial_pipeline_spark.plans.background import BackgroundFetcher

    def fetch(t: str) -> int:
        if t == "BAD":
            raise RuntimeError("upstream 503")
        return 42

    f = BackgroundFetcher(fetch)
    f.trigger("T01")
    f.trigger("BAD")
    f.trigger_all(["T02"])
    assert f.run_pending() == 3

    hist = f.job_history()
    assert [h["ticker"] for h in hist] == ["T02", "BAD", "T01"]  # newest first
    assert hist[0]["job_type"] == "full_refresh"
    assert hist[2]["job_type"] == "incremental"
    assert all(h["job_id"].startswith("job-") for h in hist)
    assert all(h["completed_at"] >= h["started_at"] for h in hist)
    bad = hist[1]
    assert bad["status"] == "failed" and "503" in bad["error_message"]
    assert hist[0]["records_processed"] == 42

    stats = f.pipeline_stats()
    assert stats["total_jobs"] == 3 and stats["completed"] == 2
    assert stats["failed"] == 1 and abs(stats["success_rate"] - 2 / 3) < 1e-9
    assert stats["records_processed"] == 84
    assert stats["last_run"] is not None

    status = f.status()
    assert status["pipeline_stats"]["total_jobs"] == 3
    assert len(status["recent_jobs"]) == 3
