"""Rate-limited HTTP JSON source (SURVEY §2.1 S1, §2.7 T3/T5/T6).

The reference fetches SEC EDGAR companyfacts with an asyncio client:
token-interval rate limiting (``src/core/sec_client.py:20-39``),
exponential backoff on 429s (``:90-116``), and a semaphore bounding
concurrency (``src/etl/pipeline.py:115-124``).

Spark-native shape: the *work list* (CIKs to fetch) is a DataFrame; the
fetch runs per partition via ``mapInPandas`` so a 1000-executor cluster
fans out naturally — with the rate limiter applied **per partition**, so
``global_rate = per_partition_rate x num_partitions``. Spark task
retries handle machine failure; HTTP-level retries (429/5xx) are handled
inside the fetch function because a 429 must back off, not re-schedule
the task.

No network calls in this environment: the transport is injected
(``fetcher``), tests use fakes; production passes a urllib/requests
closure.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

#: fetcher(url) -> (status_code, body_text)
Fetcher = Callable[[str], tuple[int, str]]


class RateLimiter:
    """Token-interval limiter (reference ``sec_client.py:20-39``): at
    most ``rate`` calls/sec, enforced by sleeping to the next slot."""

    def __init__(self, rate_per_sec: float):
        self.interval = 1.0 / rate_per_sec
        self._last = 0.0

    def acquire(self) -> None:
        now = time.monotonic()
        wait = self._last + self.interval - now
        if wait > 0:
            time.sleep(wait)
            now = time.monotonic()
        self._last = now


@dataclass
class RetryPolicy:
    """429 -> exponential backoff; 5xx -> linear backoff; 4xx -> give up
    (reference ``sec_client.py:90-116``)."""

    max_attempts: int = 4
    backoff_base: float = 2.0
    linear_delay: float = 0.5

    def delay_for(self, status: int, attempt: int) -> float | None:
        """Seconds to wait before retrying, or None to stop."""
        if attempt >= self.max_attempts:
            return None
        if status == 429:
            return self.backoff_base**attempt
        if status >= 500:
            return self.linear_delay * (attempt + 1)
        return None  # other 4xx: not retryable


def fetch_with_retry(
    url: str,
    fetcher: Fetcher,
    limiter: RateLimiter,
    policy: RetryPolicy,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[int, str | None]:
    """One rate-limited, retrying GET. Returns (final_status, body|None)."""
    attempt = 0
    while True:
        limiter.acquire()
        status, body = fetcher(url)
        if status == 200:
            return status, body
        delay = policy.delay_for(status, attempt)
        if delay is None:
            return status, None
        sleep(delay)
        attempt += 1


def fetch_json_partitioned(
    work: DataFrame,
    url_col: str,
    fetcher_factory: Callable[[], Fetcher],
    rate_per_partition: float = 2.0,
    policy: RetryPolicy | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed fetch: one rate limiter per partition, results as
    (url, status, body) rows. ``fetcher_factory`` is called once per
    partition on the executor (connections are not picklable)."""
    policy = policy or RetryPolicy()
    if num_partitions:
        work = work.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        limiter = RateLimiter(rate_per_partition)
        fetcher = fetcher_factory()
        for pdf in batches:
            out = []
            for url in pdf[url_col]:
                status, body = fetch_with_retry(url, fetcher, limiter, policy)
                out.append((url, status, body))
            yield pd.DataFrame(out, columns=["url", "status", "body"])

    return work.mapInPandas(run, schema="url string, status int, body string")


def parse_fetched(raw: DataFrame, spark, schema) -> DataFrame:
    """Fetched JSON bodies -> typed rows via from_json with an explicit
    schema (never inference at scale)."""
    from pyspark.sql import functions as F

    ok = raw.filter(F.col("status") == 200)
    return ok.select(
        "url", F.from_json(F.col("body"), schema).alias("doc")
    ).select("url", "doc.*")


def change_digest(body: str) -> str:
    """md5 of the sorted-key JSON — the reference's change-detection
    digest (``sec_client.py:315-318``)."""
    import hashlib

    canon = json.dumps(json.loads(body), sort_keys=True)
    return hashlib.md5(canon.encode()).hexdigest()
