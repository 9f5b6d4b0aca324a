"""HTTP fetch source (rate limit/retry/backoff), semantic-layer alias
table, file catalog, streaming dedup (SURVEY S1/S6/T5/T6 + §1.3)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


class FakeFetcher:
    """Scripted transport: url -> list of (status, body) per attempt."""

    def __init__(self, script):
        self.script = {u: list(resp) for u, resp in script.items()}
        self.calls = []

    def __call__(self, url):
        self.calls.append(url)
        responses = self.script[url]
        return responses.pop(0) if len(responses) > 1 else responses[0]


def test_retry_backoff_and_rate_limit():
    from sec_financial_pipeline_spark.sources.http_fetch import (
        RateLimiter,
        RetryPolicy,
        fetch_with_retry,
    )

    fetcher = FakeFetcher(
        {
            "u429": [(429, ""), (429, ""), (200, '{"ok": 1}')],
            "u500": [(500, ""), (200, '{"ok": 2}')],
            "u404": [(404, "")],
        }
    )
    limiter = RateLimiter(rate_per_sec=10_000)
    policy = RetryPolicy(max_attempts=4, backoff_base=2.0, linear_delay=0.1)
    sleeps: list[float] = []

    status, body = fetch_with_retry("u429", fetcher, limiter, policy, sleep=sleeps.append)
    assert (status, json.loads(body)["ok"]) == (200, 1)
    assert sleeps == [1.0, 2.0]  # 2^0, 2^1 exponential backoff

    sleeps.clear()
    status, body = fetch_with_retry("u500", fetcher, limiter, policy, sleep=sleeps.append)
    assert status == 200 and sleeps == [0.1]  # linear backoff

    status, body = fetch_with_retry("u404", fetcher, limiter, policy, sleep=sleeps.append)
    assert status == 404 and body is None  # not retryable

    # rate limiter honours the interval
    import time

    rl = RateLimiter(rate_per_sec=100)
    t0 = time.monotonic()
    for _ in range(5):
        rl.acquire()
    assert time.monotonic() - t0 >= 0.04


def test_distributed_fetch(spark):
    from sec_financial_pipeline_spark.sources.http_fetch import (
        RetryPolicy,
        change_digest,
        fetch_json_partitioned,
    )

    urls = [f"https://example.test/cik{i}.json" for i in range(6)]
    work = spark.createDataFrame([(u,) for u in urls], "url string")

    def factory():
        return lambda url: (200, json.dumps({"cik": url[-6], "b": 1, "a": 2}))

    out = fetch_json_partitioned(
        work, "url", factory, rate_per_partition=10_000,
        policy=RetryPolicy(), num_partitions=3,
    )
    rows = out.collect()
    assert len(rows) == 6 and all(r.status == 200 for r in rows)
    # change digest is key-order independent
    assert change_digest('{"b": 1, "a": 2}') == change_digest('{"a": 2, "b": 1}')


def test_alias_table_and_metrics(spark):
    from sec_financial_pipeline_spark.functions.metrics import (
        METRIC_ALIASES,
        alias_table,
        metrics_for,
    )

    t = alias_table(spark)
    assert t.count() == len(METRIC_ALIASES)
    # the tag-coalescing contract: priorities are dense from 0 per metric
    per_metric = (
        t.groupBy("metric")
        .agg(F.min("priority").alias("lo"), F.countDistinct("priority").alias("n"),
             F.max("priority").alias("hi"))
        .collect()
    )
    for r in per_metric:
        assert r.lo == 0 and r.hi == r.n - 1, f"non-dense priorities for {r}"
    assert "revenue" in metrics_for("income")
    assert "total_assets" in metrics_for("balance")
    assert "operating_cash_flow" in metrics_for("cashflow")
    # revenue keeps the reference's 4-tag fallback family
    rev = t.filter(F.col("metric") == "revenue").orderBy("priority").collect()
    assert len(rev) == 4 and rev[0].tag.startswith("RevenueFromContract")


def test_file_catalog(spark, tmp_path):
    from sec_financial_pipeline_spark.sources.catalog import (
        file_inventory,
        partition_inventory,
        storage_stats,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    )
    out = str(tmp_path / "cat")
    df.repartition(2, "part").write.partitionBy("part").parquet(out)

    inv = file_inventory(spark, out).collect()
    assert sum(r.n_rows for r in inv) == 1000
    assert all(r.file_size > 0 for r in inv)

    stats = storage_stats(spark, out).collect()[0]
    assert stats.total_rows == 1000 and stats.n_files == len(inv)

    parts = {r.part: r.n_rows for r in partition_inventory(
        spark.read.parquet(out), ["part"]).collect()}
    assert parts == {0: 334, 1: 333, 2: 333}


def test_streaming_dedup(spark, tmp_path):
    from sec_financial_pipeline_spark.streaming.events import (
        dedup_stream,
        read_event_stream,
        run_to_memory,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, "{}"),
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, "{}"),  # dup event_id
        (2, "2024-01-01 00:10:00", 10, "click", 2.0, "{}"),
        (2, "2024-01-01 00:10:00", 10, "click", 2.0, "{}"),  # dup
        (3, "2024-01-01 00:20:00", 11, "view", 3.0, "{}"),
    ]
    src = str(tmp_path / "dup_events")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).write.parquet(src)

    stream = read_event_stream(spark, src)
    run_to_memory(dedup_stream(stream), "dedup_out", output_mode="append")
    out = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r.event_id for r in out) == [1, 2, 3]
