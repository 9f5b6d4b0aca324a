"""Report assembly + stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_company_report(spark, sf_dir):
    from sec_financial_pipeline_spark.plans import domain
    from sec_financial_pipeline_spark.plans.report import company_report

    facts = domain.facts_df(spark, sf_dir)
    alias = domain.alias_df(spark)
    rep = company_report(facts, alias, "t03")
    assert rep["ticker"] == "T03"
    assert set(rep["metrics"]) == {"revenue", "net_income"}
    rev = rep["metrics"]["revenue"]
    assert len(rev["series"]) >= 5  # multi-year series present
    assert rev["trend"] in {"increasing", "decreasing", "stable", "unknown"}
    assert "latest_ratios" in rep
    assert rep["latest_ratios"]["net_margin_pct"] is not None


def test_stateful_running_totals(spark, tmp_path):
    from sec_financial_pipeline_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        running_user_totals,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.5, "{}"),
        (2, "2024-01-01 00:05:00", 1, "click", 2.5, "{}"),
        (3, "2024-01-01 00:10:00", 2, "view", 10.0, "{}"),
        (4, "2024-01-01 00:15:00", 1, "purchase", 6.0, "{}"),
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(src)

    stream = read_event_stream(spark, src, max_files=1)
    run_to_memory(running_user_totals(stream), "state_out", output_mode="update")
    out = spark.sql(
        "SELECT user_id, max(n_events) n, max(total_value) v FROM state_out GROUP BY user_id"
    ).collect()
    got = {r.user_id: (r.n, r.v) for r in out}
    assert got == {1: (3, 10.0), 2: (1, 10.0)}


def test_stateful_sessionize_matches_batch_and_times_out(spark, tmp_path):
    """r14: gap-session assembly via applyInPandasWithState with
    EVENT-TIME TIMEOUT — closed sessions emit when a later event
    exceeds the gap, and the WATERMARK closes the final open sessions
    (state evicted; emission exactly as early as correctness allows).
    The emitted set must equal the batch evt_sessionize lag+running-sum
    semantics over the same events."""
    from pyspark.sql import Window as W

    from sec_financial_pipeline_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stateful_sessionize,
    )

    cols = (
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    )
    batches = [
        # per-user ts-ordered ACROSS batches (the documented contract)
        [(1, "2024-01-01 00:00:00", 1), (2, "2024-01-01 00:10:00", 1),
         (3, "2024-01-01 00:05:00", 2)],
        [(4, "2024-01-01 01:00:00", 1),  # 50min gap: closes u1 s1
         (5, "2024-01-01 00:20:00", 2)],
        [(6, "2024-01-01 01:20:00", 1),
         (7, "2024-01-01 02:00:00", 2)],  # 100min gap: closes u2 s1
        # sentinels: first advances the watermark past every
        # end+gap, second runs a batch UNDER that watermark so the
        # event-time timeouts actually fire (watermark is applied
        # one batch behind)
        [(100, "2024-01-01 06:00:00", 99)],
        [(101, "2024-01-01 06:00:01", 99)],
    ]
    import glob
    import os

    src = str(tmp_path / "ev")
    seen: set = set()
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [(e, ts, u, "view", 1.0, "{}") for e, ts, u in rows], cols
        ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        # the file source replays in modification-time order; pin each
        # batch's mtime explicitly so the per-user-ordered-across-
        # batches contract holds deterministically (append part names
        # are uuids — name order is meaningless)
        for p in glob.glob(os.path.join(src, "*.parquet")):
            if p not in seen:
                os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
                seen.add(p)

    stream = read_event_stream(spark, src, max_files=1)
    run_to_memory(
        stateful_sessionize(stream, gap_sec=1800),
        "sess_out",
        output_mode="append",
    )
    got = {
        (r.user_id, r.n_events, str(r.session_start), str(r.session_end))
        for r in spark.sql(
            "SELECT * FROM sess_out WHERE user_id != 99"
        ).collect()
    }

    # batch witness: the registry's lag + running-sum semantics
    e = (
        spark.read.parquet(src)
        .filter(F.col("user_id") != 99)
        .select("user_id", "ts", "event_id")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    expected = {
        (r.user_id, r.n_events, str(r.session_start), str(r.session_end))
        for r in (
            e.withColumn(
                "new_session",
                F.when(gap_us.isNull() | (gap_us > 1800000000), 1).otherwise(0),
            )
            .withColumn(
                "session_no",
                F.sum("new_session").over(
                    w.rowsBetween(W.unboundedPreceding, 0)
                ),
            )
            .groupBy("user_id", "session_no")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
        ).collect()
    }
    assert got == expected and len(got) == 4, (got, expected)
