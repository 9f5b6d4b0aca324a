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
