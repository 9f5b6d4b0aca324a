"""Stream-stream interval join vs its batch twin (SURVEY §2.7 north-star
streaming family). The watermarked, bucket-keyed self-join must emit
exactly the pair set the batch range join produces on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_ts_dir(spark, sf_dir, tmp_path_factory):
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = str(tmp_path_factory.mktemp("events_sj"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_stream_interval_join_matches_batch(spark, events_ts_dir):
    from sec_financial_pipeline_spark.operators.rangejoin import (
        point_in_interval_join,
    )
    from sec_financial_pipeline_spark.streaming.events import (
        campaign_attribution_join,
        read_event_stream,
        run_to_memory,
    )

    stream = read_event_stream(spark, events_ts_dir, max_files=2)
    joined = campaign_attribution_join(stream)
    # stream-stream inner join emits in append mode only
    run_to_memory(joined, "stream_attrib", output_mode="append")
    got = {
        (r.campaign_id, r.p_event_id)
        for r in spark.sql("SELECT * FROM stream_attrib").collect()
    }

    e = spark.read.parquet(events_ts_dir)
    camp = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 200.0)
    ).select(
        F.col("event_id").alias("campaign_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    pts = e.select(
        F.col("event_id").alias("p_event_id"), F.col("ts").alias("p_ts")
    )
    want = {
        (r.campaign_id, r.p_event_id)
        for r in point_in_interval_join(
            pts, camp, "p_ts", "w_start", "w_end", 3600
        )
        .filter(F.col("p_event_id") != F.col("campaign_id"))
        .collect()
    }
    assert len(want) > 50
    assert got == want


def test_stream_static_enrichment_matches_batch(spark, events_ts_dir, sf_dir):
    from sec_financial_pipeline_spark.sources.testdata import load_table
    from sec_financial_pipeline_spark.streaming.events import (
        enrich_stream,
        read_event_stream,
        run_to_memory,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    stream = read_event_stream(spark, events_ts_dir, max_files=3)
    run_to_memory(
        enrich_stream(stream, dim, "user_id", ["c_mktsegment", "c_nationkey"]),
        "stream_enriched",
        output_mode="append",
    )
    got = {
        (r.event_id, r.c_mktsegment, r.c_nationkey)
        for r in spark.sql("SELECT * FROM stream_enriched").collect()
    }
    e = spark.read.parquet(events_ts_dir)
    want = {
        (r.event_id, r.c_mktsegment, r.c_nationkey)
        for r in e.join(dim, "user_id", "left").collect()
    }
    assert got == want
    assert len(got) == e.count()  # left join: nothing dropped
