"""Unit tests for the bucketed point-in-interval join (operators/rangejoin).

Covers the semantics the bucket rewrite must preserve exactly:
end-exclusivity, intervals spanning multiple buckets, points on bucket
boundaries, and one-match-per-(point, interval) (no duplicate emission).
Also asserts the plan is an equi-join, not BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.rangejoin import point_in_interval_join

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return _T0 + dt.timedelta(minutes=minutes)


def test_point_in_interval_semantics(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(0)),     # == start of iv10: inclusive
            (2, _ts(59)),    # inside iv10
            (3, _ts(60)),    # == end of iv10: EXCLUSIVE; == start of iv20
            (4, _ts(185)),   # inside iv30 (which spans 4 one-hour buckets)
            (5, _ts(400)),   # in no interval
        ],
        "pid INT, p_ts TIMESTAMP",
    )
    intervals = spark.createDataFrame(
        [
            (10, _ts(0), _ts(60)),
            (20, _ts(60), _ts(120)),
            (30, _ts(100), _ts(300)),
        ],
        "iv INT, w_start TIMESTAMP, w_end TIMESTAMP",
    )
    out = point_in_interval_join(
        points, intervals, "p_ts", "w_start", "w_end", bucket_seconds=3600
    )
    got = sorted((r.pid, r.iv) for r in out.collect())
    assert got == [(1, 10), (2, 10), (3, 20), (4, 30)]


def test_no_duplicate_matches_and_overlapping_intervals(spark):
    points = spark.createDataFrame([(1, _ts(30))], "pid INT, p_ts TIMESTAMP")
    intervals = spark.createDataFrame(
        [(10, _ts(0), _ts(240)), (20, _ts(20), _ts(40))],
        "iv INT, w_start TIMESTAMP, w_end TIMESTAMP",
    )
    # small bucket => iv10 explodes to many bucket rows, but the point
    # still matches it exactly once (a point lives in ONE bucket)
    out = point_in_interval_join(
        points, intervals, "p_ts", "w_start", "w_end", bucket_seconds=60
    )
    got = sorted((r.pid, r.iv) for r in out.collect())
    assert got == [(1, 10), (1, 20)]


def test_plan_is_equi_join_not_nested_loop(spark):
    points = spark.range(100).select(
        F.col("id").alias("pid"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("p_ts"),
    )
    intervals = spark.range(10).select(
        F.col("id").alias("iv"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 600).alias("w_start"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 600 + 1200).alias(
            "w_end"
        ),
    )
    out = point_in_interval_join(
        points, intervals, "p_ts", "w_start", "w_end", bucket_seconds=600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_semantics(spark):
    from sec_financial_pipeline_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    def _ts(mins):
        return f"2024-01-01 {mins // 60:02d}:{mins % 60:02d}:00"

    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [
            (1, _ts(0), _ts(300)),    # 0-5h: spans many buckets
            (2, _ts(100), _ts(160)),  # 1:40-2:40
            (3, _ts(600), _ts(660)),  # far away
        ],
        "lid int, ls string, le string",
    ).select("lid", F.to_timestamp("ls").alias("ls"), F.to_timestamp("le").alias("le"))
    right = spark.createDataFrame(
        [
            (10, _ts(120), _ts(240)),  # overlaps 1 (within) and 2 (partial)
            (11, _ts(300), _ts(360)),  # touches 1's end exactly: half-open -> NO match
            (12, _ts(50), _ts(70)),    # inside 1 only
        ],
        "rid int, rs string, re string",
    ).select("rid", F.to_timestamp("rs").alias("rs"), F.to_timestamp("re").alias("re"))

    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", 3600
        ).collect()
    )
    # each overlapping pair exactly ONCE despite multi-bucket coverage
    assert got == [(1, 10), (1, 12), (2, 10)]


def test_resample_fill_modes_and_gap_rows(spark):
    """operators/resample.py: dense grid, n_events=0 gap rows, three
    fill modes, guards. Witnessed against a hand-computed series."""
    import datetime as dt

    import pytest as _pt

    from sec_financial_pipeline_spark.operators.resample import resample_fill

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(seconds=30), 2.0),      # same bucket
        ("a", t0 + dt.timedelta(seconds=180), 10.0),    # bucket 3 (gap 1-2)
        ("b", t0 + dt.timedelta(seconds=60), 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = resample_fill(df, "ts", "v", 60, ["g"], fill="locf").collect()
    a = sorted(
        [(r["bucket_ts"], r["n_events"], r["value"]) for r in out
         if r["g"] == "a"]
    )
    assert [(x[1], x[2]) for x in a] == [
        (2, 3.0), (0, 3.0), (0, 3.0), (1, 10.0),
    ]
    assert a[0][0] == t0 and a[-1][0] == t0 + dt.timedelta(seconds=180)
    b = [(r["n_events"], r["value"]) for r in out if r["g"] == "b"]
    assert b == [(1, 5.0)]

    zero = resample_fill(df, "ts", "v", 60, ["g"], fill="zero").collect()
    az = sorted(
        [(r["bucket_ts"], r["value"]) for r in zero if r["g"] == "a"]
    )
    assert [x[1] for x in az] == [3.0, 0.0, 0.0, 10.0]
    nul = resample_fill(df, "ts", "v", 60, ["g"], fill="null").collect()
    an = sorted([(r["bucket_ts"], r["value"]) for r in nul if r["g"] == "a"])
    assert [x[1] for x in an] == [3.0, None, None, 10.0]

    with _pt.raises(ValueError, match="group_cols"):
        resample_fill(df, "ts", "v", 60, [])
    with _pt.raises(ValueError, match="fill"):
        resample_fill(df, "ts", "v", 60, ["g"], fill="spline")
    with _pt.raises(ValueError, match="interval"):
        resample_fill(df, "ts", "v", 0, ["g"])


def test_resample_interp_fill(spark):
    import datetime as dt

    from sec_financial_pipeline_spark.operators.resample import resample_fill

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, 0.0),
        ("a", t0 + dt.timedelta(seconds=180), 9.0),  # 2 interior gaps
        ("a", t0 + dt.timedelta(seconds=240), 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = sorted(
        (r["bucket_ts"], r["value"])
        for r in resample_fill(df, "ts", "v", 60, ["g"], fill="interp")
        .collect()
    )
    assert [v for _, v in out] == [0.0, 3.0, 6.0, 9.0, 5.0]
