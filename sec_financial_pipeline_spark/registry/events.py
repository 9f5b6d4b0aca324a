"""Event-stream queries (batch-checkable analogs of the streaming path).

The `events` table is the stream-shaped input (TESTDATA.md). These run the
same logical windows as `streaming/` but in batch so the DuckDB oracle can
verify them; the Structured Streaming twins live in
``sec_financial_pipeline_spark.streaming`` and are exercised by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.functions.deterministic import dsum, dsum_sql
from sec_financial_pipeline_spark.registry.core import register
from sec_financial_pipeline_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# C5 — JSON extraction from the props column
# ---------------------------------------------------------------------------


#: HLL-64 sketch of distinct users per event type (operators/sketches.py):
#: bucket = top 6 bits of the 32-bit md5 prefix, rho via INTEGER
#: binary-string length (no float log2), registers = max(rho), raw
#: estimate alpha*m^2/(zeros + sum 2^-M) — the 2^-M sum is exact in
#: double (<= 64 one-bit terms), so both engines produce bit-identical
#: estimates. exact_distinct rides along to witness the accuracy.
_HLL_SQL = f"""
SELECT 'hll' AS section, r.event_type,
       CAST(NULL AS TIMESTAMP) AS window_start,
       CAST(NULL AS BIGINT) AS n_events,
       CAST(NULL AS BIGINT) AS sum_k,
       CAST(NULL AS DOUBLE) AS total_value,
       round(0.709 * 64 * 64 /
             ((64 - count(*)) + sum(pow(2.0, -r.M))), 4) AS hll_distinct,
       CAST(count(*) AS INTEGER) AS n_registers,
       x.exact_distinct
FROM (
  SELECT event_type, bucket, max(rho) AS M FROM (
    SELECT event_type,
           h32 // 67108864 AS bucket,
           CASE WHEN h32 % 67108864 = 0 THEN 27
                ELSE 27 - length(format('{{:b}}', h32 % 67108864)) END AS rho
    FROM (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h32
      FROM events
    )
  ) GROUP BY event_type, bucket
) r
JOIN (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
) x ON r.event_type = x.event_type
GROUP BY r.event_type, x.exact_distinct
"""


#: SAMPLE-BY resample with LOCF gap fill (operators/resample.py): dense
#: 15-minute grid per event type from each type's first to last bucket;
#: empty intervals exist as n_events=0 rows carrying the last seen sum.
#: Buckets are floor(epoch seconds) — DuckDB's double->BIGINT cast
#: ROUNDS, so the floor is explicit.
_RESAMPLE_SQL = f"""
SELECT 'resample' AS section, event_type,
       CAST(to_timestamp(b) AS TIMESTAMP) AS window_start,
       n_events,
       CAST(NULL AS BIGINT) AS sum_k,
       total_value,
       CAST(NULL AS DOUBLE) AS hll_distinct,
       CAST(NULL AS INTEGER) AS n_registers,
       CAST(NULL AS BIGINT) AS exact_distinct
FROM (
  WITH bk AS (
    SELECT event_type,
           (CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 AS b,
           count(*) AS n, {dsum_sql('value')} AS v
    FROM events GROUP BY 1, 2
  ), sp AS (
    SELECT event_type, min(b) AS mn, max(b) AS mx FROM bk GROUP BY 1
  ), g AS (
    SELECT event_type, unnest(range(mn, mx + 900, 900)) AS b FROM sp
  )
  SELECT g.event_type, g.b,
         CAST(coalesce(bk.n, 0) AS BIGINT) AS n_events,
         last_value(bk.v IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS total_value
  FROM g LEFT JOIN bk ON g.event_type = bk.event_type AND g.b = bk.b
)
"""


@register(
    "evt_windows",
    f"""
SELECT 'by_type' AS section, event_type,
       CAST(NULL AS TIMESTAMP) AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       {dsum_sql('value')} AS total_value,
       CAST(NULL AS DOUBLE) AS hll_distinct,
       CAST(NULL AS INTEGER) AS n_registers,
       CAST(NULL AS BIGINT) AS exact_distinct
FROM events
GROUP BY event_type
UNION ALL
SELECT 'hourly' AS section, event_type,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       count(*) AS n_events,
       CAST(NULL AS BIGINT) AS sum_k,
       {dsum_sql('value')} AS total_value,
       CAST(NULL AS DOUBLE) AS hll_distinct,
       CAST(NULL AS INTEGER) AS n_registers,
       CAST(NULL AS BIGINT) AS exact_distinct
FROM events
GROUP BY 1, 2, 3
UNION ALL
{_HLL_SQL}
UNION ALL
{_RESAMPLE_SQL}
""",
    survey=(
        "C5 §2.7 (JSON path extraction + typed agg; tumbling window agg —"
        " streaming twin in streaming/events.py) + engine-independent HLL"
        " distinct-user sketch (md5 registers, integer rho, exact 2^-M"
        " sum — bit-identical across engines; mergeable state) + SAMPLE-BY"
        " resample with gap fill (dense 15-min grid per event type,"
        " LOCF carry-forward — operators/resample.py; n_events=0 rows"
        " witness the densification)"
    ),
)
def q_evt_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.sketches import hll_distinct

    e = load_table(spark, sf_dir, "events")
    pad = [
        F.lit(None).cast("double").alias("hll_distinct"),
        F.lit(None).cast("int").alias("n_registers"),
        F.lit(None).cast("bigint").alias("exact_distinct"),
    ]
    k = F.get_json_object("props", "$.k").cast("int")
    by_type = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        dsum("value").alias("total_value"),
    ).select(
        F.lit("by_type").alias("section"),
        "event_type",
        F.lit(None).cast("timestamp").alias("window_start"),
        "n_events",
        "sum_k",
        "total_value",
        *pad,
    )
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    ).select(
        F.lit("hourly").alias("section"),
        "event_type",
        "window_start",
        "n_events",
        F.lit(None).cast("bigint").alias("sum_k"),
        "total_value",
        *pad,
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct")
    )
    hll = hll_distinct(e, "user_id", ["event_type"], b=6).join(
        exact, "event_type"
    ).select(
        F.lit("hll").alias("section"),
        "event_type",
        F.lit(None).cast("timestamp").alias("window_start"),
        F.lit(None).cast("bigint").alias("n_events"),
        F.lit(None).cast("bigint").alias("sum_k"),
        F.lit(None).cast("double").alias("total_value"),
        "hll_distinct",
        "n_registers",
        "exact_distinct",
    )
    from sec_financial_pipeline_spark.operators.resample import resample_fill

    rs = resample_fill(
        e, "ts", "value", 900, ["event_type"], fill="locf"
    ).select(
        F.lit("resample").alias("section"),
        "event_type",
        F.col("bucket_ts").alias("window_start"),
        "n_events",
        F.lit(None).cast("bigint").alias("sum_k"),
        F.col("value").alias("total_value"),
        *pad,
    )
    return by_type.unionByName(hourly).unionByName(hll).unionByName(rs)


# ---------------------------------------------------------------------------
# Sessionization — gap-based sessions via lag + running sum (W-family)
# ---------------------------------------------------------------------------


@register(
    "evt_sessionize",
    """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) AS TIMESTAMP) AS session_end
FROM sessions
GROUP BY user_id, session_no
""",
    survey="W-family (sessionization: lag-gap flag + running sum)",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 1800000000), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sessions.groupBy(
        "user_id", F.col("session_no").cast("bigint").alias("session_no")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# Range (interval) join — campaign attribution. High-value purchases open
# a 2-hour attribution window; every event falling inside any window is
# credited to that campaign. No equi-key exists, so a naive plan is a
# BroadcastNestedLoopJoin; operators/rangejoin.py rewrites it as a
# bucketed equi-join (see module docstring for the 100 TB rationale).
# ---------------------------------------------------------------------------


@register(
    "evt_range_join",
    f"""
WITH camp AS (
  SELECT event_id AS campaign_id, ts AS w_start,
         ts + INTERVAL 2 HOUR AS w_end
  FROM events
  WHERE event_type = 'purchase' AND value >= 200.0
)
SELECT c.campaign_id, count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       {dsum_sql('e.value')} AS total_value
FROM camp c JOIN events e
  ON e.ts >= c.w_start AND e.ts < c.w_end AND e.event_id <> c.campaign_id
GROUP BY c.campaign_id
""",
    survey="§2.3 range join (bucketed point-in-interval rewrite of a pure inequality join)",
)
def q_evt_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    e = load_table(spark, sf_dir, "events")
    camp = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 200.0)
    ).select(
        F.col("event_id").alias("campaign_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    pts = e.select(
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        F.col("user_id").alias("p_user"),
        F.col("value").alias("p_value"),
    )
    # bucket = 1h: each 2h window explodes to exactly 3 bucket rows
    j = point_in_interval_join(pts, camp, "p_ts", "w_start", "w_end", 3600)
    return (
        j.filter(F.col("p_event_id") != F.col("campaign_id"))
        .groupBy("campaign_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("p_user").alias("n_users"),
            dsum("p_value").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Interval-interval OVERLAP join — the sibling of the point-in-interval
# rewrite (campaign-window vs promo-window co-occurrence). Both sides
# explode to covering buckets; each overlapping pair is emitted exactly
# once by anchoring it to the bucket of greatest(start_l, start_r) —
# a per-row predicate instead of a post-join distinct shuffle.
# ---------------------------------------------------------------------------


@register(
    "evt_interval_overlap",
    """
WITH camp AS (
  SELECT event_id AS campaign_id, ts AS c_start,
         ts + INTERVAL 2 HOUR AS c_end
  FROM events
  WHERE event_type = 'purchase' AND value >= 200.0
),
promo AS (
  SELECT event_id AS promo_id, ts AS p_start,
         ts + INTERVAL 1 HOUR AS p_end
  FROM events
  WHERE event_type = 'click' AND value >= 150.0
)
SELECT c.campaign_id, p.promo_id,
       CAST(date_diff('second', greatest(c.c_start, p.p_start),
                      least(c.c_end, p.p_end)) AS BIGINT) AS overlap_seconds
FROM camp c JOIN promo p
  ON c.c_start < p.p_end AND p.p_start < c.c_end
""",
    survey="§2.3 range join (interval-interval overlap via bucketed equi-join with anchor-bucket dedup)",
)
def q_evt_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    e = load_table(spark, sf_dir, "events")
    camp = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 200.0)
    ).select(
        F.col("event_id").alias("campaign_id"),
        F.col("ts").alias("c_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("c_end"),
    )
    promo = e.filter(
        (F.col("event_type") == "click") & (F.col("value") >= 150.0)
    ).select(
        F.col("event_id").alias("promo_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("p_end"),
    )
    j = interval_overlap_join(
        camp, promo, "c_start", "c_end", "p_start", "p_end", 3600
    )
    # floor-of-epoch difference == DuckDB's second-boundary count
    return j.select(
        "campaign_id",
        "promo_id",
        (
            F.unix_timestamp(F.least(F.col("c_end"), F.col("p_end")))
            - F.unix_timestamp(F.greatest(F.col("c_start"), F.col("p_start")))
        ).alias("overlap_seconds"),
    )
