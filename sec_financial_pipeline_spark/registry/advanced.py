"""Advanced operator coverage: as-of join, running/rolling windows,
ntile/median, extended date functions, regex tokenization, embedding
centroids, and the Pandas-UDF surface (SURVEY §2.8 + OLAP staples the
north star expects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.functions.deterministic import dsum, dsum_sql
from sec_financial_pipeline_spark.operators.asof import as_of_join
from sec_financial_pipeline_spark.operators.udfs import (
    ols_slope_per_group,
    quality_score_udf,
)
from sec_financial_pipeline_spark.registry.core import register
from sec_financial_pipeline_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# As-of join: attribute each purchase to the user's latest prior view
# ---------------------------------------------------------------------------


@register(
    "adv_asof_attribution",
    """
WITH views AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
       v.view_event_id
FROM purchases p
ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
    survey="as-of join (union + last-ignore-nulls window; no range-join blowup)",
)
def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # dedup views per (user, ts) so the as-of match is unambiguous in
    # both engines (DuckDB ASOF picks an arbitrary row among equal ts)
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return as_of_join(
        views,
        purchases,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["view_event_id"],
    )


# ---------------------------------------------------------------------------
# Running totals and rolling means (frame-based windows)
# ---------------------------------------------------------------------------


@register(
    "adv_running_windows",
    f"""
WITH daily AS (
  SELECT CAST(o_custkey % 100 AS INT) AS cust_bucket,
         CAST(o_orderdate AS DATE) AS d,
         {dsum_sql('o_totalprice')} AS revenue
  FROM orders
  GROUP BY 1, 2
)
SELECT cust_bucket, d, revenue,
       round(sum(revenue) OVER (PARTITION BY cust_bucket ORDER BY d
                                ROWS UNBOUNDED PRECEDING), 4) AS running_total,
       round(avg(revenue) OVER (PARTITION BY cust_bucket ORDER BY d
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
FROM daily
""",
    survey="W-family (cumulative sum + rolling mean, ROWS frames)",
)
def q_running_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        (F.col("o_custkey") % 100).cast("int").alias("cust_bucket"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.partitionBy("cust_bucket").orderBy("d")
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    ma = w.rowsBetween(-2, 0)
    return daily.select(
        "cust_bucket",
        "d",
        "revenue",
        F.round(F.sum("revenue").over(running), 4).alias("running_total"),
        F.round(F.avg("revenue").over(ma), 4).alias("ma3"),
    )


# ---------------------------------------------------------------------------
# Rank-function family + ntile quartiles + exact interpolated median
# ---------------------------------------------------------------------------


@register(
    "adv_rank_ntile",
    """
SELECT 'rank_family' AS section, c_mktsegment, c_custkey,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       round(percent_rank() OVER w, 6) AS prnk,
       round(cume_dist() OVER w, 6) AS cdist,
       lead(c_custkey, 1) OVER w AS next_custkey,
       first_value(c_custkey) OVER w AS top_custkey,
       CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS median_acctbal,
       CAST(NULL AS BIGINT) AS q1_n, CAST(NULL AS BIGINT) AS q4_n
FROM customer
WHERE c_custkey < 300
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
UNION ALL
SELECT 'segment_quartiles' AS section, c_mktsegment,
       CAST(NULL AS BIGINT) AS c_custkey, CAST(NULL AS INT) AS rnk,
       CAST(NULL AS INT) AS drnk, CAST(NULL AS DOUBLE) AS prnk,
       CAST(NULL AS DOUBLE) AS cdist, CAST(NULL AS BIGINT) AS next_custkey,
       CAST(NULL AS BIGINT) AS top_custkey,
       count(*) AS n,
       round(quantile_cont(c_acctbal, 0.5), 6) AS median_acctbal,
       count(CASE WHEN q = 1 THEN 1 END) AS q1_n,
       count(CASE WHEN q = 4 THEN 1 END) AS q4_n
FROM (
  SELECT c_mktsegment, c_acctbal,
         ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal ASC, c_custkey ASC) AS q
  FROM customer
)
GROUP BY c_mktsegment
""",
    survey="W-family A-family (rank/dense_rank/percent_rank/cume_dist/lead/first_value; ntile quartiles + exact interpolated median)",
)
def q_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    ranks = c.filter(F.col("c_custkey") < 300).select(
        F.lit("rank_family").alias("section"),
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.lead("c_custkey", 1).over(w).alias("next_custkey"),
        F.first("c_custkey").over(w).alias("top_custkey"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("median_acctbal"),
        F.lit(None).cast("bigint").alias("q1_n"),
        F.lit(None).cast("bigint").alias("q4_n"),
    )
    wq = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    quartiles = (
        c.withColumn("q", F.ntile(4).over(wq))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("median_acctbal"),
            F.count(F.when(F.col("q") == 1, 1)).alias("q1_n"),
            F.count(F.when(F.col("q") == 4, 1)).alias("q4_n"),
        )
        .select(
            F.lit("segment_quartiles").alias("section"),
            "c_mktsegment",
            F.lit(None).cast("bigint").alias("c_custkey"),
            F.lit(None).cast("int").alias("rnk"),
            F.lit(None).cast("int").alias("drnk"),
            F.lit(None).cast("double").alias("prnk"),
            F.lit(None).cast("double").alias("cdist"),
            F.lit(None).cast("bigint").alias("next_custkey"),
            F.lit(None).cast("bigint").alias("top_custkey"),
            "n",
            "median_acctbal",
            "q1_n",
            "q4_n",
        )
    )
    return ranks.unionByName(quartiles)


# ---------------------------------------------------------------------------
# §2.8 — Pandas-UDF surface: vectorized scalar + grouped-map regression
# ---------------------------------------------------------------------------


@register(
    "adv_udf_surface",
    f"""
WITH yearly AS (
  SELECT 'T' || lpad(CAST(o_custkey % 25 AS STRING), 2, '0') AS ticker,
         CAST(year(o_orderdate) AS INT) AS y,
         {dsum_sql('o_totalprice')} AS revenue
  FROM orders
  GROUP BY 1, 2
),
sums AS (
  -- exact integer sums in micro-units: bit-identical to the UDF's
  -- unbounded-int arithmetic regardless of aggregation order
  SELECT ticker,
         count(*) AS n,
         sum(CAST(y AS BIGINT)) AS sx,
         sum(CAST(round(revenue * 1000000) AS BIGINT)) AS sy,
         sum(CAST(y AS BIGINT) * CAST(round(revenue * 1000000) AS BIGINT)) AS sxy,
         sum(CAST(y AS BIGINT) * CAST(y AS BIGINT)) AS sxx
  FROM yearly
  GROUP BY ticker
)
SELECT 'scalar_quality' AS section, doc_id,
       round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
             + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) * 0.5, 6) AS quality,
       CAST(NULL AS VARCHAR) AS ticker, CAST(NULL AS DOUBLE) AS slope,
       CAST(NULL AS DOUBLE) AS intercept, CAST(NULL AS INT) AS n_points
FROM documents
UNION ALL
SELECT 'grouped_ols' AS section, CAST(NULL AS BIGINT) AS doc_id,
       CAST(NULL AS DOUBLE) AS quality, ticker,
       CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n * sxx - sx * sx AS DOUBLE) * 1000000) AS slope,
       (CAST(sy AS DOUBLE) / 1000000
        - (CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n * sxx - sx * sx AS DOUBLE) * 1000000)) * sx) / n AS intercept,
       CAST(n AS INT) AS n_points
FROM sums
""",
    survey="§2.8 (Arrow-vectorized scalar Pandas UDF bit-equal to SQL twin; applyInPandas grouped-map OLS with exact-int sums)",
)
def q_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    prepared = d.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    quality = prepared.select(
        F.lit("scalar_quality").alias("section"),
        "doc_id",
        quality_score_udf("len_chars", "n_tokens", "n_distinct").alias("quality"),
        F.lit(None).cast("string").alias("ticker"),
        F.lit(None).cast("double").alias("slope"),
        F.lit(None).cast("double").alias("intercept"),
        F.lit(None).cast("int").alias("n_points"),
    )
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.concat(
            F.lit("T"), F.lpad((F.col("o_custkey") % 25).cast("string"), 2, "0")
        ).alias("ticker"),
        F.year("o_orderdate").cast("int").alias("y"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    ols = ols_slope_per_group(yearly, ["ticker"], "y", "revenue").select(
        F.lit("grouped_ols").alias("section"),
        F.lit(None).cast("bigint").alias("doc_id"),
        F.lit(None).cast("double").alias("quality"),
        "ticker",
        "slope",
        "intercept",
        "n_points",
    )
    return quality.unionByName(ols)
