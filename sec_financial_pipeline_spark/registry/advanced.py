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
# ntile buckets + exact interpolated median per segment
# ---------------------------------------------------------------------------


@register(
    "adv_ntile_median",
    """
SELECT c_mktsegment,
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
    survey="W-family A-family (ntile quartiles + exact interpolated median)",
)
def q_ntile_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    bucketed = c.withColumn("q", F.ntile(4).over(w))
    return bucketed.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("median_acctbal"),
        F.count(F.when(F.col("q") == 1, 1)).alias("q1_n"),
        F.count(F.when(F.col("q") == 4, 1)).alias("q4_n"),
    )


# ---------------------------------------------------------------------------
# Extended date/time scalar surface (C2)
# ---------------------------------------------------------------------------


@register(
    "adv_date_extended",
    """
SELECT o_orderkey,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       CAST(isodow(o_orderdate) AS INT) AS iso_weekday,
       CAST(dayofyear(o_orderdate) AS INT) AS day_of_year,
       CAST(week(o_orderdate) AS INT) AS week_of_year,
       CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_sec
FROM orders
WHERE o_orderkey % 131 = 0
""",
    survey="C2 (last_day, add_months, ISO weekday, day/week-of-year, epoch)",
)
def q_date_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 131 == 0).select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).alias("plus_3m"),
        # Spark weekday(): 0 = Monday; ISO dow is 1 = Monday
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_weekday"),
        F.dayofyear("o_orderdate").cast("int").alias("day_of_year"),
        F.weekofyear("o_orderdate").cast("int").alias("week_of_year"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("epoch_sec"),
    )


# ---------------------------------------------------------------------------
# Regex (BPE-ish) tokenization counts (north-star text analysis)
# ---------------------------------------------------------------------------


@register(
    "adv_token_regex",
    r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_word_tokens,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_number_tokens
FROM documents
""",
    survey="§2.9 token-counting (regex token classes, BPE-ish segmentation)",
)
def q_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("int")
        .alias("n_bpe_tokens"),
        F.regexp_count("text", F.lit("[a-z]+")).cast("int").alias("n_word_tokens"),
        F.regexp_count("text", F.lit("[0-9]+")).cast("int").alias("n_number_tokens"),
    )


# ---------------------------------------------------------------------------
# Embedding centroids per label (long format, deterministic decimal means)
# ---------------------------------------------------------------------------


@register(
    "adv_embedding_centroids",
    """
SELECT label, CAST(dim AS INT) AS dim,
       CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) / COUNT(v) AS centroid
FROM (
  SELECT label, u.dim, u.v FROM embeddings,
  LATERAL (SELECT generate_subscripts(embedding, 1) AS dim,
                  unnest(CAST(embedding AS DOUBLE[])) AS v) u
)
GROUP BY label, dim
""",
    survey="§2.9 embedding ops (per-label centroid, order-independent mean)",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    exploded = e.select(
        "label", F.posexplode("emb").alias("pos", "v")
    ).select("label", (F.col("pos") + 1).cast("int").alias("dim"), "v")
    return exploded.groupBy("label", "dim").agg(
        (F.sum(F.col("v").cast("decimal(30,6)")).cast("double") / F.count("v")).alias(
            "centroid"
        )
    )


# ---------------------------------------------------------------------------
# §2.8 — Pandas-UDF surface: vectorized scalar + grouped-map regression
# ---------------------------------------------------------------------------


@register(
    "adv_pandas_udf_quality",
    """
SELECT doc_id,
       round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
             + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) * 0.5, 6) AS quality
FROM documents
""",
    survey="§2.8 (Arrow-vectorized scalar Pandas UDF, bit-equal to SQL twin)",
)
def q_pandas_udf_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    prepared = d.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    return prepared.select(
        "doc_id",
        quality_score_udf("len_chars", "n_tokens", "n_distinct").alias("quality"),
    )


@register(
    "adv_grouped_udf_regression",
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
SELECT ticker,
       CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n * sxx - sx * sx AS DOUBLE) * 1000000) AS slope,
       (CAST(sy AS DOUBLE) / 1000000
        - (CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n * sxx - sx * sx AS DOUBLE) * 1000000)) * sx) / n AS intercept,
       CAST(n AS INT) AS n_points
FROM sums
""",
    survey="§2.8 (applyInPandas grouped-map OLS; exact-int sums == oracle)",
)
def q_grouped_udf_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.concat(
            F.lit("T"), F.lpad((F.col("o_custkey") % 25).cast("string"), 2, "0")
        ).alias("ticker"),
        F.year("o_orderdate").cast("int").alias("y"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    return ols_slope_per_group(yearly, ["ticker"], "y", "revenue")


# ---------------------------------------------------------------------------
# Rank-function family (rank / dense_rank / percent_rank / cume_dist / lead)
# ---------------------------------------------------------------------------


@register(
    "adv_rank_family",
    """
SELECT c_mktsegment, c_custkey,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       round(percent_rank() OVER w, 6) AS prnk,
       round(cume_dist() OVER w, 6) AS cdist,
       lead(c_custkey, 1) OVER w AS next_custkey,
       first_value(c_custkey) OVER w AS top_custkey
FROM customer
WHERE c_custkey < 300
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    survey="W-family (rank/dense_rank/percent_rank/cume_dist/lead/first_value)",
)
def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.lead("c_custkey", 1).over(w).alias("next_custkey"),
        F.first("c_custkey").over(w).alias("top_custkey"),
    )
