"""Generic relational operators on the TPC-H-ish driver tables
(SURVEY §2.2-§2.6 rows that don't need SEC-shaped data).

Each query is written the way it should run at 100 TB: filters that push
to the parquet scan, explicit broadcast hints for dimension joins,
partial-aggregable rollups, window dedup with total orders, and top-k as
TakeOrdered (never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.functions.deterministic import (
    davg_sql,
    dsum,
    dsum_sql,
)
from sec_financial_pipeline_spark.operators import dedup, windows
from sec_financial_pipeline_spark.registry.core import register
from sec_financial_pipeline_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# S5/F8 — projection + pushed-down predicate straight off the parquet scan
# ---------------------------------------------------------------------------


@register(
    "rel_scan_pushdown",
    """
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-01-01'
""",
    survey="S5 F8 (parquet scan w/ pushed filter + pruned projection)",
)
def q_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= "2001-01-01").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# A5 — TPC-H Q1-style pricing summary (the classic grouped rollup)
# ---------------------------------------------------------------------------


@register(
    "rel_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    survey="A5 C3 (multi-aggregate rollup; deterministic decimal sums)",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.functions.deterministic import davg

    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — snowflake dimension joins, broadcast both hops
# ---------------------------------------------------------------------------


@register(
    "rel_region_rollup",
    f"""
SELECT r.r_name, n.n_name,
       count(*) AS n_customers,
       {dsum_sql('c.c_acctbal')} AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    survey="J1 A10 (broadcast snowflake join + rollup)",
)
def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("total_acctbal"),
    )


# ---------------------------------------------------------------------------
# A2/A3 — the two dedup policies on raw lineitem
# ---------------------------------------------------------------------------

_LI_TIEBREAK = ["l_linenumber", "l_partkey", "l_suppkey"]


@register(
    "rel_argmax_abs_dedup",
    """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice FROM (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY abs(l_extendedprice) DESC,
                    l_linenumber ASC, l_partkey ASC, l_suppkey ASC) AS rn
  FROM lineitem
) WHERE rn = 1
""",
    survey="A2 (argmax-abs dedup with deterministic tie-break)",
)
def q_argmax_abs_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = dedup.argmax_abs(
        li, ["l_orderkey"], "l_extendedprice", tiebreakers=_LI_TIEBREAK
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )


@register(
    "rel_last_write_wins",
    """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice FROM (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC,
                    l_extendedprice DESC) AS rn
  FROM lineitem
) WHERE rn = 1
""",
    survey="A3 (last-write-wins dedup under explicit ingest order)",
)
def q_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = dedup.last_write_wins(
        li,
        ["l_orderkey"],
        "l_linenumber",
        tiebreakers=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# W1/W2 — global top-k and grouped top-k
# ---------------------------------------------------------------------------


@register(
    "rel_topk_orders",
    """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
    survey="W1 W2 (top-k under total order — TakeOrdered, no full sort)",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return windows.top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        100,
    )


@register(
    "rel_grouped_topk",
    """
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC,
                    l_partkey ASC, l_suppkey ASC) AS rn
  FROM lineitem
) WHERE rn <= 3
""",
    survey="W2 W8 (top-k per group via ranked window)",
)
def q_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_partkey").asc(),
        F.col("l_suppkey").asc(),
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# A6/C6 — conditional aggregation & bucketing
# ---------------------------------------------------------------------------


@register(
    "rel_status_rollup",
    f"""
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
       {dsum_sql('o_totalprice')} AS total_price,
       CAST(max(o_orderdate) AS DATE) AS latest_order
FROM orders
GROUP BY o_orderpriority
""",
    survey="A6 (conditional counts per group, max watermark)",
)
def q_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        dsum("o_totalprice").alias("total_price"),
        F.max("o_orderdate").cast("date").alias("latest_order"),
    )


@register(
    "rel_price_buckets",
    f"""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS bucket,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY 1
""",
    survey="C6 (when/otherwise bucket classification)",
)
def q_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# A11 — set operations on key sets
# ---------------------------------------------------------------------------


@register(
    "rel_setops_years",
    """
SELECT CAST(year(o_orderdate) AS INT) AS order_year FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT CAST(year(o_orderdate) AS INT) AS order_year FROM orders WHERE o_orderstatus = 'O'
""",
    survey="A11 (intersect of key sets, reference main.py:517)",
)
def q_setops_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    years = lambda status: (
        o.filter(F.col("o_orderstatus") == status)
        .select(F.year("o_orderdate").cast("int").alias("order_year"))
        .distinct()
    )
    return years("F").intersect(years("O"))


# ---------------------------------------------------------------------------
# C1/C2/C4 — scalar function surfaces (string, date, hash)
# ---------------------------------------------------------------------------


@register(
    "rel_string_scalar",
    """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lpad(CAST(c_custkey AS STRING), 10, '0') AS key_padded,
       substr(c_name, 1, 8) AS name_prefix,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS STRING)) AS seg_key,
       regexp_matches(c_mktsegment, '^[A-Z]+$') AS seg_is_alpha
FROM customer
WHERE c_custkey < 200
""",
    survey="C1 F7 (upper, lpad/zfill, substring, concat, regex validate)",
)
def q_string_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") < 200).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(
            "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_key"),
        F.col("c_mktsegment").rlike("^[A-Z]+$").alias("seg_is_alpha"),
    )


@register(
    "rel_date_scalar",
    """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch
FROM orders
WHERE o_orderkey % 97 = 0
""",
    survey="C2 (year/quarter/month, date_trunc, date arithmetic)",
)
def q_date_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01"))
        .cast("int")
        .alias("days_since_epoch"),
    )


@register(
    "rel_hash_md5",
    """
SELECT c_custkey,
       md5(concat_ws('|', CAST(c_custkey AS STRING), c_name)) AS row_hash
FROM customer
WHERE c_custkey < 100
""",
    survey="C4 (md5 content hash for change detection, sec_client.py:315-318)",
)
def q_hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") < 100).select(
        "c_custkey",
        F.md5(
            F.concat_ws("|", F.col("c_custkey").cast("string"), F.col("c_name"))
        ).alias("row_hash"),
    )


# ---------------------------------------------------------------------------
# W3/W4/W5 — time-series growth on order revenue
# ---------------------------------------------------------------------------


@register(
    "rel_monthly_yoy",
    f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS y,
         CAST(month(o_orderdate) AS INT) AS m,
         {dsum_sql('o_totalprice')} AS revenue
  FROM orders
  GROUP BY 1, 2
)
SELECT y, m, revenue,
       round(CASE WHEN lag(revenue) OVER w <> 0
                  THEN (revenue / lag(revenue) OVER w - 1.0) * 100 END, 6) AS yoy_pct
FROM monthly
WINDOW w AS (PARTITION BY m ORDER BY y)
""",
    survey="W3 W4 (lag-based YoY growth on monthly aggregates)",
)
def q_monthly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    grown = windows.yoy_growth(monthly, ["m"], "y", "revenue", out_col="yoy_pct")
    return grown.select("y", "m", "revenue", F.round("yoy_pct", 6).alias("yoy_pct"))


@register(
    "rel_segment_cagr",
    f"""
WITH yearly AS (
  SELECT c.c_mktsegment, CAST(year(o.o_orderdate) AS INT) AS y,
         {dsum_sql('o.o_totalprice')} AS revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment,
       min_by(revenue, y) AS first_value,
       max_by(revenue, y) AS last_value,
       CAST(max(y) - min(y) AS INT) AS n_periods,
       CASE WHEN min_by(revenue, y) > 0 AND max_by(revenue, y) > 0 AND max(y) > min(y)
            THEN round((power(max_by(revenue, y) / min_by(revenue, y),
                        1.0 / (max(y) - min(y))) - 1.0) * 100, 6)
       END AS cagr_pct
FROM yearly
GROUP BY c_mktsegment
""",
    survey="W5 (CAGR via min_by/max_by — single partial-aggregable pass)",
)
def q_segment_cagr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    yearly = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", F.year("o_orderdate").cast("int").alias("y"))
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    out = windows.cagr(yearly, ["c_mktsegment"], "y", "revenue")
    return out.withColumn("cagr_pct", F.round("cagr_pct", 6))


# ---------------------------------------------------------------------------
# Semi/anti joins (EXISTS / NOT EXISTS) and grouping sets
# ---------------------------------------------------------------------------


@register(
    "rel_semi_join",
    """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
    survey="J-family (left-semi join == EXISTS; no row multiplication)",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "rel_anti_join",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    survey="J-family (left-anti join == NOT EXISTS; incremental-ETL shape)",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "rel_rollup_counts",
    """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    survey="A-family (rollup grouping sets with subtotals)",
)
def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
        )
    )


@register(
    "rel_unpivot_measures",
    f"""
SELECT l_returnflag, measure, total FROM (
  SELECT l_returnflag, 'quantity' AS measure, {dsum_sql('l_quantity')} AS total
  FROM lineitem GROUP BY l_returnflag
  UNION ALL
  SELECT l_returnflag, 'extendedprice' AS measure, {dsum_sql('l_extendedprice')} AS total
  FROM lineitem GROUP BY l_returnflag
  UNION ALL
  SELECT l_returnflag, 'discount' AS measure, {dsum_sql('l_discount')} AS total
  FROM lineitem GROUP BY l_returnflag
)
""",
    survey="A4-inverse (unpivot wide measures to long via stack)",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.functions.deterministic import dsum

    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("quantity"),
        dsum("l_extendedprice").alias("extendedprice"),
        dsum("l_discount").alias("discount"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(3, 'quantity', quantity, 'extendedprice', extendedprice, "
        "'discount', discount) AS (measure, total)",
    )


@register(
    "rel_cube_counts",
    f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       {dsum_sql('l_quantity')} AS total_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    survey="A-family (cube grouping sets: all subtotal combinations)",
)
def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "total_qty",
        )
    )
