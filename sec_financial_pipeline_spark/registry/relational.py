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
# Skew-safe salted aggregation as a driver row: l_returnflag has 3 hot
# keys over the whole table — the canonical skewed-reducer shape. The
# two-phase (key, salt) partial sum must be bit-identical to the plain
# group-by because the partials are exact decimals (salting never
# perturbs an algebraic aggregate computed exactly); the oracle IS the
# plain group-by.
# ---------------------------------------------------------------------------


_SALTED_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""

#: Count-Min frequency probes (operators/sketches.py): d=4 salted
#: md5 hash rows x w=256 counters over l_suppkey; probe keys 1..10 get
#: min-over-rows estimates, with true counts riding along to witness
#: the one-sided error (est >= true always; overcount bounded by
#: collisions). All-integer state — bit-identical across engines.
_CMS_D, _CMS_W = 4, 256
_CMS_ORACLE = f"""
WITH rows_i AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS row_i),
cnt AS (
  SELECT row_i, counter, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT r.row_i,
           ('0x' || substr(md5(CAST(r.row_i AS VARCHAR) || '#' ||
                               CAST(l.l_suppkey AS VARCHAR)), 1, 8))::BIGINT
             % {_CMS_W} AS counter
    FROM lineitem l, rows_i r
  ) GROUP BY row_i, counter
),
probes AS (SELECT unnest(generate_series(1, 10)) AS k),
pl AS (
  SELECT p.k, r.row_i,
         ('0x' || substr(md5(CAST(r.row_i AS VARCHAR) || '#' ||
                             CAST(p.k AS VARCHAR)), 1, 8))::BIGINT
           % {_CMS_W} AS counter
  FROM probes p, rows_i r
),
est AS (
  SELECT k, min(coalesce(c, 0)) AS cms_est
  FROM pl LEFT JOIN cnt USING (row_i, counter) GROUP BY k
),
tru AS (
  SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS true_cnt
  FROM lineitem WHERE l_suppkey BETWEEN 1 AND 10 GROUP BY l_suppkey
)
SELECT CAST(est.k AS BIGINT) AS probe_key,
       CAST(est.cms_est AS BIGINT) AS cms_est,
       CAST(coalesce(tru.true_cnt, 0) AS BIGINT) AS true_cnt
FROM est LEFT JOIN tru ON est.k = tru.k
"""

#: HDR log-bucket quantile histogram (operators/sketches.py, the
#: HdrHistogram pattern): bucket = (bit length via bin(), next 5 bits
#: after the MSB) of price-in-cents — integer state, mergeable by
#: count-sum, bit-identical across engines (bin()/shift/mask only; the
#: binary-string trick replaces log2). Bounded relative error 2^-5 at
#: any scale; the quantile walk is a driver loop over <= 64*32 buckets.
_HDR_ORACLE = """
SELECT CAST((length(bin(v)) * 32) +
            ((v >> greatest(length(bin(v)) - 6, 0)) & 31) AS BIGINT)
         AS hdr_bucket,
       CAST(count(*) AS BIGINT) AS hdr_cnt
FROM (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem)
GROUP BY 1
"""
# ^ round() BEFORE the cast: DuckDB's double->BIGINT cast rounds while
# Spark's truncates (33k rows diverge at sf0.1, measured); rounding
# first makes the value integral so both casts are exact.

_SKEW_SCHEMA = [
    ("l_returnflag", "string"),
    ("sum_price", "double"),
    ("n_rows", "bigint"),
    ("probe_key", "bigint"),
    ("cms_est", "bigint"),
    ("true_cnt", "bigint"),
    ("hdr_bucket", "bigint"),
    ("hdr_cnt", "bigint"),
]

from sec_financial_pipeline_spark.registry.merge import (  # noqa: E402
    union_sections as _u_sections,
    union_sections_sql as _u_sections_sql,
)


def q_cms_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.sketches import (
        cms_counters,
        cms_lookup,
    )

    li = load_table(spark, sf_dir, "lineitem")
    counters = cms_counters(li, "l_suppkey", d=_CMS_D, w=_CMS_W)
    probes = spark.range(1, 11).select(F.col("id").alias("l_suppkey"))
    est = cms_lookup(counters, probes, "l_suppkey", d=_CMS_D, w=_CMS_W)
    tru = (
        li.filter(F.col("l_suppkey").between(1, 10))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
    )
    return est.join(tru, "l_suppkey", "left").select(
        F.col("l_suppkey").cast("bigint").alias("probe_key"),
        "cms_est",
        F.coalesce(F.col("true_cnt"), F.lit(0)).cast("bigint").alias("true_cnt"),
    )


@register(
    "rel_skewed_agg",
    _u_sections_sql(
        [
            ("salted", _SALTED_ORACLE,
             ["l_returnflag", "sum_price", "n_rows"]),
            ("cms", _CMS_ORACLE, ["probe_key", "cms_est", "true_cnt"]),
            ("hdr", _HDR_ORACLE, ["hdr_bucket", "hdr_cnt"]),
        ],
        _SKEW_SCHEMA,
    ),
    survey=(
        "A5 + skew (two-phase salted aggregation over 3-hot-key column;"
        " exact-decimal partials make salting invisible) + Count-Min"
        " frequency sketch (Cormode 2005: d=4 x w=256 integer counters,"
        " partial-aggregable, mergeable; one-sided error witnessed by"
        " true counts) + HDR log-bucket quantile histogram (HdrHistogram:"
        " bit-length + 5 sub-bits via bin()/shift/mask, integer mergeable"
        " state, relative error 2^-5; quantiles from bounded state)"
    ),
)
def q_skewed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.skew import salted_sum

    li = load_table(spark, sf_dir, "lineitem")
    sums = salted_sum(
        li,
        ["l_returnflag"],
        F.col("l_extendedprice"),
        "sum_price",
        n_salts=16,
        salt_source="l_orderkey",
    )
    counts = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    salted = sums.join(counts, "l_returnflag").select(
        "l_returnflag", "sum_price", "n_rows"
    )
    from sec_financial_pipeline_spark.operators.sketches import hdr_histogram

    hdr = hdr_histogram(
        li,
        F.round(F.col("l_extendedprice") * 100).cast("long"),
        sub_bits=5,
    )
    return _u_sections(
        [
            ("salted", salted),
            ("cms", q_cms_probes(spark, sf_dir)),
            ("hdr", hdr),
        ],
        _SKEW_SCHEMA,
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
# A2/A3 — the two dedup policies on raw lineitem, side by side
# ---------------------------------------------------------------------------

_LI_TIEBREAK = ["l_linenumber", "l_partkey", "l_suppkey"]

_DEDUP_COLS = "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice"


@register(
    "rel_dedup_policies",
    f"""
SELECT 'argmax_abs' AS policy, {_DEDUP_COLS} FROM (
  SELECT {_DEDUP_COLS},
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY abs(l_extendedprice) DESC,
                    l_linenumber ASC, l_partkey ASC, l_suppkey ASC) AS rn
  FROM lineitem
) WHERE rn = 1
UNION ALL
SELECT 'last_write_wins' AS policy, {_DEDUP_COLS} FROM (
  SELECT {_DEDUP_COLS},
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC,
                    l_extendedprice DESC) AS rn
  FROM lineitem
) WHERE rn = 1
""",
    survey="A2 A3 (argmax-abs + last-write-wins dedup, deterministic tie-breaks)",
)
def q_dedup_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = _DEDUP_COLS.split(", ")
    # r14 (guide §2.3/§2.4): the two `keep_first` windows each scanned
    # and shuffled lineitem (the abs() sort projection defeats
    # ReusedExchange — plans/r14/rel_dedup_policies_before.txt shows 2
    # scans + 2 exchanges). Both policies are total orders over
    # null-free numeric sort keys, so one fused aggregation computes
    # both winners: 1 scan, hash partial-agg (no map-side sorts), 1
    # exchange of one row per key. Equivalence with the window form is
    # pinned in tests/test_operators_fixes.py; the oracle row is
    # bit-exact (same winners — the orders are total, ties impossible).
    return dedup.keep_first_fused(
        li,
        ["l_orderkey"],
        [
            (
                "argmax_abs",
                [
                    F.abs(F.col("l_extendedprice")),
                    -F.col("l_linenumber"),
                    -F.col("l_partkey"),
                    -F.col("l_suppkey"),
                ],
            ),
            (
                "last_write_wins",
                [
                    F.col("l_linenumber"),
                    F.col("l_partkey"),
                    F.col("l_suppkey"),
                    F.col("l_extendedprice"),
                ],
            ),
        ],
        cols,
    )


# ---------------------------------------------------------------------------
# W1/W2/W8 — global top-k (TakeOrdered) + grouped top-k (ranked window)
# ---------------------------------------------------------------------------


@register(
    "rel_topk",
    """
SELECT 'global' AS scope, CAST(NULL AS VARCHAR) AS grp,
       o_orderkey AS key1, CAST(o_custkey AS BIGINT) AS key2,
       o_totalprice AS measure
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 100
)
UNION ALL
SELECT 'grouped' AS scope, l_returnflag AS grp,
       l_orderkey AS key1, CAST(l_linenumber AS BIGINT) AS key2,
       l_extendedprice AS measure
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC,
                    l_partkey ASC, l_suppkey ASC) AS rn
  FROM lineitem
) WHERE rn <= 3
""",
    survey="W1 W2 W8 (global top-k as TakeOrdered, no full sort; grouped top-k via ranked window)",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    topk = windows.top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        100,
    ).select(
        F.lit("global").alias("scope"),
        F.lit(None).cast("string").alias("grp"),
        F.col("o_orderkey").alias("key1"),
        F.col("o_custkey").cast("bigint").alias("key2"),
        F.col("o_totalprice").alias("measure"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_partkey").asc(),
        F.col("l_suppkey").asc(),
    )
    grouped = (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.lit("grouped").alias("scope"),
            F.col("l_returnflag").alias("grp"),
            F.col("l_orderkey").alias("key1"),
            F.col("l_linenumber").cast("bigint").alias("key2"),
            F.col("l_extendedprice").alias("measure"),
        )
    )
    return topk.unionByName(grouped)


# ---------------------------------------------------------------------------
# A6/C6 — conditional aggregation & bucketing
# ---------------------------------------------------------------------------


@register(
    "rel_conditional_rollup",
    f"""
SELECT 'status' AS section, o_orderpriority AS grp,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
       CAST(NULL AS BIGINT) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price,
       CAST(max(o_orderdate) AS DATE) AS latest_order
FROM orders
GROUP BY o_orderpriority
UNION ALL
SELECT 'bucket' AS section,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS grp,
       CAST(NULL AS BIGINT) AS n_finished,
       CAST(NULL AS BIGINT) AS n_open,
       CAST(NULL AS BIGINT) AS n_pending,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price,
       CAST(NULL AS DATE) AS latest_order
FROM orders
GROUP BY 2
""",
    survey="A6 C6 (conditional counts + max watermark; when/otherwise buckets)",
)
def q_conditional_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    status = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        dsum("o_totalprice").alias("total_price"),
        F.max("o_orderdate").cast("date").alias("latest_order"),
    ).select(
        F.lit("status").alias("section"),
        "grp",
        "n_finished",
        "n_open",
        "n_pending",
        F.lit(None).cast("bigint").alias("n_orders"),
        "total_price",
        "latest_order",
    )
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    buckets = (
        o.withColumn("grp", bucket)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .select(
            F.lit("bucket").alias("section"),
            "grp",
            F.lit(None).cast("bigint").alias("n_finished"),
            F.lit(None).cast("bigint").alias("n_open"),
            F.lit(None).cast("bigint").alias("n_pending"),
            "n_orders",
            "total_price",
            F.lit(None).cast("date").alias("latest_order"),
        )
    )
    return status.unionByName(buckets)


# ---------------------------------------------------------------------------
# A11 — set operations on key sets
# ---------------------------------------------------------------------------


@register(
    "rel_setops_unpivot",
    f"""
SELECT 'intersect_years' AS section, order_year,
       CAST(NULL AS VARCHAR) AS returnflag, CAST(NULL AS VARCHAR) AS measure,
       CAST(NULL AS DOUBLE) AS total
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS order_year FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT CAST(year(o_orderdate) AS INT) AS order_year FROM orders WHERE o_orderstatus = 'O'
)
UNION ALL
SELECT 'unpivot' AS section, CAST(NULL AS INT) AS order_year,
       l_returnflag AS returnflag, measure, total
FROM (
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
    survey="A11 A4-inverse (intersect of key sets, main.py:517; unpivot wide->long via stack)",
)
def q_setops_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    years = lambda status: (
        o.filter(F.col("o_orderstatus") == status)
        .select(F.year("o_orderdate").cast("int").alias("order_year"))
        .distinct()
    )
    setops = years("F").intersect(years("O")).select(
        F.lit("intersect_years").alias("section"),
        "order_year",
        F.lit(None).cast("string").alias("returnflag"),
        F.lit(None).cast("string").alias("measure"),
        F.lit(None).cast("double").alias("total"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("quantity"),
        dsum("l_extendedprice").alias("extendedprice"),
        dsum("l_discount").alias("discount"),
    )
    unpivot = wide.selectExpr(
        "l_returnflag",
        "stack(3, 'quantity', quantity, 'extendedprice', extendedprice, "
        "'discount', discount) AS (measure, total)",
    ).select(
        F.lit("unpivot").alias("section"),
        F.lit(None).cast("int").alias("order_year"),
        F.col("l_returnflag").alias("returnflag"),
        "measure",
        "total",
    )
    return setops.unionByName(unpivot)


# ---------------------------------------------------------------------------
# C1/C2/C4 — scalar function surfaces (string, date, hash), merged into
# one long-format query (section, row_key, field, value-as-string) so
# both families fit one registry slot; the string canonicalization is
# itself part of the demo (dates, booleans, ints render identically in
# both engines).
# ---------------------------------------------------------------------------

_STRING_SCALAR_SQL = """SELECT c_custkey AS row_key,
       upper(c_name) AS name_upper,
       lpad(CAST(c_custkey AS STRING), 10, '0') AS key_padded,
       substr(c_name, 1, 8) AS name_prefix,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS STRING)) AS seg_key,
       CAST(regexp_matches(c_mktsegment, '^[A-Z]+$') AS VARCHAR) AS seg_is_alpha,
       md5(concat_ws('|', CAST(c_custkey AS STRING), c_name)) AS row_hash
FROM customer
WHERE c_custkey < 200"""

_STRING_FIELDS = (
    "name_upper",
    "key_padded",
    "name_prefix",
    "seg_key",
    "seg_is_alpha",
    "row_hash",
)

_DATE_SCALAR_SQL = """SELECT o_orderkey AS row_key,
       CAST(CAST(year(o_orderdate) AS INT) AS VARCHAR) AS order_year,
       CAST(CAST(quarter(o_orderdate) AS INT) AS VARCHAR) AS order_quarter,
       CAST(CAST(month(o_orderdate) AS INT) AS VARCHAR) AS order_month,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS VARCHAR) AS days_since_epoch,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_3m,
       CAST(isodow(o_orderdate) AS VARCHAR) AS iso_weekday,
       CAST(dayofyear(o_orderdate) AS VARCHAR) AS day_of_year,
       CAST(week(o_orderdate) AS VARCHAR) AS week_of_year,
       CAST(CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS VARCHAR) AS epoch_sec
FROM orders
WHERE o_orderkey % 97 = 0"""

_DATE_FIELDS = (
    "order_year",
    "order_quarter",
    "order_month",
    "month_start",
    "days_since_epoch",
    "month_end",
    "plus_3m",
    "iso_weekday",
    "day_of_year",
    "week_of_year",
    "epoch_sec",
)


@register(
    "rel_scalar_functions",
    "WITH s AS (" + _STRING_SCALAR_SQL + "),\nd AS (" + _DATE_SCALAR_SQL + ")\n"
    + "\nUNION ALL\n".join(
        f"SELECT 'string' AS section, row_key, '{f}' AS field, {f} AS value FROM s"
        for f in _STRING_FIELDS
    )
    + "\nUNION ALL\n"
    + "\nUNION ALL\n".join(
        f"SELECT 'date' AS section, row_key, '{f}' AS field, {f} AS value FROM d"
        for f in _DATE_FIELDS
    ),
    survey="C1 C2 C4 F7 (string: upper/lpad/substr/concat/regex/md5 — sec_client.py:315-318; date: year/quarter/month/trunc/diff/last_day/add_months/ISO dow/epoch)",
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s_wide = c.filter(F.col("c_custkey") < 200).select(
        F.col("c_custkey").alias("row_key"),
        F.upper("c_name").alias("name_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(
            "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_key"),
        F.col("c_mktsegment").rlike("^[A-Z]+$").cast("string").alias("seg_is_alpha"),
        F.md5(
            F.concat_ws("|", F.col("c_custkey").cast("string"), F.col("c_name"))
        ).alias("row_hash"),
    )
    o = load_table(spark, sf_dir, "orders")
    d_wide = o.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("row_key"),
        F.year("o_orderdate").cast("int").cast("string").alias("order_year"),
        F.quarter("o_orderdate").cast("int").cast("string").alias("order_quarter"),
        F.month("o_orderdate").cast("int").cast("string").alias("order_month"),
        F.date_trunc("month", "o_orderdate")
        .cast("date")
        .cast("string")
        .alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01"))
        .cast("string")
        .alias("days_since_epoch"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus_3m"),
        # Spark weekday(): 0 = Monday; ISO dow is 1 = Monday
        (F.weekday("o_orderdate") + 1).cast("string").alias("iso_weekday"),
        F.dayofyear("o_orderdate").cast("string").alias("day_of_year"),
        F.weekofyear("o_orderdate").cast("string").alias("week_of_year"),
        F.unix_timestamp("o_orderdate").cast("string").alias("epoch_sec"),
    )
    s_long = s_wide.unpivot(
        ["row_key"], list(_STRING_FIELDS), "field", "value"
    ).select(F.lit("string").alias("section"), "row_key", "field", "value")
    d_long = d_wide.unpivot(
        ["row_key"], list(_DATE_FIELDS), "field", "value"
    ).select(F.lit("date").alias("section"), "row_key", "field", "value")
    return s_long.unionByName(d_long)


# ---------------------------------------------------------------------------
# W3/W4/W5 — time-series growth on order revenue
# ---------------------------------------------------------------------------


@register(
    "rel_growth",
    f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS y,
         CAST(month(o_orderdate) AS INT) AS m,
         {dsum_sql('o_totalprice')} AS revenue
  FROM orders
  GROUP BY 1, 2
),
yearly AS (
  SELECT c.c_mktsegment, CAST(year(o.o_orderdate) AS INT) AS y,
         {dsum_sql('o.o_totalprice')} AS revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT 'monthly_yoy' AS section, y, m, revenue,
       round(CASE WHEN lag(revenue) OVER w <> 0
                  THEN (revenue / lag(revenue) OVER w - 1.0) * 100 END, 6) AS yoy_pct,
       CAST(NULL AS VARCHAR) AS segment, CAST(NULL AS DOUBLE) AS first_value,
       CAST(NULL AS DOUBLE) AS last_value, CAST(NULL AS INT) AS n_periods,
       CAST(NULL AS DOUBLE) AS cagr_pct
FROM monthly
WINDOW w AS (PARTITION BY m ORDER BY y)
UNION ALL
SELECT 'segment_cagr' AS section, CAST(NULL AS INT) AS y, CAST(NULL AS INT) AS m,
       CAST(NULL AS DOUBLE) AS revenue, CAST(NULL AS DOUBLE) AS yoy_pct,
       c_mktsegment AS segment,
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
    survey="W3 W4 W5 (lag-based YoY growth; CAGR via min_by/max_by — single partial-aggregable pass)",
)
def q_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    yoy = windows.yoy_growth(monthly, ["m"], "y", "revenue", out_col="yoy_pct").select(
        F.lit("monthly_yoy").alias("section"),
        "y",
        "m",
        "revenue",
        F.round("yoy_pct", 6).alias("yoy_pct"),
        F.lit(None).cast("string").alias("segment"),
        F.lit(None).cast("double").alias("first_value"),
        F.lit(None).cast("double").alias("last_value"),
        F.lit(None).cast("int").alias("n_periods"),
        F.lit(None).cast("double").alias("cagr_pct"),
    )
    c = load_table(spark, sf_dir, "customer")
    yearly = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", F.year("o_orderdate").cast("int").alias("y"))
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    cagr = windows.cagr(yearly, ["c_mktsegment"], "y", "revenue").select(
        F.lit("segment_cagr").alias("section"),
        F.lit(None).cast("int").alias("y"),
        F.lit(None).cast("int").alias("m"),
        F.lit(None).cast("double").alias("revenue"),
        F.lit(None).cast("double").alias("yoy_pct"),
        F.col("c_mktsegment").alias("segment"),
        "first_value",
        "last_value",
        "n_periods",
        F.round("cagr_pct", 6).alias("cagr_pct"),
    )
    return yoy.unionByName(cagr)


# ---------------------------------------------------------------------------
# Semi/anti joins (EXISTS / NOT EXISTS) and grouping sets
# ---------------------------------------------------------------------------


#: KMV (k-minimum-values) set-overlap sketch between the customer key
#: set and the ordering-customer key set — intersection/Jaccard
#: estimated from two 64-hash sketches, never joining the raw sets
#: (operators/sketches.py). Exact counts ride along as the witness.
_KMV_K = 64
_KMV_ORACLE = f"""
WITH ha AS (
  SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM (SELECT DISTINCT c_custkey FROM customer)
  ORDER BY h LIMIT {_KMV_K}
),
hb AS (
  SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM (SELECT DISTINCT o_custkey FROM orders)
  ORDER BY h LIMIT {_KMV_K}
),
u AS (
  SELECT DISTINCT h FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
  ORDER BY h LIMIT {_KMV_K}
),
stats AS (
  SELECT max(h) AS theta, count(*) AS ku FROM u
),
m AS (
  SELECT count(*) AS matches FROM u
  WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)
),
x AS (
  SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_b,
         CAST((SELECT count(DISTINCT c_custkey) FROM customer) AS BIGINT)
           AS exact_a,
         CAST(count(DISTINCT CASE WHEN o_custkey IN
              (SELECT c_custkey FROM customer) THEN o_custkey END) AS BIGINT)
           AS exact_inter
  FROM orders
)
SELECT CAST(stats.ku AS INTEGER) AS k_used,
       CAST(m.matches AS BIGINT) AS kmv_matches,
       round(CASE WHEN stats.ku < {_KMV_K} THEN CAST(stats.ku AS DOUBLE)
                  ELSE {float(_KMV_K - 1)} * 4294967296.0 / stats.theta END,
             4) AS est_union,
       round(CAST(m.matches AS DOUBLE) / stats.ku, 4) AS est_jaccard,
       round((CAST(m.matches AS DOUBLE) / stats.ku)
             * CASE WHEN stats.ku < {_KMV_K} THEN CAST(stats.ku AS DOUBLE)
                    ELSE {float(_KMV_K - 1)} * 4294967296.0 / stats.theta END,
             4) AS est_intersection,
       x.exact_inter AS exact_intersection
FROM stats, m, x
"""


@register(
    "rel_existence_joins",
    f"""
SELECT 'semi' AS mode, c_custkey, c_name, c_mktsegment,
       CAST(NULL AS INTEGER) AS k_used, CAST(NULL AS BIGINT) AS kmv_matches,
       CAST(NULL AS DOUBLE) AS est_union, CAST(NULL AS DOUBLE) AS est_jaccard,
       CAST(NULL AS DOUBLE) AS est_intersection,
       CAST(NULL AS BIGINT) AS exact_intersection
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
UNION ALL
SELECT 'anti' AS mode, c_custkey, c_name, CAST(NULL AS VARCHAR) AS c_mktsegment,
       CAST(NULL AS INTEGER), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'kmv' AS mode, CAST(NULL AS BIGINT) AS c_custkey,
       CAST(NULL AS VARCHAR) AS c_name, CAST(NULL AS VARCHAR) AS c_mktsegment,
       k_used, kmv_matches, est_union, est_jaccard, est_intersection,
       exact_intersection
FROM ({_KMV_ORACLE})
""",
    survey=(
        "J-family (left-semi == EXISTS, no row multiplication; left-anti"
        " == NOT EXISTS, incremental-ETL shape) + KMV/theta set-overlap"
        " sketch (intersection and Jaccard estimated from two 64-hash"
        " sketches without joining the raw sets; exact witness rides"
        " along)"
    ),
)
def q_existence_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.sketches import (
        kmv_overlap,
        kmv_sketch,
    )

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pad = [
        F.lit(None).cast("int").alias("k_used"),
        F.lit(None).cast("bigint").alias("kmv_matches"),
        F.lit(None).cast("double").alias("est_union"),
        F.lit(None).cast("double").alias("est_jaccard"),
        F.lit(None).cast("double").alias("est_intersection"),
        F.lit(None).cast("bigint").alias("exact_intersection"),
    ]
    big = o.filter(F.col("o_totalprice") > 400000)
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        F.lit("semi").alias("mode"), "c_custkey", "c_name", "c_mktsegment",
        *pad,
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("anti").alias("mode"),
        "c_custkey",
        "c_name",
        F.lit(None).cast("string").alias("c_mktsegment"),
        *pad,
    )
    exact_inter = (
        o.select(F.col("o_custkey").alias("k")).distinct()
        .join(c.select(F.col("c_custkey").alias("k")).distinct(), "k",
              "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    kmv = kmv_overlap(
        kmv_sketch(c, "c_custkey", _KMV_K),
        kmv_sketch(o, "o_custkey", _KMV_K),
        _KMV_K,
    ).crossJoin(exact_inter).select(
        F.lit("kmv").alias("mode"),
        F.lit(None).cast("bigint").alias("c_custkey"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        "k_used",
        "kmv_matches",
        "est_union",
        "est_jaccard",
        "est_intersection",
        "exact_intersection",
    )
    return semi.unionByName(anti).unionByName(kmv)


@register(
    "rel_grouping_sets",
    f"""
SELECT 'rollup' AS mode,
       coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       CAST(NULL AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube' AS mode,
       coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       {dsum_sql('l_quantity')} AS total_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    survey="A-family (rollup subtotals + cube all-combination grouping sets)",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rollup = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .select(
            F.lit("rollup").alias("mode"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            F.lit(None).cast("double").alias("total_qty"),
        )
    )
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("total_qty"),
        )
        .select(
            F.lit("cube").alias("mode"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "total_qty",
        )
    )
    return rollup.unionByName(cube)
