"""SEC-domain queries over the derived ``facts``/``companies`` model.

These exercise the reference's own query surface (SURVEY §2.2-§2.5, §3.1)
end-to-end against the DuckDB oracle: the Spark side composes the real
operator library; the oracle re-states the same semantics as a window /
join / pivot SQL over the identical derived CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.functions.deterministic import dsum, dsum_sql
from sec_financial_pipeline_spark.functions.scalar import safe_div
from sec_financial_pipeline_spark.operators import filters, windows
from sec_financial_pipeline_spark.operators.dedup import keep_first
from sec_financial_pipeline_spark.plans import domain
from sec_financial_pipeline_spark.registry.core import register

# ---------------------------------------------------------------------------
# Shared building blocks
# ---------------------------------------------------------------------------


def _facts(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    return domain.facts_df(spark, sf_dir, spread=spread)


def metric_series(
    spark: SparkSession,
    sf_dir: str,
    metric: str,
    dedup: str = "argmax_abs",
    annual: bool = True,
) -> DataFrame:
    """The reference's §3.1 metric-series plan as one DataFrame pipeline
    (reference ``src/api/data_service.py:112-186``): unit filter -> period
    filter -> null-key filter -> broadcast alias join (tag coalescing) ->
    windowed dedup -> projection. One shuffle (the dedup window).

    Reads the UNSPREAD facts derivation (plans/domain._cached
    spread=False): a single-metric series prunes the 11-way fan-out to
    a narrow slice, and measured at sf0.1 the spread's exchange toll
    (+0.27s on sec_metric_series, +0.12s on sec_trends) exceeds the
    serial-derive cost it saves for this consumer family.
    """
    facts = _facts(spark, sf_dir, spread=False).filter(F.col("unit") == "USD")
    facts = filters.annual_only(facts) if annual else filters.quarterly_only(facts)
    facts = filters.drop_null_keys(facts, ["fiscal_year"])
    alias = domain.alias_df(spark).filter(F.col("metric") == metric)
    joined = facts.join(F.broadcast(alias), "tag")
    if dedup == "argmax_abs":
        order = [
            F.col("priority").asc(),
            F.abs(F.col("value")).desc(),
            F.col("fact_id").asc(),
        ]
    else:  # last-write-wins in fact ingest order (reference main.py:331)
        order = [F.col("priority").asc(), F.col("fact_id").desc()]
    best = keep_first(joined, ["ticker", "fiscal_year"], order)
    return best.select("ticker", "fiscal_year", "tag", "value")


def _metric_series_oracle(metric: str, dedup: str = "argmax_abs") -> str:
    rank_order = (
        "a.priority ASC, abs(f.value) DESC, f.fact_id ASC"
        if dedup == "argmax_abs"
        else "a.priority ASC, f.fact_id DESC"
    )
    return domain.duck_prelude() + f"""
SELECT ticker, fiscal_year, tag, value FROM (
  SELECT f.ticker, f.fiscal_year, f.tag, f.value,
         row_number() OVER (PARTITION BY f.ticker, f.fiscal_year
                            ORDER BY {rank_order}) AS rn
  FROM facts f
  JOIN alias_map a ON f.tag = a.tag AND a.metric = '{metric}'
  WHERE f.unit = 'USD'
    AND (f.fiscal_period IS NULL OR f.fiscal_period = 'FY')
    AND f.fiscal_year IS NOT NULL
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Flagship: the full §3.1 serving plan (scan→filter→coalesce→dedup→sort→limit)
# ---------------------------------------------------------------------------


def _policy_wrap(policy: str, body: str) -> str:
    start = body.index("SELECT ticker")
    return (
        f"SELECT '{policy}' AS policy, ticker, fiscal_year, tag, value\n"
        f"FROM ({body[start:]})"
    )


_METRIC_SERIES_ORACLE = (
    _metric_series_oracle("revenue").replace(
        "SELECT ticker", "SELECT 'argmax_abs' AS policy, ticker", 1
    )
    + "UNION ALL\n"
    + _policy_wrap("lww", _metric_series_oracle("net_income", dedup="lww"))
)


def q_metric_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = metric_series(spark, sf_dir, "revenue", dedup="argmax_abs").select(
        F.lit("argmax_abs").alias("policy"), "ticker", "fiscal_year", "tag", "value"
    )
    ni = metric_series(spark, sf_dir, "net_income", dedup="lww").select(
        F.lit("lww").alias("policy"), "ticker", "fiscal_year", "tag", "value"
    )
    return rev.unionByName(ni)


_METRIC_TOPK_ORACLE = (
    _metric_series_oracle("revenue")
    + "  AND fiscal_year BETWEEN 1996 AND 2000\n"
    + "ORDER BY fiscal_year DESC, ticker ASC LIMIT 40"
)


def q_metric_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = metric_series(spark, sf_dir, "revenue")
    series = filters.fiscal_year_range(series, 1996, 2000)
    return windows.top_k(
        series, [F.col("fiscal_year").desc(), F.col("ticker").asc()], 40
    )


# ---------------------------------------------------------------------------
# F1 — the two divergent period-predicate semantics, side by side
# ---------------------------------------------------------------------------


_PERIOD_SEMANTICS_ORACLE = domain.duck_prelude() + """
SELECT 'service' AS semantics, count(*) AS n_facts
FROM facts WHERE fiscal_period IS NULL OR fiscal_period = 'FY'
UNION ALL
SELECT 'analyzer' AS semantics, count(*) AS n_facts
FROM facts WHERE starts_with(coalesce(fiscal_period, ''), 'FY')
UNION ALL
SELECT 'quarterly' AS semantics, count(*) AS n_facts
FROM facts WHERE starts_with(coalesce(fiscal_period, ''), 'Q')
"""


def q_period_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = _facts(spark, sf_dir)
    rows = [
        ("service", filters.annual_only(facts)),
        ("analyzer", filters.annual_only_analyzer(facts)),
        ("quarterly", filters.quarterly_only(facts)),
    ]
    out = None
    for name, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n_facts")).select(
            F.lit(name).alias("semantics"), "n_facts"
        )
        out = one if out is None else out.unionByName(one)
    return out


# ---------------------------------------------------------------------------
# F4/F6 — label-substring match and unit-preference selection
# ---------------------------------------------------------------------------


@register(
    "sec_label_series",
    domain.duck_prelude() + """
SELECT 'counts' AS section, ticker, fiscal_year, count(*) AS n_matched,
       CAST(NULL AS VARCHAR) AS label, CAST(NULL AS DOUBLE) AS value
FROM facts
WHERE (contains(lower(label), 'revenue') OR contains(lower(label), 'net income'))
  AND fiscal_year IS NOT NULL
GROUP BY ticker, fiscal_year
UNION ALL
SELECT 'series' AS section, ticker, fiscal_year, CAST(NULL AS BIGINT) AS n_matched,
       label, value
FROM (
  SELECT f.ticker, f.fiscal_year, f.label, f.value,
         row_number() OVER (PARTITION BY f.ticker, f.fiscal_year
                            ORDER BY abs(f.value) DESC, f.fact_id ASC) AS rn
  FROM facts f
  WHERE f.unit = 'USD'
    AND contains(lower(f.label), 'net income')
    AND (f.fiscal_period IS NULL OR f.fiscal_period = 'FY')
    AND f.fiscal_year IS NOT NULL
) WHERE rn = 1
""",
    survey="F4 §3.1 (case-insensitive OR-of-substrings label match; label-substring metric extraction, data_service.py:112-186)",
)
def q_label_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = _facts(spark, sf_dir)
    matched = filters.label_any_substring(facts, ["Revenue", "NET INCOME"])
    matched = filters.drop_null_keys(matched, ["fiscal_year"])
    counts = matched.groupBy("ticker", "fiscal_year").agg(
        F.count(F.lit(1)).alias("n_matched")
    ).select(
        F.lit("counts").alias("section"),
        "ticker",
        "fiscal_year",
        "n_matched",
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("double").alias("value"),
    )
    usd = _facts(spark, sf_dir).filter(F.col("unit") == "USD")
    usd = filters.label_any_substring(usd, ["Net Income"])
    usd = filters.annual_only(usd)
    usd = filters.drop_null_keys(usd, ["fiscal_year"])
    best = keep_first(
        usd,
        ["ticker", "fiscal_year"],
        [F.abs(F.col("value")).desc(), F.col("fact_id").asc()],
    )
    series = best.select(
        F.lit("series").alias("section"),
        "ticker",
        "fiscal_year",
        F.lit(None).cast("bigint").alias("n_matched"),
        "label",
        "value",
    )
    return counts.unionByName(series)


_UNIT_PREFERENCE_ORACLE = domain.duck_prelude() + """
SELECT ticker, fiscal_year, unit, value FROM (
  SELECT f.ticker, f.fiscal_year, f.unit, f.value,
         row_number() OVER (
           PARTITION BY f.ticker, f.fiscal_year
           ORDER BY CASE f.unit WHEN 'USD' THEN 0 WHEN 'shares' THEN 1 ELSE 2 END,
                    abs(f.value) DESC, f.fact_id ASC) AS rn
  FROM facts f
  WHERE f.tag IN ('Revenues', 'SalesRevenueNet',
                  'RevenueFromContractWithCustomerExcludingAssessedTax')
    AND f.fiscal_year IS NOT NULL
) WHERE rn = 1
"""


def q_unit_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = _facts(spark, sf_dir).filter(
        F.col("tag").isin(
            "Revenues",
            "SalesRevenueNet",
            "RevenueFromContractWithCustomerExcludingAssessedTax",
        )
        & F.col("fiscal_year").isNotNull()
    )
    rank = filters.priority_rank(["USD", "shares"], F.col("unit"))
    best = keep_first(
        facts,
        ["ticker", "fiscal_year"],
        [rank.asc(), F.abs(F.col("value")).desc(), F.col("fact_id").asc()],
    )
    return best.select("ticker", "fiscal_year", "unit", "value")


# ---------------------------------------------------------------------------
# J2/J3 CTE helper (shared by pivots and ratio joins below)
# ---------------------------------------------------------------------------


def _series_cte(metric: str, name: str, dedup: str = "argmax_abs") -> str:
    """Re-package a metric-series oracle as a named CTE body."""
    body = _metric_series_oracle(metric, dedup)
    start = body.index("SELECT ticker")
    return f"{name} AS ({body[start:]})"


# ---------------------------------------------------------------------------
# A4/J5 — statement pivot and multi-company comparison pivot
# ---------------------------------------------------------------------------

_YEARS = list(range(1995, 2002))

_STATEMENT_PIVOT_ORACLE = domain.duck_prelude(
    _series_cte("revenue", "rev"), _series_cte("net_income", "ni")
) + """
SELECT ticker, metric,
""" + ",\n".join(
    f"  max(CASE WHEN fiscal_year = {y} THEN value END) AS y{y}" for y in _YEARS
) + """
FROM (
  SELECT ticker, 'revenue' AS metric, fiscal_year, value FROM rev
  UNION ALL
  SELECT ticker, 'net_income' AS metric, fiscal_year, value FROM ni
)
GROUP BY ticker, metric
"""


def q_statement_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.aggregates import pivot_wide

    rev = metric_series(spark, sf_dir, "revenue").withColumn(
        "metric", F.lit("revenue")
    )
    ni = metric_series(spark, sf_dir, "net_income").withColumn(
        "metric", F.lit("net_income")
    )
    long = rev.unionByName(ni)
    return pivot_wide(
        long,
        ["ticker", "metric"],
        "fiscal_year",
        [str(y) for y in _YEARS],
        F.first("value"),
        rename={str(y): f"y{y}" for y in _YEARS},
    )


_COMPARISON_TICKERS = ["T00", "T01", "T02", "T03", "T04"]

_COMPARISON_PIVOT_ORACLE = domain.duck_prelude(_series_cte("revenue", "rev")) + """
SELECT fiscal_year,
""" + ",\n".join(
    f"""  max(CASE WHEN ticker = '{t}' THEN value END) AS "{t}" """
    for t in _COMPARISON_TICKERS
) + """
FROM rev
GROUP BY fiscal_year
"""


def q_comparison_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = metric_series(spark, sf_dir, "revenue")
    return (
        series.groupBy("fiscal_year")
        .pivot("ticker", _COMPARISON_TICKERS)
        .agg(F.first("value"))
    )


# ---------------------------------------------------------------------------
# J2/J3/C3 — ratio joins (inner + full-outer-zero-fill) with safe division
# ---------------------------------------------------------------------------


_RATIOS_ORACLE = domain.duck_prelude(
    _series_cte("revenue", "rev"),
    _series_cte("net_income", "ni"),
    _series_cte("total_assets", "assets"),
) + """
SELECT r.ticker, r.fiscal_year,
       r.value AS revenue, n.value AS net_income, a.value AS total_assets,
       CASE WHEN r.value <> 0 THEN n.value / r.value * 100 END AS net_margin_pct,
       CASE WHEN a.value <> 0 THEN n.value / a.value * 100 END AS roa_pct
FROM rev r
JOIN ni n ON r.ticker = n.ticker AND r.fiscal_year = n.fiscal_year
JOIN assets a ON r.ticker = a.ticker AND r.fiscal_year = a.fiscal_year
"""


def q_ratios_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fused plan: ONE broadcast alias join + ONE dedup window over
    # (ticker, metric, fiscal_year) + pivot — a single shuffle instead of
    # three independent per-metric series plans joined afterwards.
    # Semantically identical to rev ⨝ ni ⨝ assets (the oracle's shape):
    # the inner join drops (ticker, year) pairs missing any metric, which
    # the pivot reproduces by requiring all three columns non-null.
    facts = _facts(spark, sf_dir).filter(F.col("unit") == "USD")
    facts = filters.annual_only(facts)
    facts = filters.drop_null_keys(facts, ["fiscal_year"])
    alias = domain.alias_df(spark)
    joined = facts.join(F.broadcast(alias), "tag")
    best = keep_first(
        joined,
        ["ticker", "metric", "fiscal_year"],
        [F.col("priority").asc(), F.abs(F.col("value")).desc(), F.col("fact_id").asc()],
    )
    wide = (
        best.groupBy("ticker", "fiscal_year")
        .pivot("metric", ["revenue", "net_income", "total_assets"])
        .agg(F.first("value"))
    )
    complete = wide.filter(
        F.col("revenue").isNotNull()
        & F.col("net_income").isNotNull()
        & F.col("total_assets").isNotNull()
    )
    return complete.select(
        "ticker",
        "fiscal_year",
        "revenue",
        "net_income",
        "total_assets",
        (safe_div(F.col("net_income"), F.col("revenue")) * 100).alias(
            "net_margin_pct"
        ),
        (safe_div(F.col("net_income"), F.col("total_assets")) * 100).alias(
            "roa_pct"
        ),
    )


# ---------------------------------------------------------------------------
# The reference's FULL ratio matrix (main.py:490-565): millions-scaled
# bases, gross/operating/net margins, ROA/ROE, debt-to-equity, EPS
# passthrough — one fused plan (one alias join, one dedup window, one
# pivot), not eleven per-metric series plans joined pairwise.
# ---------------------------------------------------------------------------

_MATRIX_INCOME = [
    "revenue", "gross_profit", "operating_income", "net_income",
    "eps_basic", "eps_diluted",
]
_MATRIX_BALANCE = ["total_assets", "stockholders_equity", "total_liabilities"]

_RATIO_MATRIX_ORACLE = domain.duck_prelude() + f"""
SELECT ticker, fiscal_year,
       coalesce(revenue, 0) / 1000000.0 AS revenue_millions,
       coalesce(net_income, 0) / 1000000.0 AS net_income_millions,
       coalesce(total_assets, 0) / 1000000.0 AS total_assets_millions,
       CASE WHEN revenue > 0 THEN coalesce(gross_profit, 0) / revenue * 100 END AS gross_margin_pct,
       CASE WHEN revenue > 0 THEN coalesce(operating_income, 0) / revenue * 100 END AS operating_margin_pct,
       CASE WHEN revenue > 0 THEN coalesce(net_income, 0) / revenue * 100 END AS net_margin_pct,
       CASE WHEN total_assets > 0 THEN coalesce(net_income, 0) / total_assets * 100 END AS roa_pct,
       CASE WHEN stockholders_equity > 0 THEN coalesce(net_income, 0) / stockholders_equity * 100 END AS roe_pct,
       CASE WHEN stockholders_equity > 0 THEN coalesce(total_liabilities, 0) / stockholders_equity END AS debt_to_equity,
       coalesce(eps_basic, 0) AS eps_basic,
       coalesce(eps_diluted, 0) AS eps_diluted
FROM (
  SELECT ticker, fiscal_year,
""" + ",\n".join(
    f"    max(CASE WHEN metric = '{m}' THEN value END) AS {m}"
    for m in _MATRIX_INCOME + _MATRIX_BALANCE
) + """
  FROM (
    SELECT f.ticker, f.fiscal_year, a.metric, f.value,
           row_number() OVER (PARTITION BY f.ticker, a.metric, f.fiscal_year
                              ORDER BY a.priority ASC, abs(f.value) DESC, f.fact_id ASC) AS rn
    FROM facts f
    JOIN alias_map a ON f.tag = a.tag
    WHERE f.unit IN ('USD', 'USD/shares')
      AND (f.fiscal_period IS NULL OR f.fiscal_period = 'FY')
      AND f.fiscal_year IS NOT NULL
  ) WHERE rn = 1
  GROUP BY ticker, fiscal_year
)
WHERE (""" + " OR ".join(f"{m} IS NOT NULL" for m in _MATRIX_INCOME) + """)
  AND (""" + " OR ".join(f"{m} IS NOT NULL" for m in _MATRIX_BALANCE) + """)
"""


def q_ratio_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EPS facts carry the XBRL per-share unit, so the unit gate admits
    # both; the 'shares'-unit noise rows stay excluded. Reference keeps a
    # year only when BOTH statements have data (available_years is the
    # intersection, main.py:516-520) and zero-defaults missing inputs.
    facts = _facts(spark, sf_dir).filter(F.col("unit").isin("USD", "USD/shares"))
    facts = filters.annual_only(facts)
    facts = filters.drop_null_keys(facts, ["fiscal_year"])
    alias = domain.alias_df(spark)
    joined = facts.join(F.broadcast(alias), "tag")
    best = keep_first(
        joined,
        ["ticker", "metric", "fiscal_year"],
        [F.col("priority").asc(), F.abs(F.col("value")).desc(), F.col("fact_id").asc()],
    )
    wide = (
        best.groupBy("ticker", "fiscal_year")
        .pivot("metric", _MATRIX_INCOME + _MATRIX_BALANCE)
        .agg(F.first("value"))
    )
    has_income = None
    for m in _MATRIX_INCOME:
        c = F.col(m).isNotNull()
        has_income = c if has_income is None else (has_income | c)
    has_balance = None
    for m in _MATRIX_BALANCE:
        c = F.col(m).isNotNull()
        has_balance = c if has_balance is None else (has_balance | c)
    complete = wide.filter(has_income & has_balance)

    def z(col: str):
        return F.coalesce(F.col(col), F.lit(0.0))

    return complete.select(
        "ticker",
        "fiscal_year",
        (z("revenue") / 1000000.0).alias("revenue_millions"),
        (z("net_income") / 1000000.0).alias("net_income_millions"),
        (z("total_assets") / 1000000.0).alias("total_assets_millions"),
        F.when(F.col("revenue") > 0, z("gross_profit") / F.col("revenue") * 100).alias("gross_margin_pct"),
        F.when(F.col("revenue") > 0, z("operating_income") / F.col("revenue") * 100).alias("operating_margin_pct"),
        F.when(F.col("revenue") > 0, z("net_income") / F.col("revenue") * 100).alias("net_margin_pct"),
        F.when(F.col("total_assets") > 0, z("net_income") / F.col("total_assets") * 100).alias("roa_pct"),
        F.when(F.col("stockholders_equity") > 0, z("net_income") / F.col("stockholders_equity") * 100).alias("roe_pct"),
        F.when(F.col("stockholders_equity") > 0, z("total_liabilities") / F.col("stockholders_equity")).alias("debt_to_equity"),
        z("eps_basic").alias("eps_basic"),
        z("eps_diluted").alias("eps_diluted"),
    )


_FULL_OUTER_ORACLE = domain.duck_prelude(
    _series_cte("revenue", "rev"),
    _series_cte("net_income", "ni"),
) + """
SELECT coalesce(r.ticker, n.ticker) AS ticker,
       coalesce(r.fiscal_year, n.fiscal_year) AS fiscal_year,
       coalesce(r.value, 0.0) AS revenue,
       coalesce(n.value, 0.0) AS net_income
FROM (SELECT * FROM rev WHERE ticker < 'T10') r
FULL OUTER JOIN (SELECT * FROM ni WHERE ticker >= 'T05') n
  ON r.ticker = n.ticker AND r.fiscal_year = n.fiscal_year
"""


def q_full_outer_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = metric_series(spark, sf_dir, "revenue").filter(F.col("ticker") < "T10")
    ni = metric_series(spark, sf_dir, "net_income").filter(
        F.col("ticker") >= "T05"
    )
    keys = ["ticker", "fiscal_year"]
    joined = rev.select(*keys, F.col("value").alias("revenue")).join(
        ni.select(*keys, F.col("value").alias("net_income")), keys, "full_outer"
    )
    return joined.na.fill({"revenue": 0.0, "net_income": 0.0})


# ---------------------------------------------------------------------------
# W3/W5/W6/W7 — trend analytics (YoY, CAGR, volatility, direction)
# ---------------------------------------------------------------------------

_TRENDS_ORACLE = domain.duck_prelude(_series_cte("revenue", "rev")) + """
SELECT ticker,
       round(cagr_pct, 6) AS cagr_pct,
       round(volatility, 6) AS volatility,
       CASE WHEN cagr_pct IS NULL THEN 'unknown'
            WHEN cagr_pct > 1.0 THEN 'increasing'
            WHEN cagr_pct < -1.0 THEN 'decreasing'
            ELSE 'stable' END AS trend
FROM (
  SELECT ticker,
         CASE WHEN min_by(value, fiscal_year) > 0 AND max_by(value, fiscal_year) > 0
                   AND max(fiscal_year) > min(fiscal_year)
              THEN (power(max_by(value, fiscal_year) / min_by(value, fiscal_year),
                          1.0 / (max(fiscal_year) - min(fiscal_year))) - 1.0) * 100
         END AS cagr_pct,
         stddev_samp(yoy) AS volatility
  FROM (
    SELECT ticker, fiscal_year, value,
           CASE WHEN lag(value) OVER w <> 0
                THEN (value / lag(value) OVER w - 1.0) * 100 END AS yoy
    FROM rev
    WINDOW w AS (PARTITION BY ticker ORDER BY fiscal_year)
  )
  GROUP BY ticker
)
"""


def q_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = metric_series(spark, sf_dir, "revenue")
    grown = windows.yoy_growth(
        rev, ["ticker"], "fiscal_year", "value", out_col="yoy"
    )
    agg = windows.cagr(rev, ["ticker"], "fiscal_year", "value")
    vol = grown.groupBy("ticker").agg(F.stddev_samp("yoy").alias("volatility"))
    out = agg.join(vol, "ticker")
    return out.select(
        "ticker",
        F.round(F.col("cagr_pct"), 6).alias("cagr_pct"),
        F.round(F.col("volatility"), 6).alias("volatility"),
        windows.trend_direction(F.col("cagr_pct")).alias("trend"),
    )


# ---------------------------------------------------------------------------
# J1/A10 — broadcast dim join + sector aggregation
# ---------------------------------------------------------------------------


_SECTOR_REVENUE_ORACLE = domain.duck_prelude(_series_cte("revenue", "rev")) + f"""
SELECT c.sector, r.fiscal_year,
       {dsum_sql('r.value')} AS total_revenue,
       count(*) AS n_companies
FROM rev r JOIN companies c ON r.ticker = c.ticker
GROUP BY c.sector, r.fiscal_year
"""


def q_sector_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = metric_series(spark, sf_dir, "revenue")
    companies = domain.companies_df(spark, sf_dir)
    joined = rev.join(F.broadcast(companies.select("ticker", "sector")), "ticker")
    return joined.groupBy("sector", "fiscal_year").agg(
        dsum("value").alias("total_revenue"),
        F.count(F.lit(1)).alias("n_companies"),
    )


# ---------------------------------------------------------------------------
# A7/T1 — freshness watermark
# ---------------------------------------------------------------------------


_TICKER_PROFILE_ORACLE = domain.duck_prelude(_series_cte("revenue", "rev")) + """
SELECT f.ticker, f.latest_date, f.covered_periods, f.n_facts,
       s.latest_value, s.oldest_value, s.latest_year, s.mean_value,
       s.overall_growth_pct
FROM (
  SELECT ticker,
         max(coalesce(end_date, instant_date)) AS latest_date,
         string_agg(DISTINCT CAST(fiscal_year AS STRING), ',' ORDER BY CAST(fiscal_year AS STRING)) AS covered_periods,
         count(*) AS n_facts
  FROM facts
  WHERE fiscal_year IS NOT NULL
  GROUP BY ticker
) f
JOIN (
  SELECT ticker,
         max_by(value, fiscal_year) AS latest_value,
         min_by(value, fiscal_year) AS oldest_value,
         CAST(max(fiscal_year) AS INT) AS latest_year,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS mean_value,
         CASE WHEN min_by(value, fiscal_year) <> 0
              THEN (max_by(value, fiscal_year) / min_by(value, fiscal_year) - 1.0) * 100.0
         END AS overall_growth_pct
  FROM rev
  GROUP BY ticker
) s ON f.ticker = s.ticker
"""


def q_ticker_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.aggregates import (
        freshness_watermark,
    )

    facts = filters.drop_null_keys(_facts(spark, sf_dir), ["fiscal_year"])
    fresh = freshness_watermark(
        facts, ["ticker"], ["end_date", "instant_date"], "fiscal_year"
    )
    series = metric_series(spark, sf_dir, "revenue")
    latest = F.max_by("value", "fiscal_year")
    oldest = F.min_by("value", "fiscal_year")
    stats = series.groupBy("ticker").agg(
        latest.alias("latest_value"),
        oldest.alias("oldest_value"),
        F.max("fiscal_year").cast("int").alias("latest_year"),
        (F.sum(F.col("value").cast("decimal(30,6)")).cast("double") / F.count("value")).alias(
            "mean_value"
        ),
        F.when(oldest != 0, (latest / oldest - 1.0) * 100.0).alias(
            "overall_growth_pct"
        ),
    )
    return fresh.join(stats, "ticker")


# ---------------------------------------------------------------------------
# A9/W8 — latest-value ranking across companies
# ---------------------------------------------------------------------------


_LATEST_RANKING_ORACLE = domain.duck_prelude(_series_cte("revenue", "rev")) + """
SELECT ticker, fiscal_year AS latest_year, value AS latest_revenue,
       CAST(rank() OVER (ORDER BY value DESC, ticker ASC) AS INT) AS revenue_rank
FROM (
  SELECT ticker, fiscal_year, value,
         row_number() OVER (PARTITION BY ticker
                            ORDER BY fiscal_year DESC) AS rn
  FROM rev
) WHERE rn = 1 AND value IS NOT NULL
ORDER BY revenue_rank LIMIT 10
"""


def q_latest_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = metric_series(spark, sf_dir, "revenue")
    latest = windows.latest_per_group(
        rev, ["ticker"], [F.col("fiscal_year").desc()]
    )
    # heap top-k FIRST (TakeOrderedAndProject — no global sort, no
    # single-task window over all tickers). (value desc, ticker) is a
    # total order, so the top-10's ranks equal their global ranks; the
    # rank itself is a preceding-row count over the bounded 10-row
    # winner set (10x10 broadcast), leaving the plan with NO
    # unpartitioned WindowExec anywhere. NULL revenues are excluded
    # up front (matching the oracle): the preceding-count comparison
    # is three-valued, so an admitted NULL row would otherwise count
    # zero predecessors and falsely rank 1.
    top = windows.top_k(
        latest.filter(F.col("value").isNotNull()),
        [F.col("value").desc(), F.col("ticker").asc()],
        10,
    )
    prev = top.select(
        F.col("value").alias("__v2"), F.col("ticker").alias("__t2")
    )
    precedes = (F.col("__v2") > F.col("value")) | (
        (F.col("__v2") == F.col("value")) & (F.col("__t2") < F.col("ticker"))
    )
    return (
        top.join(F.broadcast(prev), precedes, "left")
        .groupBy("ticker", "fiscal_year", "value")
        .agg((F.count("__t2") + 1).cast("int").alias("revenue_rank"))
        .select(
            "ticker",
            F.col("fiscal_year").alias("latest_year"),
            F.col("value").alias("latest_revenue"),
            "revenue_rank",
        )
    )


# ---------------------------------------------------------------------------
# Full statement assembly (income/balance/cashflow) + leverage analytics
# ---------------------------------------------------------------------------

_STATEMENT_OF = """CASE
  WHEN metric IN ('revenue', 'net_income', 'operating_income') THEN 'income'
  WHEN metric IN ('total_assets', 'stockholders_equity', 'total_liabilities') THEN 'balance'
  ELSE 'cashflow' END"""


_FULL_STATEMENTS_ORACLE = (
    domain.duck_prelude()
    + f"""
SELECT ticker, {_STATEMENT_OF} AS statement, metric, fiscal_year, value FROM (
  SELECT f.ticker, a.metric, f.fiscal_year, f.value,
         row_number() OVER (PARTITION BY f.ticker, a.metric, f.fiscal_year
                            ORDER BY a.priority ASC, abs(f.value) DESC,
                                     f.fact_id ASC) AS rn
  FROM facts f
  JOIN alias_map a ON f.tag = a.tag
  WHERE f.unit = 'USD'
    AND (f.fiscal_period IS NULL OR f.fiscal_period = 'FY')
    AND f.fiscal_year IS NOT NULL
) WHERE rn = 1
"""
)


def q_full_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = _facts(spark, sf_dir).filter(F.col("unit") == "USD")
    facts = filters.annual_only(facts)
    facts = filters.drop_null_keys(facts, ["fiscal_year"])
    alias = domain.alias_df(spark)
    joined = facts.join(F.broadcast(alias), "tag")
    best = keep_first(
        joined,
        ["ticker", "metric", "fiscal_year"],
        [F.col("priority").asc(), F.abs(F.col("value")).desc(), F.col("fact_id").asc()],
    )
    statement = (
        F.when(
            F.col("metric").isin("revenue", "net_income", "operating_income"),
            "income",
        )
        .when(
            F.col("metric").isin(
                "total_assets", "stockholders_equity", "total_liabilities"
            ),
            "balance",
        )
        .otherwise("cashflow")
    )
    return best.select(
        "ticker", statement.alias("statement"), "metric", "fiscal_year", "value"
    )


_LEVERAGE_BUCKETS_ORACLE = (
    domain.duck_prelude(
        _series_cte("net_income", "ni"),
        _series_cte("stockholders_equity", "eq"),
        _series_cte("total_liabilities", "liab"),
    )
    + """
SELECT n.ticker, n.fiscal_year,
       CASE WHEN e.value <> 0 THEN n.value / e.value * 100 END AS roe_pct,
       CASE WHEN e.value <> 0 THEN l.value / e.value END AS debt_to_equity,
       CASE WHEN e.value = 0 THEN 'unknown'
            WHEN l.value / e.value < 1.0 THEN 'conservative'
            WHEN l.value / e.value < 2.0 THEN 'moderate'
            ELSE 'leveraged' END AS leverage_bucket
FROM ni n
JOIN eq e ON n.ticker = e.ticker AND n.fiscal_year = e.fiscal_year
JOIN liab l ON n.ticker = l.ticker AND n.fiscal_year = l.fiscal_year
"""
)


def q_leverage_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = ["ticker", "fiscal_year"]
    ni = metric_series(spark, sf_dir, "net_income").select(
        *keys, F.col("value").alias("ni")
    )
    eq = metric_series(spark, sf_dir, "stockholders_equity").select(
        *keys, F.col("value").alias("eq")
    )
    liab = metric_series(spark, sf_dir, "total_liabilities").select(
        *keys, F.col("value").alias("liab")
    )
    joined = ni.join(eq, keys).join(liab, keys)
    d2e = safe_div(F.col("liab"), F.col("eq"))
    bucket = (
        F.when(F.col("eq") == 0, "unknown")
        .when(F.col("liab") / F.col("eq") < 1.0, "conservative")
        .when(F.col("liab") / F.col("eq") < 2.0, "moderate")
        .otherwise("leveraged")
    )
    return joined.select(
        "ticker",
        "fiscal_year",
        (safe_div(F.col("ni"), F.col("eq")) * 100).alias("roe_pct"),
        d2e.alias("debt_to_equity"),
        bucket.alias("leverage_bucket"),
    )


# ---------------------------------------------------------------------------
# W4 — QoQ growth over the quarterly serving path
# ---------------------------------------------------------------------------


_QOQ_GROWTH_ORACLE = (
    domain.duck_prelude(
        """q AS (
  SELECT ticker, fiscal_year, fiscal_period, tag, value FROM (
    SELECT f.ticker, f.fiscal_year, f.fiscal_period, f.tag, f.value,
           row_number() OVER (PARTITION BY f.ticker, f.fiscal_year, f.fiscal_period
                              ORDER BY a.priority ASC, abs(f.value) DESC,
                                       f.fact_id ASC) AS rn
    FROM facts f
    JOIN alias_map a ON f.tag = a.tag AND a.metric = 'revenue'
    WHERE f.unit = 'USD'
      AND starts_with(coalesce(f.fiscal_period, ''), 'Q')
      AND f.fiscal_year IS NOT NULL
  ) WHERE rn = 1
)"""
    )
    + """
SELECT ticker, fiscal_year, fiscal_period, tag, value,
       round(CASE WHEN lag(value) OVER w <> 0
                  THEN (value / lag(value) OVER w - 1.0) * 100 END, 6) AS qoq_pct
FROM q
WINDOW w AS (PARTITION BY ticker ORDER BY fiscal_year, fiscal_period)
"""
)


def q_qoq_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = _facts(spark, sf_dir).filter(F.col("unit") == "USD")
    facts = filters.quarterly_only(facts)
    facts = filters.drop_null_keys(facts, ["fiscal_year"])
    alias = domain.alias_df(spark).filter(F.col("metric") == "revenue")
    joined = facts.join(F.broadcast(alias), "tag")
    quarterly = keep_first(
        joined,
        ["ticker", "fiscal_year", "fiscal_period"],
        [F.col("priority").asc(), F.abs(F.col("value")).desc(), F.col("fact_id").asc()],
    ).select("ticker", "fiscal_year", "fiscal_period", "tag", "value")
    w = Window.partitionBy("ticker").orderBy("fiscal_year", "fiscal_period")
    prev = F.lag("value").over(w)
    return quarterly.select(
        "ticker",
        "fiscal_year",
        "fiscal_period",
        "tag",
        "value",
        F.round(
            F.when(prev != 0, (F.col("value") / prev - 1.0) * 100.0), 6
        ).alias("qoq_pct"),
    )


# ---------------------------------------------------------------------------
# The quarterly SERVING shape (reference get_quarterly_data main.py:568-628
# on the data_service.py:170-186 path): per (ticker, metric), quarterly
# facts deduped per (fy, fp) by argmax-abs, sorted (fy, fp) DESC, clipped
# to years*4 rows after a min-year gate. sec_qoq_growth covers the
# quarterly math; this covers the limit-per-quarter serving contract.
# ---------------------------------------------------------------------------

_QUARTERLY_METRICS = ["revenue", "net_income", "eps_diluted", "operating_income"]
_QUARTERLY_YEARS = 2
_QUARTERLY_MIN_YEAR = 1997  # fixed "as of 1998" anchor for the synthetic corpus

_QUARTERLY_ORACLE = domain.duck_prelude(
    f"""q AS (
  SELECT ticker, metric, fiscal_year, fiscal_period, end_date, value FROM (
    SELECT f.ticker, a.metric, f.fiscal_year, f.fiscal_period, f.end_date, f.value,
           row_number() OVER (PARTITION BY f.ticker, a.metric, f.fiscal_year, f.fiscal_period
                              ORDER BY a.priority ASC, abs(f.value) DESC,
                                       f.fact_id ASC) AS rn
    FROM facts f
    JOIN alias_map a ON f.tag = a.tag
      AND a.metric IN ({", ".join(f"'{m}'" for m in _QUARTERLY_METRICS)})
    WHERE f.unit IN ('USD', 'USD/shares')
      AND starts_with(coalesce(f.fiscal_period, ''), 'Q')
      AND f.fiscal_year IS NOT NULL
      AND f.fiscal_year >= {_QUARTERLY_MIN_YEAR}
  ) WHERE rn = 1
)"""
) + f"""
SELECT ticker, metric, fiscal_year, fiscal_period, end_date, value FROM (
  SELECT ticker, metric, fiscal_year, fiscal_period, end_date, value,
         row_number() OVER (PARTITION BY ticker, metric
                            ORDER BY fiscal_year DESC, fiscal_period DESC) AS rn
  FROM q
) WHERE rn <= {_QUARTERLY_YEARS * 4}
"""


def q_quarterly_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = _facts(spark, sf_dir).filter(F.col("unit").isin("USD", "USD/shares"))
    facts = filters.quarterly_only(facts)
    facts = filters.drop_null_keys(facts, ["fiscal_year"])
    facts = facts.filter(F.col("fiscal_year") >= _QUARTERLY_MIN_YEAR)
    alias = domain.alias_df(spark).filter(F.col("metric").isin(_QUARTERLY_METRICS))
    joined = facts.join(F.broadcast(alias), "tag")
    best = keep_first(
        joined,
        ["ticker", "metric", "fiscal_year", "fiscal_period"],
        [F.col("priority").asc(), F.abs(F.col("value")).desc(), F.col("fact_id").asc()],
    ).select("ticker", "metric", "fiscal_year", "fiscal_period", "end_date", "value")
    # Q1<..<Q4 sorts lexicographically, so (fy, fp) DESC is the serving
    # order; the limit is a per-(ticker, metric) group limit — Spark
    # rewrites rank<=k into WindowGroupLimit (rank pushdown), so only k
    # rows per group survive the sort, not the whole series.
    w = Window.partitionBy("ticker", "metric").orderBy(
        F.col("fiscal_year").desc(), F.col("fiscal_period").desc()
    )
    return (
        best.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _QUARTERLY_YEARS * 4)
        .select("ticker", "metric", "fiscal_year", "fiscal_period", "end_date", "value")
    )


# ---------------------------------------------------------------------------
# Consolidated registrations. The driver hard-checks the first 50 sorted
# registry names, so the 18 SEC-domain queries above are served as 7
# section-tagged unions (the round-2 consolidation pattern): every
# constituent's exact result set survives under its own section tag,
# NULL-padded to a shared superset schema. Each constituent keeps its own
# standalone function + oracle above, so nothing about the per-operator
# semantics is weakened — the merged oracle is the UNION ALL of the
# constituents' full oracles as derived tables.
# ---------------------------------------------------------------------------

from sec_financial_pipeline_spark.registry.merge import (  # noqa: E402
    union_sections,
    union_sections_sql,
)

_SERVING_SCHEMA = [
    ("policy", "string"),
    ("ticker", "string"),
    ("fiscal_year", "int"),
    ("tag", "string"),
    ("unit", "string"),
    ("semantics", "string"),
    ("n_facts", "bigint"),
    ("value", "double"),
]

_SERVING_PARTS_SQL = [
    ("metric_series", _METRIC_SERIES_ORACLE,
     ["policy", "ticker", "fiscal_year", "tag", "value"]),
    ("metric_topk", _METRIC_TOPK_ORACLE,
     ["ticker", "fiscal_year", "tag", "value"]),
    ("unit_preference", _UNIT_PREFERENCE_ORACLE,
     ["ticker", "fiscal_year", "unit", "value"]),
    ("period_semantics", _PERIOD_SEMANTICS_ORACLE, ["semantics", "n_facts"]),
]


@register(
    "sec_serving_series",
    union_sections_sql(_SERVING_PARTS_SQL, _SERVING_SCHEMA),
    survey="§3.1 F1 F2 F3 F5 F6 J6 A2 A3 W1 W2 (serving series both dedup policies; year-range top-k; unit preference; both period-predicate semantics)",
)
def q_serving_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_sections(
        [
            ("metric_series", q_metric_series(spark, sf_dir)),
            ("metric_topk", q_metric_topk(spark, sf_dir)),
            ("unit_preference", q_unit_preference(spark, sf_dir)),
            ("period_semantics", q_period_semantics(spark, sf_dir)),
        ],
        _SERVING_SCHEMA,
    )


_PIVOT_SCHEMA = (
    [("ticker", "string"), ("metric", "string"), ("fiscal_year", "int")]
    + [(f"y{y}", "double") for y in _YEARS]
    + [(t, "double") for t in _COMPARISON_TICKERS]
)

_PIVOT_PARTS_SQL = [
    ("statement_pivot", _STATEMENT_PIVOT_ORACLE,
     ["ticker", "metric"] + [f"y{y}" for y in _YEARS]),
    ("comparison_pivot", _COMPARISON_PIVOT_ORACLE,
     ["fiscal_year"] + _COMPARISON_TICKERS),
]


@register(
    "sec_pivot_suite",
    union_sections_sql(_PIVOT_PARTS_SQL, _PIVOT_SCHEMA),
    survey="A4 J5 (long->wide statement pivot metric x year; multi-company year x ticker comparison pivot)",
)
def q_pivot_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_sections(
        [
            ("statement_pivot", q_statement_pivot(spark, sf_dir)),
            ("comparison_pivot", q_comparison_pivot(spark, sf_dir)),
        ],
        _PIVOT_SCHEMA,
    )


_RATIO_SCHEMA = [
    ("ticker", "string"),
    ("fiscal_year", "int"),
    ("revenue", "double"),
    ("net_income", "double"),
    ("total_assets", "double"),
    ("net_margin_pct", "double"),
    ("roa_pct", "double"),
    ("revenue_millions", "double"),
    ("net_income_millions", "double"),
    ("total_assets_millions", "double"),
    ("gross_margin_pct", "double"),
    ("operating_margin_pct", "double"),
    ("roe_pct", "double"),
    ("debt_to_equity", "double"),
    ("eps_basic", "double"),
    ("eps_diluted", "double"),
    ("leverage_bucket", "string"),
]

_RATIO_PARTS_SQL = [
    ("ratios_join", _RATIOS_ORACLE,
     ["ticker", "fiscal_year", "revenue", "net_income", "total_assets",
      "net_margin_pct", "roa_pct"]),
    ("ratio_matrix", _RATIO_MATRIX_ORACLE,
     ["ticker", "fiscal_year", "revenue_millions", "net_income_millions",
      "total_assets_millions", "gross_margin_pct", "operating_margin_pct",
      "net_margin_pct", "roa_pct", "roe_pct", "debt_to_equity",
      "eps_basic", "eps_diluted"]),
    ("leverage_buckets", _LEVERAGE_BUCKETS_ORACLE,
     ["ticker", "fiscal_year", "roe_pct", "debt_to_equity",
      "leverage_bucket"]),
]


@register(
    "sec_ratio_suite",
    union_sections_sql(_RATIO_PARTS_SQL, _RATIO_SCHEMA),
    survey="J2 J4 C3 C6 (income⨝balance ratio join; full reference ratio matrix main.py:490-565; ROE/debt-to-equity leverage buckets server.py:551)",
)
def q_ratio_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_sections(
        [
            ("ratios_join", q_ratios_join(spark, sf_dir)),
            ("ratio_matrix", q_ratio_matrix(spark, sf_dir)),
            ("leverage_buckets", q_leverage_buckets(spark, sf_dir)),
        ],
        _RATIO_SCHEMA,
    )


_QUARTERLY_SCHEMA = [
    ("ticker", "string"),
    ("metric", "string"),
    ("fiscal_year", "int"),
    ("fiscal_period", "string"),
    ("tag", "string"),
    ("end_date", "date"),
    ("value", "double"),
    ("qoq_pct", "double"),
]

_QUARTERLY_PARTS_SQL = [
    ("qoq_growth", _QOQ_GROWTH_ORACLE,
     ["ticker", "fiscal_year", "fiscal_period", "tag", "value", "qoq_pct"]),
    ("quarterly_serving", _QUARTERLY_ORACLE,
     ["ticker", "metric", "fiscal_year", "fiscal_period", "end_date",
      "value"]),
]


@register(
    "sec_quarterly_suite",
    union_sections_sql(_QUARTERLY_PARTS_SQL, _QUARTERLY_SCHEMA),
    survey="F1-quarterly A2 W4 §3.1-quarterly (QoQ pct_change; quarterly serving shape with per-(ticker,metric) dedup, (fy,fp)-desc order, years*4 limit; main.py:568-628)",
)
def q_quarterly_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_sections(
        [
            ("qoq_growth", q_qoq_growth(spark, sf_dir)),
            ("quarterly_serving", q_quarterly_serving(spark, sf_dir)),
        ],
        _QUARTERLY_SCHEMA,
    )


_ANALYTICS_SCHEMA = [
    ("ticker", "string"),
    ("sector", "string"),
    ("fiscal_year", "int"),
    ("latest_date", "date"),
    ("covered_periods", "string"),
    ("n_facts", "bigint"),
    ("latest_value", "double"),
    ("oldest_value", "double"),
    ("latest_year", "int"),
    ("mean_value", "double"),
    ("overall_growth_pct", "double"),
    ("latest_revenue", "double"),
    ("revenue_rank", "int"),
    ("total_revenue", "double"),
    ("n_companies", "bigint"),
    ("cagr_pct", "double"),
    ("volatility", "double"),
    ("trend", "string"),
]

_ANALYTICS_PARTS_SQL = [
    ("ticker_profile", _TICKER_PROFILE_ORACLE,
     ["ticker", "latest_date", "covered_periods", "n_facts", "latest_value",
      "oldest_value", "latest_year", "mean_value", "overall_growth_pct"]),
    ("latest_ranking", _LATEST_RANKING_ORACLE,
     ["ticker", "latest_year", "latest_revenue", "revenue_rank"]),
    ("sector_revenue", _SECTOR_REVENUE_ORACLE,
     ["sector", "fiscal_year", "total_revenue", "n_companies"]),
    ("trends", _TRENDS_ORACLE,
     ["ticker", "cagr_pct", "volatility", "trend"]),
]


@register(
    "sec_ticker_analytics",
    union_sections_sql(_ANALYTICS_PARTS_SQL, _ANALYTICS_SCHEMA),
    survey="A7 T1 A8 A9 A10 W3 W5 W6 W7 W8 J1 (freshness watermark profile server.py:306-319; latest-value ranking; broadcast sector rollup; YoY/CAGR/volatility/trend)",
)
def q_ticker_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_sections(
        [
            ("ticker_profile", q_ticker_profile(spark, sf_dir)),
            ("latest_ranking", q_latest_ranking(spark, sf_dir)),
            ("sector_revenue", q_sector_revenue(spark, sf_dir)),
            ("trends", q_trends(spark, sf_dir)),
        ],
        _ANALYTICS_SCHEMA,
    )


_ASSEMBLY_SCHEMA = [
    ("ticker", "string"),
    ("statement", "string"),
    ("metric", "string"),
    ("fiscal_year", "int"),
    ("value", "double"),
    ("revenue", "double"),
    ("net_income", "double"),
]

_ASSEMBLY_PARTS_SQL = [
    ("full_statements", _FULL_STATEMENTS_ORACLE,
     ["ticker", "statement", "metric", "fiscal_year", "value"]),
    ("full_outer_fill", _FULL_OUTER_ORACLE,
     ["ticker", "fiscal_year", "revenue", "net_income"]),
]


@register(
    "sec_statement_assembly",
    union_sections_sql(_ASSEMBLY_PARTS_SQL, _ASSEMBLY_SCHEMA),
    survey="§3.3 A4 J3 A11 (all-statement assembly via one dedup window; full-outer year alignment with zero-fill)",
)
def q_statement_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_sections(
        [
            ("full_statements", q_full_statements(spark, sf_dir)),
            ("full_outer_fill", q_full_outer_fill(spark, sf_dir)),
        ],
        _ASSEMBLY_SCHEMA,
    )
