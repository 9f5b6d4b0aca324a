"""SEC-shaped domain model derived deterministically from the driver tables.

The correctness gate runs on the driver's TPC-H-ish parquet (TESTDATA.md),
but the reference's interesting semantics live on its *fact table* (tag
coalescing, restatement dedup, annual/quarterly period predicates, trend
windows — SURVEY §1/§2). Bridge: derive a faithful long-format ``facts``
table (plus ``companies`` dim and the metric alias map) from ``orders`` /
``customer`` with pure deterministic SQL that parses identically under
Spark SQL and DuckDB. The Spark engine consumes the derived DataFrame
through the real operator library; the oracle consumes the same text as a
CTE — so every SEC-specific operator is end-to-end checkable.

Shape of the derived facts (mirrors FACTS_SCHEMA / reference
``src/core/models.py:33-52``):

- 25 synthetic tickers ``T00..T24`` from ``o_custkey % 25``;
- ten metrics per order — a revenue fact whose XBRL tag rotates through
  the reference's revenue fallback family (``main.py:165-180``), the
  income-statement family (net income, operating income, gross profit,
  EPS basic/diluted in ``USD/shares``), the balance-sheet instants
  (assets, equity, liabilities), and operating cash flow — the full
  input surface of ``calculate_financial_ratios`` (``main.py:490-565``);
- ~10% duplicated (ticker, tag, fy, fp) keys via amended-filing rows
  (form ``10-K/A``, value * 1.05) so both dedup policies are observable;
- NULL fiscal periods, ``FY`` vs ``Q1..Q4`` mix, ``shares``-unit noise,
  and negative values, per FIXTURES.md §B1.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from sec_financial_pipeline_spark.sources.testdata import register_views

# Shared SQL (valid in both Spark SQL and DuckDB).
FACTS_SQL = """
SELECT
  'T' || lpad(CAST(o_custkey % 25 AS STRING), 2, '0')        AS ticker,
  lpad(CAST(9000000 + o_custkey % 25 AS STRING), 10, '0')    AS cik,
  'us-gaap'                                                  AS taxonomy,
  CASE
    WHEN m.mi = 1 THEN 'NetIncomeLoss'
    WHEN m.mi = 2 THEN 'Assets'
    WHEN m.mi = 4 THEN 'OperatingIncomeLoss'
    WHEN m.mi = 5 THEN 'StockholdersEquity'
    WHEN m.mi = 6 THEN 'NetCashProvidedByUsedInOperatingActivities'
    WHEN m.mi = 7 THEN 'Liabilities'
    WHEN m.mi = 8 THEN 'GrossProfit'
    WHEN m.mi = 9 THEN 'EarningsPerShareBasic'
    WHEN m.mi = 10 THEN 'EarningsPerShareDiluted'
    WHEN o_orderkey % 11 = 0 THEN 'SalesRevenueNet'
    WHEN o_orderkey % 11 < 6 THEN 'Revenues'
    ELSE 'RevenueFromContractWithCustomerExcludingAssessedTax'
  END                                                        AS tag,
  CASE
    WHEN m.mi = 1 THEN 'Net Income (Loss) Attributable to Parent'
    WHEN m.mi = 2 THEN 'Assets, Total'
    WHEN m.mi = 4 THEN 'Operating Income (Loss)'
    WHEN m.mi = 5 THEN 'Stockholders'' Equity Attributable to Parent'
    WHEN m.mi = 6 THEN 'Net Cash Provided by (Used in) Operating Activities'
    WHEN m.mi = 7 THEN 'Liabilities, Total'
    WHEN m.mi = 8 THEN 'Gross Profit'
    WHEN m.mi = 9 THEN 'Earnings Per Share, Basic'
    WHEN m.mi = 10 THEN 'Earnings Per Share, Diluted'
    ELSE 'Revenues, Total'
  END                                                        AS label,
  CAST(
    CASE
      WHEN m.mi = 1 THEN o_totalprice * (CASE WHEN o_orderkey % 13 = 0 THEN -0.08 ELSE 0.08 END)
      WHEN m.mi = 2 THEN o_totalprice * 5.0
      WHEN m.mi = 3 THEN o_totalprice * 1.05
      WHEN m.mi = 4 THEN o_totalprice * 0.15
      WHEN m.mi = 5 THEN o_totalprice * 2.0
      WHEN m.mi = 6 THEN o_totalprice * 0.12
      WHEN m.mi = 7 THEN o_totalprice * 3.0
      WHEN m.mi = 8 THEN o_totalprice * 0.35
      WHEN m.mi = 9 THEN o_totalprice * 0.000002
      WHEN m.mi = 10 THEN o_totalprice * 0.0000018
      ELSE o_totalprice
    END AS DOUBLE)                                           AS value,
  CASE
    WHEN m.mi IN (9, 10) THEN 'USD/shares'
    WHEN m.mi = 0 AND o_orderkey % 17 = 0 THEN 'shares'
    ELSE 'USD'
  END                                                        AS unit,
  CAST(year(o_orderdate) AS INT)                             AS fiscal_year,
  CASE
    WHEN o_orderkey % 7 = 0 THEN CAST(NULL AS STRING)
    WHEN o_orderkey % 3 = 0 THEN 'FY'
    ELSE 'Q' || CAST(quarter(o_orderdate) AS STRING)
  END                                                        AS fiscal_period,
  CASE
    WHEN m.mi = 3 THEN '10-K/A'
    WHEN o_orderkey % 7 = 0 THEN '8-K'
    WHEN o_orderkey % 3 = 0 THEN '10-K'
    ELSE '10-Q'
  END                                                        AS form,
  CASE WHEN m.mi IN (2, 5, 7) THEN CAST(NULL AS DATE) ELSE CAST(o_orderdate AS DATE) END AS end_date,
  CASE WHEN m.mi IN (2, 5, 7) THEN CAST(o_orderdate AS DATE) ELSE CAST(NULL AS DATE) END AS instant_date,
  o_orderkey * 16 + m.mi                                     AS fact_id
FROM orders
CROSS JOIN (SELECT * FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8), (9), (10)) AS v(mi)) AS m
WHERE m.mi <> 3 OR o_orderkey % 10 = 0
"""

COMPANIES_SQL = """
SELECT
  'T' || lpad(CAST(k AS STRING), 2, '0')                     AS ticker,
  lpad(CAST(9000000 + k AS STRING), 10, '0')                 AS cik,
  'Synthetic Co ' || CAST(k AS STRING)                       AS name,
  'SECTOR_' || CAST(k % 4 AS STRING)                         AS sector
FROM (SELECT DISTINCT o_custkey % 25 AS k FROM orders) AS t
"""

#: Reference revenue fallback family in priority order (``main.py:165-180``)
#: plus the other two derived metrics.
ALIAS_SQL = """
SELECT * FROM (VALUES
  ('revenue', 'RevenueFromContractWithCustomerExcludingAssessedTax', 0),
  ('revenue', 'Revenues', 1),
  ('revenue', 'SalesRevenueNet', 2),
  ('net_income', 'NetIncomeLoss', 0),
  ('total_assets', 'Assets', 0),
  ('operating_income', 'OperatingIncomeLoss', 0),
  ('stockholders_equity', 'StockholdersEquity', 0),
  ('operating_cash_flow', 'NetCashProvidedByUsedInOperatingActivities', 0),
  ('total_liabilities', 'Liabilities', 0),
  ('gross_profit', 'GrossProfit', 0),
  ('eps_basic', 'EarningsPerShareBasic', 0),
  ('eps_diluted', 'EarningsPerShareDiluted', 0)
) AS a(metric, tag, priority)
"""


#: Memoized derived DataFrames keyed by (session, sf_dir): DataFrames are
#: immutable lazy plans, so reusing them skips repeated parquet listing /
#: view registration / SQL analysis when many registry queries run in one
#: session (the driver's correctness sweep and bench both do).
_memo: dict[tuple[int, str, str], DataFrame] = {}


def _cached(
    spark: SparkSession, sf_dir: str, kind: str, sql: str, spread: bool = True
) -> DataFrame:
    key = (id(spark), sf_dir, kind, spread)
    if key not in _memo:
        register_views(spark, sf_dir)
        # r14 (guide §2.5): the facts derivation fans every orders row
        # out 11 ways through wide CASE/string projections, and the
        # single-row-group orders file scans as ONE split — so the
        # whole 1.6M-row build ran serial (measured 2.45s noop at
        # sf0.1/32 cores; 0.97s with the scan spread). The Spark side
        # reads the shared SQL against a scale-adaptively widened
        # orders view; the oracle text is untouched and the rows are
        # identical by construction (spread_scan is a deterministic
        # round-robin repartition, a no-op at real multi-file scale).
        # ``spread=False`` keeps the direct scan for consumers whose
        # plan prunes the fan-out to a narrow metric slice — there the
        # exchange toll exceeds the serial-derive cost (measured:
        # sec_metric_series 0.80s direct vs 1.07s spread, sec_trends
        # 0.98 vs 1.10; but sec_full_statements 1.53 direct vs 0.74
        # spread — hence per-consumer, not global).
        from sec_financial_pipeline_spark.sources.testdata import (
            load_table,
            spread_scan,
        )

        orders = load_table(spark, sf_dir, "orders")
        if spread:
            view = "orders_spread"
            spread_scan(orders).createOrReplaceTempView(view)
        else:
            view = "orders_direct"
            orders.createOrReplaceTempView(view)
        # word-boundary rewrite (NOT a plain substring replace): the
        # shared SQL must keep parsing identically under DuckDB, so the
        # Spark side redirects the table reference only where `orders`
        # is the whole identifier — a future query text containing e.g.
        # `FROM orders_x` must not be corrupted.
        _memo[key] = spark.sql(
            re.sub(r"\bFROM orders\b", f"FROM {view}", sql)
        )
    return _memo[key]


def facts_df(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    return _cached(spark, sf_dir, "facts", FACTS_SQL, spread=spread)


def companies_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached(spark, sf_dir, "companies", COMPANIES_SQL)


def alias_df(spark: SparkSession) -> DataFrame:
    return spark.sql(ALIAS_SQL)


def duck_prelude(*extra: str) -> str:
    """Oracle-side CTE prelude: ``WITH facts AS (...), companies AS (...),
    alias_map AS (...)`` plus any extra named CTEs (``"name AS (...)"``)."""
    ctes = [
        f"facts AS ({FACTS_SQL})",
        f"companies AS ({COMPANIES_SQL})",
        f"alias_map AS ({ALIAS_SQL})",
        *extra,
    ]
    return "WITH " + ",\n".join(ctes) + "\n"
