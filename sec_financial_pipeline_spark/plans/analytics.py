"""Analytics layer over the canonical facts table (SURVEY §3.3, §2.4-2.5).

The user-facing API of the reference's analyzers and MCP tools
(``main.py``, ``financial_analyzer.py``, ``src/sec_mcp/server.py``)
re-expressed as DataFrame->DataFrame plans over FACTS_SCHEMA + the
metric alias map. Every function here is a composition of the operator
library; the registry's ``sec_*`` queries pin their semantics against
the DuckDB oracle on the derived-domain facts.

The dedup policy is explicit everywhere (argmax-abs by default — the
serving-path semantics, ``data_service.py:167``), as is the annual
predicate (service semantics: fp IS NULL OR fp = 'FY').
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.functions.scalar import safe_div
from sec_financial_pipeline_spark.operators import filters, windows
from sec_financial_pipeline_spark.operators.dedup import keep_first


def metric_series(
    facts: DataFrame,
    alias_map: DataFrame,
    metric: str,
    annual: bool = True,
    dedup: str = "argmax_abs",
    unit: str = "USD",
) -> DataFrame:
    """§3.1 — one metric's per-(ticker, fiscal_year) series with tag
    coalescing (F5) and the chosen dedup policy (A2/A3)."""
    f = facts.filter(F.col("unit") == unit)
    f = filters.annual_only(f) if annual else filters.quarterly_only(f)
    f = filters.drop_null_keys(f, ["fiscal_year"])
    alias = alias_map.filter(F.col("metric") == metric)
    joined = f.join(F.broadcast(alias), "tag")
    # fact_id is the final tie-break: (priority, |value|, end_date) is not
    # a total order (same-magnitude or same-date duplicate facts tie), and
    # a non-total order makes the kept row partition-placement-dependent.
    if dedup == "argmax_abs":
        order = [
            F.col("priority").asc(),
            F.abs(F.col("value")).desc(),
            F.col("end_date").desc_nulls_last(),
            F.col("fact_id").asc(),
        ]
    else:
        order = [
            F.col("priority").asc(),
            F.col("end_date").desc_nulls_last(),
            F.col("fact_id").desc(),
        ]
    best = keep_first(joined, ["ticker", "fiscal_year"], order)
    return best.select(
        "ticker", "fiscal_year", "tag", F.col("value"), F.lit(metric).alias("metric")
    )


def statement(
    facts: DataFrame,
    alias_map: DataFrame,
    metrics: Sequence[str],
    years: Sequence[int],
    annual: bool = True,
) -> DataFrame:
    """A4 — wide statement: one row per (ticker, metric), year columns.
    Explicit year list keeps the pivot bounded (no discovery scan)."""
    long = None
    for m in metrics:
        s = metric_series(facts, alias_map, m, annual=annual)
        long = s if long is None else long.unionByName(s)
    wide = (
        long.groupBy("ticker", "metric")
        .pivot("fiscal_year", [str(y) for y in years])
        .agg(F.first("value"))
    )
    for y in years:
        wide = wide.withColumnRenamed(str(y), f"y{y}")
    return wide


def ratios(facts: DataFrame, alias_map: DataFrame) -> DataFrame:
    """J2 + C3 — margin/ROA table from revenue ⨝ net_income ⨝ assets."""
    keys = ["ticker", "fiscal_year"]
    rev = metric_series(facts, alias_map, "revenue").select(
        *keys, F.col("value").alias("revenue")
    )
    ni = metric_series(facts, alias_map, "net_income").select(
        *keys, F.col("value").alias("net_income")
    )
    assets = metric_series(facts, alias_map, "total_assets").select(
        *keys, F.col("value").alias("total_assets")
    )
    joined = rev.join(ni, keys).join(assets, keys)
    return joined.select(
        *keys,
        "revenue",
        "net_income",
        "total_assets",
        (safe_div(F.col("net_income"), F.col("revenue")) * 100).alias("net_margin_pct"),
        (safe_div(F.col("net_income"), F.col("total_assets")) * 100).alias("roa_pct"),
    )


def trends(facts: DataFrame, alias_map: DataFrame, metric: str) -> DataFrame:
    """W3/W5/W6/W7 — per-ticker CAGR, volatility, trend direction."""
    series = metric_series(facts, alias_map, metric)
    grown = windows.yoy_growth(series, ["ticker"], "fiscal_year", "value", "yoy")
    agg = windows.cagr(series, ["ticker"], "fiscal_year", "value")
    vol = grown.groupBy("ticker").agg(F.stddev_samp("yoy").alias("volatility"))
    return agg.join(vol, "ticker").select(
        "ticker",
        "first_value",
        "last_value",
        "n_periods",
        "cagr_pct",
        "volatility",
        windows.trend_direction(F.col("cagr_pct")).alias("trend"),
    )


def compare_companies(
    facts: DataFrame,
    alias_map: DataFrame,
    metric: str,
    tickers: Sequence[str],
) -> DataFrame:
    """J5 + A9 — year x ticker alignment plus latest-value ranking."""
    series = metric_series(facts, alias_map, metric).filter(
        F.col("ticker").isin(list(tickers))
    )
    return (
        series.groupBy("fiscal_year")
        .pivot("ticker", list(tickers))
        .agg(F.first("value"))
    )


def summary_stats(facts: DataFrame, alias_map: DataFrame, metric: str) -> DataFrame:
    """A8 — per-ticker latest/oldest/mean/overall-growth of a metric
    (reference ``server.py:306-319``)."""
    series = metric_series(facts, alias_map, metric)
    latest = F.max_by("value", "fiscal_year")
    oldest = F.min_by("value", "fiscal_year")
    return series.groupBy("ticker").agg(
        latest.alias("latest_value"),
        oldest.alias("oldest_value"),
        F.max("fiscal_year").alias("latest_year"),
        (F.sum(F.col("value").cast("decimal(30,6)")).cast("double") / F.count("value")).alias("mean_value"),
        F.when(oldest != 0, (latest / oldest - 1.0) * 100.0).alias("overall_growth_pct"),
    )
