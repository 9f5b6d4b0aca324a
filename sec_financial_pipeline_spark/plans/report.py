"""Comprehensive report assembly (SURVEY §3.3; reference
``src/sec_mcp/server.py:441-619`` builds multi-metric company reports by
fanning out per-metric queries then formatting driver-side).

Engine work stays in DataFrames (one fused pass per section); only the
final per-ticker dict assembly — a bounded, human-facing artifact — runs
on the driver, mirroring where the reference's MCP layer sits.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.plans import analytics


def company_report(
    facts: DataFrame,
    alias_map: DataFrame,
    ticker: str,
    metrics: tuple[str, ...] = ("revenue", "net_income"),
) -> dict[str, Any]:
    """One company's report: latest ratios, per-metric trend stats, and
    the year-by-year series — the reference's report sections
    (``server.py:499-619``) from the analytics layer."""
    t = ticker.upper()
    out: dict[str, Any] = {"ticker": t, "metrics": {}}

    ratios = (
        analytics.ratios(facts, alias_map)
        .filter(F.col("ticker") == t)
        .orderBy(F.col("fiscal_year").desc())
        .limit(1)
        .collect()
    )
    if ratios:
        r = ratios[0]
        out["latest_ratios"] = {
            "fiscal_year": r.fiscal_year,
            "net_margin_pct": r.net_margin_pct,
            "roa_pct": r.roa_pct,
        }

    for metric in metrics:
        trend = (
            analytics.trends(facts, alias_map, metric)
            .filter(F.col("ticker") == t)
            .collect()
        )
        series = (
            analytics.metric_series(facts, alias_map, metric)
            .filter(F.col("ticker") == t)
            .orderBy(F.col("fiscal_year").desc())
            .collect()
        )
        section: dict[str, Any] = {
            "series": {r.fiscal_year: r.value for r in series},
        }
        if trend:
            tr = trend[0]
            section.update(
                {
                    "cagr_pct": tr.cagr_pct,
                    "volatility": tr.volatility,
                    "trend": tr.trend,
                }
            )
        out["metrics"][metric] = section
    return out


# ---------------------------------------------------------------------------
# Report variants (reference ``server.py:557-619``): summary / growth /
# profitability. Same engine-side discipline as company_report — one
# fused DataFrame plan per section, bounded driver assembly at the edge.
# ---------------------------------------------------------------------------

_SUMMARY_METRICS = ("revenue", "net_income", "total_assets")
_GROWTH_METRICS = ("revenue", "net_income", "total_assets")
_PROFIT_METRICS = ("revenue", "net_income", "operating_income")


def summary_report(
    facts: DataFrame, alias_map: DataFrame, ticker: str
) -> dict[str, Any]:
    """Latest value of each key metric (``server.py:557-580``) — ONE
    fused plan: the three series union into a single latest-per-metric
    window, not three sequential jobs."""
    from sec_financial_pipeline_spark.operators.windows import latest_per_group

    t = ticker.upper()
    long = None
    for m in _SUMMARY_METRICS:
        s = analytics.metric_series(facts, alias_map, m).filter(F.col("ticker") == t)
        long = s if long is None else long.unionByName(s)
    latest = latest_per_group(
        long, ["metric"], [F.col("fiscal_year").desc()]
    ).collect()
    by_metric = {r.metric: r for r in latest}
    return {
        "report_type": "summary",
        "ticker": t,
        "latest_metrics": {
            m: (
                {"fiscal_year": by_metric[m].fiscal_year, "value": by_metric[m].value}
                if m in by_metric
                else None
            )
            for m in _SUMMARY_METRICS
        },
    }


def growth_report(
    facts: DataFrame,
    alias_map: DataFrame,
    ticker: str,
    metrics: tuple[str, ...] = _GROWTH_METRICS,
) -> dict[str, Any]:
    """Trend analysis per metric (``server.py:386-440, 583-586``):
    year-by-year values, YoY growth list, CAGR, volatility, direction."""
    from sec_financial_pipeline_spark.operators import windows

    t = ticker.upper()
    out: dict[str, Any] = {
        "report_type": "growth",
        "ticker": t,
        "metrics_analyzed": list(metrics),
        "trends": {},
    }
    for metric in metrics:
        series = analytics.metric_series(facts, alias_map, metric).filter(
            F.col("ticker") == t
        )
        yoy_rows = (
            windows.yoy_growth(series, ["ticker"], "fiscal_year", "value", "yoy")
            .orderBy(F.col("fiscal_year").desc())
            .collect()
        )
        if not yoy_rows:
            continue
        trend_rows = analytics.trends(facts, alias_map, metric).filter(
            F.col("ticker") == t
        ).collect()
        section: dict[str, Any] = {
            "values": [
                {"fiscal_year": r.fiscal_year, "value": r.value} for r in yoy_rows
            ],
            "yoy_growth": [
                {"year": r.fiscal_year, "growth_rate": r.yoy}
                for r in yoy_rows
                if r.yoy is not None
            ],
        }
        if trend_rows:
            tr = trend_rows[0]
            section.update(
                {
                    "cagr": tr.cagr_pct,
                    "volatility": tr.volatility,
                    "trend_direction": tr.trend,
                }
            )
        out["trends"][metric] = section
    return out


def profitability_report(
    facts: DataFrame, alias_map: DataFrame, ticker: str
) -> dict[str, Any]:
    """Profitability series + per-year net margins (``server.py:588-619``).
    Margins come from the fused ratios plan (one join), not a driver-side
    zip of separately-fetched series."""
    t = ticker.upper()
    out: dict[str, Any] = {
        "report_type": "profitability",
        "ticker": t,
        "metrics": {},
    }
    for metric in _PROFIT_METRICS:
        rows = (
            analytics.metric_series(facts, alias_map, metric)
            .filter(F.col("ticker") == t)
            .orderBy(F.col("fiscal_year").desc())
            .collect()
        )
        out["metrics"][metric] = [
            {"fiscal_year": r.fiscal_year, "value": r.value} for r in rows
        ]
    margins = (
        analytics.ratios(facts, alias_map)
        .filter(F.col("ticker") == t)
        .orderBy(F.col("fiscal_year").desc())
        .collect()
    )
    out["margins"] = [
        {"fiscal_year": r.fiscal_year, "net_margin": r.net_margin_pct}
        for r in margins
        if r.net_margin_pct is not None
    ]
    return out
