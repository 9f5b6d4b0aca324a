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
