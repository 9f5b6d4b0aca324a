"""Report variants (summary/growth/profitability) + the named-tool
registry — the engine-side twin of the reference MCP surface
(``server.py:62-145`` tools, ``server.py:557-619`` report generators).
Each variant's sections are checked against the analytics layer the
report claims to summarize."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.plans import analytics, domain, report

TICKER = "T03"


@pytest.fixture(scope="module")
def facts_alias(spark, sf_dir):
    return domain.facts_df(spark, sf_dir), domain.alias_df(spark)


def test_summary_report_matches_latest_series(spark, sf_dir, facts_alias):
    facts, alias = facts_alias
    rep = report.summary_report(facts, alias, "t03")
    assert rep["report_type"] == "summary"
    assert rep["ticker"] == TICKER
    assert set(rep["latest_metrics"]) == {"revenue", "net_income", "total_assets"}
    # cross-check each latest value against the analytics series directly
    for metric, got in rep["latest_metrics"].items():
        want = (
            analytics.metric_series(facts, alias, metric)
            .filter(F.col("ticker") == TICKER)
            .orderBy(F.col("fiscal_year").desc())
            .limit(1)
            .collect()
        )
        assert got == {"fiscal_year": want[0].fiscal_year, "value": want[0].value}


def test_growth_report_sections(spark, sf_dir, facts_alias):
    facts, alias = facts_alias
    rep = report.growth_report(facts, alias, TICKER)
    assert rep["report_type"] == "growth"
    assert rep["metrics_analyzed"] == ["revenue", "net_income", "total_assets"]
    for metric in rep["metrics_analyzed"]:
        sec = rep["trends"][metric]
        years = [v["fiscal_year"] for v in sec["values"]]
        assert years == sorted(years, reverse=True)
        # n values -> n-1 YoY growth points
        assert len(sec["yoy_growth"]) == len(sec["values"]) - 1
        assert sec["trend_direction"] in {"increasing", "decreasing", "stable", "unknown"}
        want = analytics.trends(facts, alias, metric).filter(
            F.col("ticker") == TICKER
        ).collect()[0]
        assert sec["cagr"] == want.cagr_pct
        assert sec["volatility"] == want.volatility


def test_profitability_report_margins_match_ratios(spark, sf_dir, facts_alias):
    facts, alias = facts_alias
    rep = report.profitability_report(facts, alias, TICKER)
    assert rep["report_type"] == "profitability"
    assert set(rep["metrics"]) == {"revenue", "net_income", "operating_income"}
    assert rep["margins"], "margins section empty"
    want = {
        r.fiscal_year: r.net_margin_pct
        for r in analytics.ratios(facts, alias)
        .filter(F.col("ticker") == TICKER)
        .collect()
    }
    for m in rep["margins"]:
        assert m["net_margin"] == want[m["fiscal_year"]]


def test_tool_registry_dispatch(spark, sf_dir):
    from sec_financial_pipeline_spark.plans.tools import ToolRegistry

    reg = ToolRegistry(spark, sf_dir)
    names = {t["name"] for t in reg.list_tools()}
    assert names == {
        "get_company_financials",
        "get_financial_metric",
        "compare_companies",
        "analyze_financial_trends",
        "generate_financial_report",
        "get_available_metrics",
    }
    # every tool schema names its required params
    for t in reg.list_tools():
        assert t["inputSchema"]["type"] == "object"
        assert "required" in t["inputSchema"]

    series = reg.call("get_financial_metric", ticker=TICKER, metric="revenue")
    assert series["ticker"] == TICKER and series["n_periods"] > 0

    cmp_out = reg.call("compare_companies", tickers=["T00", "T01"], metric="revenue")
    assert cmp_out["tickers"] == ["T00", "T01"] and cmp_out["rows"]

    trends = reg.call(
        "analyze_financial_trends", ticker=TICKER, metrics=["REVENUE", "net_income"]
    )
    assert set(trends["trends"]) == {"revenue", "net_income"}

    for rt in ("summary", "growth", "profitability", "comprehensive"):
        out = reg.call("generate_financial_report", ticker=TICKER, report_type=rt)
        assert out["ticker"] == TICKER

    with pytest.raises(ValueError, match="Unknown report type"):
        reg.call("generate_financial_report", ticker=TICKER, report_type="nope")
    with pytest.raises(KeyError, match="Unknown tool"):
        reg.call("no_such_tool")


def test_available_metrics_has_data_flags(spark, sf_dir):
    from sec_financial_pipeline_spark.plans.tools import ToolRegistry

    reg = ToolRegistry(spark, sf_dir)
    bare = reg.call("get_available_metrics")
    assert {"name": "revenue"} in bare
    flagged = reg.call("get_available_metrics", ticker=TICKER)
    by_name = {m["name"]: m["has_data"] for m in flagged}
    assert set(by_name) == {m["name"] for m in bare}
    assert by_name["revenue"] is True
    assert by_name["net_income"] is True
