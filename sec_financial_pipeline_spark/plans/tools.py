"""Named-tool dispatch over the serving layer — the engine-side twin of
the reference's MCP tool registry (``src/sec_mcp/server.py:62-145`` six
tools; ``server.py:147-181`` name-based dispatch).

Framework-free on purpose (same stance as ``plans/facade.py``): each
tool is a (name, schema, callable) triple; ``call()`` routes by name
with keyword arguments and raises ``KeyError`` on unknown tools —
whatever transport the deployment uses (MCP, HTTP, CLI) mounts these
without the engine importing a server framework.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.plans import analytics, domain, report
from sec_financial_pipeline_spark.plans.facade import ServingFacade


@dataclass(frozen=True)
class Tool:
    name: str
    description: str
    input_schema: dict[str, Any]
    fn: Callable[..., Any]


class ToolRegistry:
    """The reference's six tools over the Spark engine.

    | tool                      | reference            | engine path |
    |---------------------------|----------------------|-------------|
    | get_company_financials    | server.py:65-76      | facade.company_facts |
    | get_financial_metric      | server.py:78-91      | facade.metric_series |
    | compare_companies         | server.py:92-105     | facade.compare |
    | analyze_financial_trends  | server.py:106-118    | report.growth_report |
    | generate_financial_report | server.py:119-132    | report.* by type |
    | get_available_metrics     | server.py:133-143    | alias-map distinct |
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.facade = ServingFacade(spark, sf_dir)
        self._tools: dict[str, Tool] = {}
        for t in self._build():
            self._tools[t.name] = t

    # -- registry surface --------------------------------------------------

    def list_tools(self) -> list[dict[str, Any]]:
        return [
            {"name": t.name, "description": t.description, "inputSchema": t.input_schema}
            for t in self._tools.values()
        ]

    def call(self, name: str, **arguments: Any) -> Any:
        if name not in self._tools:
            raise KeyError(f"Unknown tool: {name}")
        return self._tools[name].fn(**arguments)

    # -- engine bindings ---------------------------------------------------

    def _facts(self) -> DataFrame:
        return domain.facts_df(self.spark, self.sf_dir)

    def _alias(self) -> DataFrame:
        return domain.alias_df(self.spark)

    def _get_company_financials(self, ticker: str) -> dict[str, Any]:
        return self.facade.company_facts(ticker)

    def _get_financial_metric(
        self, ticker: str, metric: str, fmt: str = "json"
    ) -> Any:
        return self.facade.metric_series(ticker, metric, fmt=fmt)

    def _compare_companies(self, tickers: list[str], metric: str) -> dict[str, Any]:
        return self.facade.compare(tickers, metric)

    def _analyze_financial_trends(
        self, ticker: str, metrics: list[str]
    ) -> dict[str, Any]:
        return report.growth_report(
            self._facts(), self._alias(), ticker, tuple(m.lower() for m in metrics)
        )

    def _generate_financial_report(
        self, ticker: str, report_type: str = "comprehensive"
    ) -> dict[str, Any]:
        facts, alias = self._facts(), self._alias()
        if report_type == "comprehensive":
            return report.company_report(facts, alias, ticker)
        if report_type == "summary":
            return report.summary_report(facts, alias, ticker)
        if report_type == "growth":
            return report.growth_report(facts, alias, ticker)
        if report_type == "profitability":
            return report.profitability_report(facts, alias, ticker)
        raise ValueError(f"Unknown report type: {report_type}")

    def _get_available_metrics(self, ticker: str | None = None) -> list[dict[str, Any]]:
        """Distinct metrics from the alias dimension; with a ticker, flag
        which have data — ONE anti-joined aggregation, not a per-metric
        probe loop (the reference queries each metric serially)."""
        alias = self._alias().select("metric").distinct()
        if ticker is None:
            return [{"name": r.metric} for r in alias.orderBy("metric").collect()]
        present = (
            self._facts()
            .filter(F.col("ticker") == ticker.upper())
            .join(F.broadcast(self._alias()), "tag")
            .select("metric")
            .distinct()
            .withColumn("has_data", F.lit(True))
        )
        rows = (
            alias.join(present, "metric", "left_outer")
            .select("metric", F.coalesce("has_data", F.lit(False)).alias("has_data"))
            .orderBy("metric")
            .collect()
        )
        return [{"name": r.metric, "has_data": r.has_data} for r in rows]

    def _build(self) -> list[Tool]:
        tk = {"type": "string", "description": "Stock ticker symbol"}
        return [
            Tool(
                "get_company_financials",
                "Get comprehensive financial data for a company",
                {"type": "object", "properties": {"ticker": tk}, "required": ["ticker"]},
                self._get_company_financials,
            ),
            Tool(
                "get_financial_metric",
                "Get specific financial metric for a company",
                {
                    "type": "object",
                    "properties": {
                        "ticker": tk,
                        "metric": {"type": "string"},
                        "fmt": {"type": "string", "enum": ["json", "csv", "parquet"]},
                    },
                    "required": ["ticker", "metric"],
                },
                self._get_financial_metric,
            ),
            Tool(
                "compare_companies",
                "Compare financial metrics across multiple companies",
                {
                    "type": "object",
                    "properties": {
                        "tickers": {"type": "array", "items": {"type": "string"}},
                        "metric": {"type": "string"},
                    },
                    "required": ["tickers", "metric"],
                },
                self._compare_companies,
            ),
            Tool(
                "analyze_financial_trends",
                "Analyze financial trends for multiple metrics over time",
                {
                    "type": "object",
                    "properties": {
                        "ticker": tk,
                        "metrics": {"type": "array", "items": {"type": "string"}},
                    },
                    "required": ["ticker", "metrics"],
                },
                self._analyze_financial_trends,
            ),
            Tool(
                "generate_financial_report",
                "Generate financial report for a company",
                {
                    "type": "object",
                    "properties": {
                        "ticker": tk,
                        "report_type": {
                            "type": "string",
                            "enum": ["comprehensive", "summary", "growth", "profitability"],
                        },
                    },
                    "required": ["ticker"],
                },
                self._generate_financial_report,
            ),
            Tool(
                "get_available_metrics",
                "Get list of available financial metrics",
                {"type": "object", "properties": {"ticker": tk}, "required": []},
                self._get_available_metrics,
            ),
        ]
