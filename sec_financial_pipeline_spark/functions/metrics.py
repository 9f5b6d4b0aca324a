"""Semantic layer: friendly metric -> ordered XBRL tag candidates
(SURVEY §1.3, reference alias maps at ``main.py:32-145``,
``financial_analyzer.py:31-126``, ``src/api/data_service.py:26-38``).

One flat priority table instead of the reference's three divergent
dict copies — a single source of truth, loadable as a broadcast
DataFrame for the tag-coalescing join (F5/J6). Tags are standard
us-gaap taxonomy concept names (public XBRL vocabulary); priority 0 is
the preferred (most modern) tag, higher numbers are fallbacks that
older filings use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sec_financial_pipeline_spark.schemas import ALIAS_SCHEMA

#: (statement, metric, tag, priority)
METRIC_ALIASES: list[tuple[str, str, str, int]] = [
    # ---- income statement -------------------------------------------------
    ("income", "revenue", "RevenueFromContractWithCustomerExcludingAssessedTax", 0),
    ("income", "revenue", "RevenueFromContractWithCustomerIncludingAssessedTax", 1),
    ("income", "revenue", "Revenues", 2),
    ("income", "revenue", "SalesRevenueNet", 3),
    ("income", "cost_of_revenue", "CostOfRevenue", 0),
    ("income", "cost_of_revenue", "CostOfGoodsAndServicesSold", 1),
    ("income", "cost_of_revenue", "CostOfGoodsSold", 2),
    ("income", "gross_profit", "GrossProfit", 0),
    ("income", "rnd_expense", "ResearchAndDevelopmentExpense", 0),
    ("income", "sga_expense", "SellingGeneralAndAdministrativeExpense", 0),
    ("income", "sga_expense", "GeneralAndAdministrativeExpense", 1),
    ("income", "operating_expenses", "OperatingExpenses", 0),
    ("income", "operating_income", "OperatingIncomeLoss", 0),
    ("income", "interest_expense", "InterestExpense", 0),
    ("income", "pretax_income", "IncomeLossFromContinuingOperationsBeforeIncomeTaxesExtraordinaryItemsNoncontrollingInterest", 0),
    ("income", "pretax_income", "IncomeLossFromContinuingOperationsBeforeIncomeTaxesMinorityInterestAndIncomeLossFromEquityMethodInvestments", 1),
    ("income", "income_tax", "IncomeTaxExpenseBenefit", 0),
    ("income", "net_income", "NetIncomeLoss", 0),
    ("income", "net_income", "ProfitLoss", 1),
    ("income", "eps_basic", "EarningsPerShareBasic", 0),
    ("income", "eps_diluted", "EarningsPerShareDiluted", 0),
    ("income", "shares_basic", "WeightedAverageNumberOfSharesOutstandingBasic", 0),
    ("income", "shares_diluted", "WeightedAverageNumberOfDilutedSharesOutstanding", 0),
    # ---- balance sheet ----------------------------------------------------
    ("balance", "cash", "CashAndCashEquivalentsAtCarryingValue", 0),
    ("balance", "short_term_investments", "ShortTermInvestments", 0),
    ("balance", "accounts_receivable", "AccountsReceivableNetCurrent", 0),
    ("balance", "inventory", "InventoryNet", 0),
    ("balance", "current_assets", "AssetsCurrent", 0),
    ("balance", "ppe_net", "PropertyPlantAndEquipmentNet", 0),
    ("balance", "goodwill", "Goodwill", 0),
    ("balance", "intangibles", "IntangibleAssetsNetExcludingGoodwill", 0),
    ("balance", "total_assets", "Assets", 0),
    ("balance", "accounts_payable", "AccountsPayableCurrent", 0),
    ("balance", "short_term_debt", "ShortTermBorrowings", 0),
    ("balance", "short_term_debt", "DebtCurrent", 1),
    ("balance", "current_liabilities", "LiabilitiesCurrent", 0),
    ("balance", "long_term_debt", "LongTermDebtNoncurrent", 0),
    ("balance", "long_term_debt", "LongTermDebt", 1),
    ("balance", "total_liabilities", "Liabilities", 0),
    ("balance", "retained_earnings", "RetainedEarningsAccumulatedDeficit", 0),
    ("balance", "stockholders_equity", "StockholdersEquity", 0),
    ("balance", "stockholders_equity", "StockholdersEquityIncludingPortionAttributableToNoncontrollingInterest", 1),
    # ---- cash flow --------------------------------------------------------
    ("cashflow", "operating_cash_flow", "NetCashProvidedByUsedInOperatingActivities", 0),
    ("cashflow", "investing_cash_flow", "NetCashProvidedByUsedInInvestingActivities", 0),
    ("cashflow", "financing_cash_flow", "NetCashProvidedByUsedInFinancingActivities", 0),
    ("cashflow", "capex", "PaymentsToAcquirePropertyPlantAndEquipment", 0),
    ("cashflow", "depreciation_amortization", "DepreciationDepletionAndAmortization", 0),
    ("cashflow", "depreciation_amortization", "DepreciationAndAmortization", 1),
    ("cashflow", "dividends_paid", "PaymentsOfDividends", 0),
    ("cashflow", "dividends_paid", "PaymentsOfDividendsCommonStock", 1),
    ("cashflow", "stock_buybacks", "PaymentsForRepurchaseOfCommonStock", 0),
    # ---- other ------------------------------------------------------------
    ("other", "shares_outstanding", "CommonStockSharesOutstanding", 0),
    ("other", "shares_outstanding", "EntityCommonStockSharesOutstanding", 1),
]

#: Label substrings for the serving path's label matcher (F4; reference
#: ``data_service.py:26-38`` matches by substring when tags are absent).
LABEL_SUBSTRINGS: dict[str, list[str]] = {
    "revenue": ["revenue", "sales"],
    "net_income": ["net income"],
    "total_assets": ["assets, total", "total assets"],
    "operating_cash_flow": ["operating activities"],
    "eps_basic": ["earnings per share, basic"],
}


def metrics_for(statement: str) -> list[str]:
    seen: dict[str, None] = {}
    for st, metric, _, _ in METRIC_ALIASES:
        if st == statement:
            seen.setdefault(metric, None)
    return list(seen)


def alias_table(spark: SparkSession) -> DataFrame:
    """The (metric, tag, priority) broadcast dimension for F5/J6 joins."""
    rows = [(m, t, p) for _, m, t, p in METRIC_ALIASES]
    return spark.createDataFrame(rows, ALIAS_SCHEMA)
