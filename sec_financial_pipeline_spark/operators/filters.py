"""Filters & predicates (SURVEY §2.2 F1-F8).

Every function is a pure ``DataFrame -> DataFrame`` transform built from
JVM-side expressions, so Catalyst pushes them into the parquet scan
(check ``.explain``: they appear under ``PushedFilters``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F1 — period predicate. The reference has two subtly different semantics:
#   analyzers:  annual <=> fp.startswith("FY")      (main.py:219-227)
#   service:    annual <=> fp in (None, "FY")       (data_service.py:133-140)
# We standardize on the *service* semantics (fp IS NULL OR fp = 'FY') —
# it is the one on the serving path — and expose the analyzer variant
# explicitly for parity tests.
# ---------------------------------------------------------------------------


def annual_only(df: DataFrame, fp_col: str = "fiscal_period") -> DataFrame:
    return df.filter(F.col(fp_col).isNull() | (F.col(fp_col) == "FY"))


def annual_only_analyzer(df: DataFrame, fp_col: str = "fiscal_period") -> DataFrame:
    """Analyzer-style F1 (``main.py:219``): fp startswith 'FY'."""
    return df.filter(F.col(fp_col).startswith("FY"))


def quarterly_only(df: DataFrame, fp_col: str = "fiscal_period") -> DataFrame:
    return df.filter(F.col(fp_col).startswith("Q"))


def fiscal_year_range(
    df: DataFrame, lo: int, hi: int, fy_col: str = "fiscal_year"
) -> DataFrame:
    """F2 — inclusive fiscal-year range (``data_service.py:182-184``)."""
    return df.filter(F.col(fy_col).between(lo, hi))


def drop_null_keys(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """F3 — drop rows with NULL in any key column (``main.py:320-321``)."""
    out = df
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def label_any_substring(
    df: DataFrame, candidates: Sequence[str], label_col: str = "label"
) -> DataFrame:
    """F4 — case-insensitive OR-of-substrings label match
    (``data_service.py:115-121``)."""
    pred: Column | None = None
    lowered = F.lower(F.col(label_col))
    for cand in candidates:
        term = lowered.contains(cand.lower())
        pred = term if pred is None else (pred | term)
    return df.filter(pred)


def priority_rank(priorities: Sequence[str], col: Column) -> Column:
    """Ordinal rank of ``col`` within an explicit priority list; values not
    listed rank last. Building block for F5 (tag coalescing) and F6 (unit
    preference, ``financial_analyzer.py:146-153``)."""
    expr = F.lit(len(priorities))
    for i in range(len(priorities) - 1, -1, -1):
        expr = F.when(col == priorities[i], F.lit(i)).otherwise(expr)
    return expr
