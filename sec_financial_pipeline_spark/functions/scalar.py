"""Scalar column helpers (SURVEY §2.6 C1-C6).

All JVM-side ``pyspark.sql.functions`` compositions — no Python UDFs —
so every one of these stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """Null-safe division: NULL when the denominator is 0 or NULL.

    Mirrors the reference's guard-against-zero checks
    (``main.py:541,547,550``; ``src/sec_mcp/server.py:415,421``) but
    yields NULL rather than silently dropping the row, which is the
    SQL-standard behaviour the oracle agrees with.
    """
    return F.when(den != 0, num / den)


def cik_pad(cik: Column) -> Column:
    """10-digit zero-padded CIK (reference ``models.py:64-69``)."""
    return F.lpad(cik.cast("string"), 10, "0")


def norm_ticker(ticker: Column) -> Column:
    """Uppercased, trimmed ticker (reference ``models.py:71-74``)."""
    return F.upper(F.trim(ticker))


#: Ticker format rule (reference ``data_service.py:312-324``):
#: 1-6 chars, alphanumeric plus '.' and '-'.
TICKER_RE = r"^[A-Za-z0-9.\-]{1,6}$"


def is_valid_ticker(ticker: Column) -> Column:
    return ticker.rlike(TICKER_RE)
