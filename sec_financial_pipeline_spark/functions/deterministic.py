"""Deterministic floating-point aggregation.

Summing doubles is order-dependent, and Spark's partial aggregation order
varies run to run (and differs from any other engine). For a distributed
engine whose results must be *reproducible* — and comparable against an
independent oracle — money-style sums are computed exactly:

    per-row expression (double, deterministic IEEE math)
      -> cast to DECIMAL(p, s)   (rounds once, identically in any engine;
                                  exact decimal ties cannot occur because
                                  binary doubles never land exactly on a
                                  half-ulp-of-decimal boundary for s >= 1)
      -> SUM over decimals        (exact, associative, order-independent)
      -> cast back to DOUBLE      (single deterministic rounding)

This is cheap (decimal sum is JVM-side, codegen'd), scales to any
partition count, and makes the result bit-identical across runs, cluster
sizes, and engines. Averages are derived as exact-sum / count rather than
the order-dependent ``avg`` of doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default decimal shape: 24 integer digits x 6 fractional digits.
#: Scale 6 is chosen so the cast is *exact* for this domain's values
#: (prices/discounts/taxes have <= 2 decimals, so 3-factor money products
#: have <= 6): an exact cast never rounds, which sidesteps engine-specific
#: double->decimal rounding at half-boundaries (Spark rounds the exact
#: decimal expansion HALF_UP; DuckDB multiplies in double and rounds the
#: nearest representable — they disagree on values ending in ...5).
#: 24 integer digits absorbs ~10^12-row sums of 10^6 magnitudes.
PRECISION = 30
SCALE = 6


def dsum(expr: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """Order-independent sum of a double expression, returned as double."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def davg(expr: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """Deterministic mean: exact decimal sum divided by count."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return (
        F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(col)
    )


def dsum_sql(expr: str, scale: int = SCALE, precision: int = PRECISION) -> str:
    """The ANSI-SQL twin of :func:`dsum` (used to build oracle queries)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = SCALE, precision: int = PRECISION) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
