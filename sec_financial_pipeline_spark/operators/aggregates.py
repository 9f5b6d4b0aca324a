"""Aggregation & pivot operators (SURVEY §2.4 A1-A11).

Everything here is expressed with partial-aggregable built-ins (map-side
combine happens automatically), and pivots always pass an explicit value
list so the plan never needs a first pass to discover pivot columns —
at 100 TB an unbounded ``pivot()`` is a full extra scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    group: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """A4/J5 — long -> wide pivot with a bounded, explicit column set
    (reference assembles this with nested dicts, ``main.py:334-336``,
    and alignment across companies, ``main.py:751-755``)."""
    out = df.groupBy(*group).pivot(pivot_col, list(pivot_values)).agg(agg)
    if rename:
        for old, new in rename.items():
            out = out.withColumnRenamed(old, new)
    return out


def freshness_watermark(
    df: DataFrame,
    group: Sequence[str],
    date_cols: Sequence[str],
    period_col: str,
) -> DataFrame:
    """A7 — per-group data-freshness watermark (reference
    ``data_manager.py:304-331``): latest observation date plus the sorted
    distinct set of covered periods, rendered as a stable string."""
    latest = F.max(F.coalesce(*[F.col(c) for c in date_cols]))
    periods = F.array_join(
        F.array_sort(F.collect_set(F.col(period_col).cast("string"))), ","
    )
    return df.groupBy(*group).agg(
        latest.alias("latest_date"),
        periods.alias("covered_periods"),
        F.count(F.lit(1)).alias("n_facts"),
    )


def conditional_counts(
    df: DataFrame, group: Sequence[str], conditions: dict[str, Column]
) -> DataFrame:
    """A6 — named conditional counts (reference success/failure rollup,
    ``src/etl/pipeline.py:320-350``)."""
    aggs = [
        F.count(F.when(cond, F.lit(1))).alias(name)
        for name, cond in conditions.items()
    ]
    return df.groupBy(*group).agg(*aggs)
