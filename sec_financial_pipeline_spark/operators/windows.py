"""Window / time-series operators (SURVEY §2.5 W1-W8).

Generic over (group keys, order column, value column) so the same
operator serves both the SEC fact table (per ticker x metric over fiscal
years) and any other time-keyed table. All are single-window shapes:
one shuffle on the group keys, then in-partition sorted evaluation —
the minimal-shuffle plan for lag/lead analytics at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def yoy_growth(
    df: DataFrame,
    group: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "yoy_pct",
) -> DataFrame:
    """W3 — period-over-period growth percent via ``lag``
    (reference ``src/sec_mcp/server.py:417-425`` computes it with a
    Python loop over a desc-sorted list)."""
    w = Window.partitionBy(*group).orderBy(F.col(order_col))
    prev = F.lag(F.col(value_col)).over(w)
    growth = F.when(prev != 0, (F.col(value_col) / prev - 1.0) * 100.0)
    return df.withColumn(out_col, growth)


def cagr(
    df: DataFrame,
    group: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "cagr_pct",
) -> DataFrame:
    """W5 — compound annual growth rate over each group's full span
    (reference ``server.py:413-415``). Aggregates to one row per group.

    Uses ``min_by``/``max_by`` (first/last value by order key) — a single
    partial-aggregable pass, no window sort needed.
    """
    first_v = F.min_by(F.col(value_col), F.col(order_col))
    last_v = F.max_by(F.col(value_col), F.col(order_col))
    n = F.max(F.col(order_col)) - F.min(F.col(order_col))
    rate = F.when(
        (first_v > 0) & (last_v > 0) & (n > 0),
        (F.pow(last_v / first_v, 1.0 / n) - 1.0) * 100.0,
    )
    return df.groupBy(*group).agg(
        first_v.alias("first_value"),
        last_v.alias("last_value"),
        n.cast("int").alias("n_periods"),
        rate.alias(out_col),
    )


def volatility(
    df: DataFrame,
    group: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "volatility",
) -> DataFrame:
    """W6 — sample stddev of period-over-period growth
    (reference ``server.py:431``)."""
    grown = yoy_growth(df, group, order_col, value_col, "__g")
    return grown.groupBy(*group).agg(F.stddev_samp("__g").alias(out_col))


def trend_direction(cagr_col: Column, threshold: float = 1.0) -> Column:
    """W7 — classify a growth rate (reference ``server.py:432``)."""
    return (
        F.when(cagr_col.isNull(), "unknown")
        .when(cagr_col > threshold, "increasing")
        .when(cagr_col < -threshold, "decreasing")
        .otherwise("stable")
    )


def top_k(
    df: DataFrame, order_by: Sequence[Column], k: int
) -> DataFrame:
    """W1+W2 — global top-k under a *total* order (callers must include
    tie-breakers). Spark plans this as TakeOrderedAndProject: per-partition
    heaps, no full sort, no shuffle of non-winners — the right shape at
    any scale."""
    return df.orderBy(*order_by).limit(k)


def latest_per_group(
    df: DataFrame,
    group: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """W8 — newest row per group (reference ``server.py:315-316``).
    ``order_by`` is descending-priority and must be total."""
    w = Window.partitionBy(*group).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
