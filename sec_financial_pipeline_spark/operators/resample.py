"""Time-series resampling with gap fill (the QuestDB/Timescale
``SAMPLE BY`` / ``time_bucket_gapfill`` operator): bucket events to a
fixed interval, DENSIFY each group's bucket grid so empty intervals
exist as rows, and fill the value column (LOCF / zero / null).

Scale shape: one shuffled aggregation to buckets (map-side combined),
one tiny per-group span aggregation, a ``sequence``+``explode`` grid
generated DISTRIBUTED by group (rows per group = span/interval — the
semantic output size, never more), one (group, bucket) join, and a
group-partitioned ordered window for the carry-forward — zero
unpartitioned windows, zero driver-side loops. Buckets are integer
epoch seconds (floor semantics on both engines: Spark unix_timestamp
truncates, the oracle floors explicitly before casting — DuckDB's
double->BIGINT cast ROUNDS, which would shift half the buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.functions.deterministic import dsum

_FILLS = ("locf", "zero", "null", "interp")


def resample_fill(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    interval_s: int,
    group_cols: list[str],
    fill: str = "locf",
) -> DataFrame:
    """``(group..., bucket_ts, n_events, value)`` on a DENSE per-group
    bucket grid from each group's first to last event. ``n_events`` is
    0 on gap rows; ``value`` is the deterministic decimal sum of
    ``value_col`` per bucket, gap-filled per ``fill``:

    - ``locf``: last observation carried forward (the monitoring/
      market-data default);
    - ``zero``: empty interval = 0.0 (rates/counts semantics);
    - ``null``: gaps stay NULL (downstream interpolation's input);
    - ``interp``: linear interpolation between the surrounding
      observed buckets (every gap is interior — the grid starts and
      ends at observed buckets by construction — so both neighbors
      always exist).

    ``group_cols`` must be non-empty: the carry-forward window
    partitions by it (a global resample would be an unpartitioned
    window — repartition a constant group in if you truly mean one
    series)."""
    if not group_cols:
        raise ValueError(
            "resample_fill: group_cols must be non-empty (the fill "
            "window partitions by it)"
        )
    if fill not in _FILLS:
        raise ValueError(f"resample_fill: fill must be one of {_FILLS}")
    if interval_s <= 0:
        raise ValueError("resample_fill: interval_s must be > 0")
    # a NULL timestamp belongs to no bucket: dropped EXPLICITLY here
    # (otherwise its rows would aggregate into a NULL bucket that never
    # joins the dense grid — a silent loss)
    df = df.filter(F.col(ts_col).isNotNull())
    sec = F.unix_timestamp(F.col(ts_col))
    bucket = (sec - F.pmod(sec, F.lit(interval_s))).alias("__b")
    b = df.groupBy(*group_cols, bucket).agg(
        F.count(F.lit(1)).alias("__n"), dsum(value_col).alias("__v")
    )
    span = b.groupBy(*group_cols).agg(
        F.min("__b").alias("__mn"), F.max("__b").alias("__mx")
    )
    grid = span.select(
        *group_cols,
        F.explode(
            F.sequence("__mn", "__mx", F.lit(interval_s))
        ).alias("__b"),
    )
    j = grid.join(b, [*group_cols, "__b"], "left")
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if fill == "locf":
        val = F.last("__v", ignorenulls=True).over(wb)
    elif fill == "zero":
        val = F.coalesce(F.col("__v"), F.lit(0.0))
    elif fill == "interp":
        wf = (
            Window.partitionBy(*group_cols)
            .orderBy("__b")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        ob = F.when(F.col("__v").isNotNull(), F.col("__b"))
        pv = F.last("__v", ignorenulls=True).over(wb)
        pb = F.last(ob, ignorenulls=True).over(wb)
        nv = F.first("__v", ignorenulls=True).over(wf)
        nb = F.first(ob, ignorenulls=True).over(wf)
        frac = (F.col("__b") - pb).cast("double") / (nb - pb).cast("double")
        val = F.when(
            F.col("__v").isNotNull(), F.col("__v").cast("double")
        ).otherwise(pv.cast("double") + (nv - pv).cast("double") * frac)
    else:
        val = F.col("__v")
    return j.select(
        *group_cols,
        F.timestamp_seconds(F.col("__b")).alias("bucket_ts"),
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_events"),
        val.cast("double").alias("value"),
    )
