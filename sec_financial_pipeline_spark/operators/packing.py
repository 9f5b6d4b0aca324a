"""Sequence packing for LM training data (SURVEY §2.9 north-star scope):
the concat-then-chunk layout — documents laid head-to-tail in a
deterministic total order, then split into fixed-size token windows.
Each document's global token OFFSET determines which training chunks it
lands in; the offsets are a prefix sum over the corpus.

The naive prefix sum is a window over a GLOBAL order — Spark executes an
un-partitioned window in ONE task, which is exactly the thing that dies
at 100 TB. This module computes the same exact offsets in two phases:

1. range-repartition on the order key (preserves the global order across
   partitions), take per-partition token subtotals — one tiny row per
   partition;
2. cumulate the subtotals into per-partition base offsets (a window over
   the subtotal table: hundreds of rows, not the corpus) and broadcast
   them back; each row's offset = partition base + within-partition
   running sum (a partitioned window — parallel).

Deterministic for any partition count: range partitioning orders
partitions by key, and integer token counts make every sum exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    order_col: str,
    size_col: str,
    chunk_tokens: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``offset`` (global start position in the concatenated token
    stream), ``first_chunk`` and ``last_chunk`` (the fixed-size windows
    of ``chunk_tokens`` this row's span [offset, offset+size) touches).

    ``order_col`` must be a unique total order (document id); ``size_col``
    an integer token count. Zero-size rows get their boundary offset and
    span their containing chunk only.
    """
    n_part = num_partitions or max(
        1, df.sparkSession.sparkContext.defaultParallelism
    )
    parted = df.repartitionByRange(n_part, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    # phase 1: per-partition subtotals (tiny: one row per partition)
    subtotals = parted.groupBy("__pid").agg(
        F.sum(F.col(size_col).cast("long")).alias("__psum")
    )
    # phase 2: base offset per partition — window over the SUBTOTAL
    # table only; rowsBetween excludes the current partition's own sum
    w_base = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = subtotals.select(
        "__pid", F.coalesce(F.sum("__psum").over(w_base), F.lit(0)).alias("__base")
    )
    # within-partition running sum (partitioned window — parallel),
    # exclusive of the current row
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.col("__base") + F.coalesce(
        F.sum(F.col(size_col).cast("long")).over(w_in), F.lit(0)
    )
    span_end = offset + F.greatest(F.col(size_col).cast("long"), F.lit(1)) - 1
    return (
        parted.join(F.broadcast(bases), "__pid")
        .withColumn("offset", offset)
        .withColumn("first_chunk", (F.col("offset") / chunk_tokens).cast("long"))
        .withColumn("last_chunk", (span_end / chunk_tokens).cast("long"))
        .drop("__pid", "__base")
    )
