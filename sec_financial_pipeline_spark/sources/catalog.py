"""File-catalog utilities (SURVEY §2.1 S6, §2.4 A5).

The reference keeps a hand-maintained JSON ledger of parquet files with
sizes/row-counts/freshness (``src/etl/data_manager.py:45-101``,
``models.py:293-307``). On Spark the data catalog IS the filesystem +
parquet footers: ``input_file_name()`` and the ``_metadata`` hidden
column expose per-file lineage, and storage stats are one aggregate over
them — no side ledger to drift out of sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_inventory(spark: SparkSession, path: str) -> DataFrame:
    """Per-file stats of a parquet dataset: rows + bytes via the
    ``_metadata`` struct (file_path, file_size, ...)."""
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.file_size").alias("file_size"),
    )
    return df.groupBy("file_path", "file_size").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def storage_stats(spark: SparkSession, path: str) -> DataFrame:
    """A5 — the reference's storage-stats rollup
    (``data_manager.py:426-447``): files, bytes, records, avg rows/file."""
    inv = file_inventory(spark, path)
    return inv.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("file_size").alias("total_bytes"),
        F.sum("n_rows").alias("total_rows"),
        (F.sum("n_rows") / F.count(F.lit(1))).alias("avg_rows_per_file"),
    )


def partition_inventory(df: DataFrame, partition_cols: list[str]) -> DataFrame:
    """Row counts per partition value — the catalog view the reference
    derives from its directory layout (``data_manager.py:107-125``)."""
    return df.groupBy(*partition_cols).agg(F.count(F.lit(1)).alias("n_rows"))
