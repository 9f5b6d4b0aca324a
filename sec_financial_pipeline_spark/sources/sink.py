"""Sinks (SURVEY §2.1 S4/S7/S8/S9).

The reference writes one parquet file per (ticker, year[, quarter]) —
thousands of tiny files by design (``src/etl/data_manager.py:192-302``).
At 100 TB that layout is fatal (NameNode/object-store metadata pressure,
footer-read amplification). The Spark-first sink:

- partitions by the *pruning* columns only (``ticker`` would explode the
  namespace at 10k+ tickers; ``fiscal_year`` alone gives bounded
  cardinality and serves the dominant year-range predicates);
- repartitions before write so each partition directory holds a few
  well-sized files instead of one per input task;
- snappy parquet (same codec the reference uses).

Serving-edge sinks (CSV string / parquet bytes / JSON docs —
``data_service.py:188-299``) collect a *bounded, already-aggregated*
result — never raw data — mirroring the reference's API downloads.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame


def write_facts(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: tuple[str, ...] = ("fiscal_year",),
    files_per_partition: int = 4,
) -> None:
    """Partitioned snappy-parquet sink (S4) without the small-file trap."""
    (
        df.repartition(files_per_partition, *partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .option("compression", "snappy")
        .parquet(path)
    )


def overwrite_partitions(df: DataFrame, path: str, partition_cols: tuple[str, ...]) -> None:
    """Full-refresh of just the partitions present in ``df`` (T4 analog —
    reference deletes per-ticker files then rewrites,
    ``data_manager.py:393-424``). Uses dynamic partition overwrite so
    untouched partitions survive."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact(spark, path: str, target_files_per_partition: int = 1,
            partition_cols: tuple[str, ...] = ()) -> int:
    """Small-file compaction (the OPTIMIZE analog; SURVEY §4 "small-file
    problem"). Rewrites a parquet dataset into ``target_files_per_partition``
    files per partition directory, swapped in via two renames (write to a
    sibling temp dir, move the original aside, move the temp into place,
    drop the original) — a crash mid-swap leaves the dataset readable at
    either ``path`` or ``path__old``, never gone. Returns the file count
    after compaction."""
    import os
    import shutil

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__old"
    writer = df.repartition(
        target_files_per_partition, *partition_cols
    ) if partition_cols else df.coalesce(target_files_per_partition)
    w = writer.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n = 0
    for _, _, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def to_csv_bytes(df: DataFrame, limit: int = 1_000_000) -> bytes:
    """S7 — serving-edge CSV download of a bounded result."""
    pdf = df.limit(limit).toPandas()
    return pdf.to_csv(index=False).encode("utf-8")


def to_parquet_bytes(df: DataFrame, limit: int = 1_000_000) -> bytes:
    """S8 — serving-edge in-memory parquet blob (reference
    ``data_service.py:228-271``)."""
    buf = io.BytesIO()
    df.limit(limit).toPandas().to_parquet(buf, compression="snappy")
    return buf.getvalue()


def to_json_records(df: DataFrame, limit: int = 100_000) -> list[dict]:
    """S9 — serving-edge JSON documents."""
    return [row.asDict(recursive=True) for row in df.limit(limit).collect()]
