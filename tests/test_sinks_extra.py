"""Exactly-once streaming sink + small-file compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_exactly_once_epoch_sink(spark, tmp_path):
    from sec_financial_pipeline_spark.streaming.sinks import (
        EpochParquetSink,
        write_stream_exactly_once,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    ).repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    sink = EpochParquetSink(str(tmp_path / "out"))
    q = write_stream_exactly_once(stream, sink)
    q.processAllAvailable()
    q.stop()

    epochs = sink.committed_epochs()
    assert len(epochs) >= 2  # bounded files-per-trigger => multiple epochs
    back = spark.read.parquet(str(tmp_path / "out" / "epoch=*"))
    assert back.count() == 100
    assert back.agg(F.sum("v")).collect()[0][0] == sum(range(100))

    # idempotence: re-delivering an epoch with different data is a no-op
    fake = spark.createDataFrame([(999, 999.0)], "id long, v double")
    sink(fake, epochs[0])
    assert spark.read.parquet(str(tmp_path / "out" / "epoch=*")).count() == 100


def test_compaction(spark, tmp_path):
    from sec_financial_pipeline_spark.sources.sink import compact

    path = str(tmp_path / "frag")
    df = spark.range(10_000).select(
        "id", (F.col("id") % 3).alias("part"), F.rand(seed=1).alias("v")
    )
    df.repartition(16).write.partitionBy("part").parquet(path)
    before = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert before > 10  # fragmented

    total_before = spark.read.parquet(path).count()
    after = compact(spark, path, target_files_per_partition=1, partition_cols=("part",))
    assert after <= 3  # one file per partition value
    assert spark.read.parquet(path).count() == total_before
