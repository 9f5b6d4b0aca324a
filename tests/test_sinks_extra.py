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


def _crash_sim(spark, tmp_path, break_marker: bool):
    """Build a dataset, stage a swap as if swap_rewrite crashed between
    its two renames: path moved to __old, new contents at __swap_tmp
    (optionally with its _SUCCESS marker removed = incomplete write)."""
    import shutil

    path = str(tmp_path / "ds")
    spark.range(10).withColumn("v", F.col("id") * 2).write.parquet(path)
    new = spark.range(5).withColumn("v", F.col("id") * 3)
    new.write.parquet(path + "__swap_tmp")
    if break_marker:
        os.remove(path + "__swap_tmp/_SUCCESS")
    shutil.move(path, path + "__old")
    return path


def test_recover_swap_rolls_forward_complete_write(spark, tmp_path):
    from sec_financial_pipeline_spark.sources.sink import recover_swap

    path = _crash_sim(spark, tmp_path, break_marker=False)
    assert recover_swap(spark, path) == "forward"
    got = sorted(r.v for r in spark.read.parquet(path).collect())
    assert got == [0, 3, 6, 9, 12]  # the NEW contents
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__swap_tmp")


def test_recover_swap_rolls_back_incomplete_write(spark, tmp_path):
    from sec_financial_pipeline_spark.sources.sink import recover_swap

    path = _crash_sim(spark, tmp_path, break_marker=True)
    assert recover_swap(spark, path) == "rollback"
    got = sorted(r.v for r in spark.read.parquet(path).collect())
    assert got == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]  # the ORIGINAL
    assert not os.path.exists(path + "__swap_tmp")


def test_recover_swap_strict_noop_on_healthy_dataset(spark, tmp_path):
    """When the dataset exists, recover_swap must not touch sibling
    dirs: a __swap_tmp there may belong to a concurrent IN-FLIGHT
    swap_rewrite (a reader deleting it would lose the writer's rewrite
    and strand the dataset at __old). Strays die at the next
    successful swap instead."""
    from sec_financial_pipeline_spark.sources.sink import recover_swap

    path = str(tmp_path / "ds")
    spark.range(4).write.parquet(path)
    spark.range(2).write.parquet(path + "__swap_tmp")  # in-flight writer's
    assert recover_swap(spark, path) == "clean"
    assert spark.read.parquet(path).count() == 4
    assert os.path.exists(path + "__swap_tmp")  # untouched


def test_store_open_recovers_crashed_delete(spark, sf_dir, tmp_path):
    """End to end: a delete crash between the two renames, then a plain
    load_signature_store — the open path itself must finish the swap
    and serve the post-delete contents."""
    import shutil

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    path = str(tmp_path / "store")
    S.save_signature_store(
        S.minhash_signatures(d, "doc_id", "text"), "doc_id", path
    )
    forget = [r.doc_id for r in d.limit(10).collect()]
    kept = spark.read.parquet(path).filter(~F.col("id").isin(forget))
    kept.write.partitionBy("band_no").parquet(path + "__swap_tmp")
    shutil.move(path, path + "__old")  # crash point: between the renames

    store = S.load_signature_store(spark, path)
    assert store.filter(F.col("id").isin(forget)).count() == 0
    assert store.count() > 0
    assert not os.path.exists(path + "__old")


def test_delete_all_then_append_restores_partitioned_store(spark, sf_dir, tmp_path):
    """The UPDATE contract through the empty state: delete EVERY row
    (store becomes a zero-row non-partitioned file), then append a
    batch — append_partitioned must restore the partitioned layout and
    the store must stay fully readable/probe-able (a naive append
    beside the root file makes a mixed layout Spark refuses to read)."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    path = str(tmp_path / "store")
    sigs = S.minhash_signatures(d, "doc_id", "text")
    S.save_signature_store(sigs, "doc_id", path)
    all_ids = [r.doc_id for r in d.collect()]
    assert S.delete_from_store(spark, path, all_ids) == 0

    S.append_to_signature_store(sigs, "doc_id", path)
    store = S.load_signature_store(spark, path)
    assert store.count() == len(all_ids) * 4  # 4 bands per doc
    assert "band_no" in store.columns
    # the re-appended store serves probes again
    probe = S.incremental_candidate_pairs(
        S.minhash_signatures(d.limit(5), "doc_id", "text"), "doc_id", store
    )
    probe.collect()  # must not raise


def test_writer_retry_self_heals_crashed_swap(spark, sf_dir, tmp_path):
    """Retrying the crashed operation itself (not just a load) must
    heal the swap: delete_from_store on a path whose swap crashed
    between the renames."""
    import shutil

    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    path = str(tmp_path / "store")
    S.save_signature_store(
        S.minhash_signatures(d, "doc_id", "text"), "doc_id", path
    )
    ids = [r.doc_id for r in d.limit(10).collect()]
    kept = spark.read.parquet(path).filter(~F.col("id").isin(ids))
    kept.write.partitionBy("band_no").parquet(path + "__swap_tmp")
    shutil.move(path, path + "__old")  # crash between the renames

    remaining = S.delete_from_store(spark, path, ids)  # retry, not a load
    assert remaining > 0
    store = spark.read.parquet(path)
    assert store.filter(F.col("id").isin(ids)).count() == 0
