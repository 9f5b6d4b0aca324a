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


# ---------------------------------------------------------------------------
# Round-8: never-created stores, crashed-swap-aware bootstrap, the
# single-writer lease, and the reader-races-writer idempotent finish.
# ---------------------------------------------------------------------------


def test_recover_swap_absent_status_and_missing_error(spark, tmp_path):
    """A store that never existed is NOT a crash: missing_ok=True
    reports 'absent'; the default raises FileNotFoundError naming the
    path (previously a misleading 'no recoverable copy' IOError)."""
    import pytest

    from sec_financial_pipeline_spark.sources.sink import recover_swap

    path = str(tmp_path / "never_built")
    assert recover_swap(spark, path, missing_ok=True) == "absent"
    with pytest.raises(FileNotFoundError, match="never created"):
        recover_swap(spark, path)


def test_ingest_batch_heals_crashed_swap_instead_of_bootstrapping(
    spark, sf_dir, tmp_path
):
    """The ADVICE r7 medium: a delete/compact crash between the two
    renames leaves the store path absent with data stranded at
    __swap_tmp/__old. The next ingest_batch must HEAL the store and
    probe it — a bare existence check would bootstrap a brand-new
    store, permanently orphaning every pre-crash band, so duplicates
    of already-ingested docs would never be detected again."""
    import shutil

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table
    from sec_financial_pipeline_spark.streaming.ingest import ingest_batch

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    corpus = d.filter(F.col("doc_id") % 3 != 0)
    # the batch carries an EXACT clone of a corpus doc (new id, same
    # text): if the pre-crash store survives, the clone MUST pair with
    # its original — the cross-split duplicate a bootstrap would miss
    clone_src = corpus.orderBy("doc_id").limit(1).collect()[0]
    batch = d.filter(F.col("doc_id") % 3 == 0).unionByName(
        spark.createDataFrame(
            [(clone_src.doc_id + 100_000, clone_src.text)],
            "doc_id long, text string",
        )
    )
    store = str(tmp_path / "store")
    S.save_signature_store(
        S.minhash_signatures(corpus, "doc_id", "text"), "doc_id", store
    )
    # crash a compact between its two renames: full copy at __swap_tmp
    # (with _SUCCESS), nothing at path
    spark.read.parquet(store).coalesce(1).write.partitionBy("band_no").parquet(
        store + "__swap_tmp"
    )
    shutil.move(store, store + "__old")

    # expected pairs = probing the HEALED store (old corpus + batch)
    expect = S.incremental_candidate_pairs(
        S.minhash_signatures(batch, "doc_id", "text"),
        "doc_id",
        spark.read.parquet(store + "__swap_tmp"),
    ).collect()
    out = ingest_batch(batch, store, str(tmp_path / "pairs"))
    got = spark.read.parquet(str(tmp_path / "pairs")).collect()
    assert sorted((r.id_a, r.id_b) for r in got) == sorted(
        (r.id_a, r.id_b) for r in expect
    )
    # the planted clone pairs with its corpus original — proof the
    # pre-crash store was healed and probed, not orphaned
    assert (clone_src.doc_id, clone_src.doc_id + 100_000) in {
        (r.id_a, r.id_b) for r in got
    }
    corpus_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert out["batch_docs"] > 0
    # and the store now carries corpus + batch bands (healed, appended)
    n_docs = (
        spark.read.parquet(store).select("id").distinct().count()
    )
    assert n_docs > len(corpus_ids)


def test_writer_lease_contention_is_loud(spark, tmp_path):
    """A live lease held by ANOTHER writer (simulated by creating the
    lock marker directly — exactly what a second process's lease looks
    like to this one) makes compact fail fast with WriterContention,
    not interleave renames."""
    import pytest

    from sec_financial_pipeline_spark.sources.sink import (
        WriterContention,
        compact,
    )

    path = str(tmp_path / "ds")
    spark.range(100).withColumn("part", F.col("id") % 2).write.partitionBy(
        "part"
    ).parquet(path)
    with open(path + "__lock", "w") as f:
        f.write("pid=99999 t=0")
    with pytest.raises(WriterContention, match="single-writer"):
        compact(spark, path, partition_cols=("part",))
    os.remove(path + "__lock")
    assert compact(spark, path, partition_cols=("part",)) == 2
    assert not os.path.exists(path + "__lock")  # released on success


def test_writer_lease_breaks_stale_lease(spark, tmp_path):
    """A lease whose heartbeat mtime is older than the TTL belongs to a
    crashed writer — the next writer breaks it and proceeds."""
    import time

    from sec_financial_pipeline_spark.sources.sink import compact

    path = str(tmp_path / "ds")
    spark.range(50).write.parquet(path)
    lock = path + "__lock"
    with open(lock, "w") as f:
        f.write("pid=99999 t=0")
    stale = time.time() - 100_000
    os.utime(lock, (stale, stale))
    assert compact(spark, path) >= 1  # broke the stale lease, compacted
    assert spark.read.parquet(path).count() == 50


def test_concurrent_compacts_cannot_interleave(spark, tmp_path):
    """Two compacts racing the same store: the lease serializes them —
    the loser raises WriterContention (it never starts renaming), the
    winner completes, and the dataset stays healthy. Threads, not
    processes: the re-entrancy guard is per-thread, so two driver
    threads contend exactly like two processes."""
    import threading

    from sec_financial_pipeline_spark.sources.sink import (
        WriterContention,
        compact,
    )

    path = str(tmp_path / "ds")
    spark.range(10_000).withColumn("part", F.col("id") % 3).repartition(
        8
    ).write.partitionBy("part").parquet(path)

    barrier = threading.Barrier(2)
    results: list[str] = []

    def run():
        barrier.wait()
        try:
            compact(spark, path, partition_cols=("part",))
            results.append("ok")
        except WriterContention:
            results.append("contention")

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert "ok" in results  # somebody finished
    assert all(r in ("ok", "contention") for r in results)
    # dataset healthy: readable, full row count, no stranded siblings
    assert spark.read.parquet(path).count() == 10_000
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__lock")


def test_swap_rewrite_idempotent_finish_when_reader_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """ADVICE r7 low: a reader's recover_swap racing a healthy writer
    inside the between-renames window rolls __swap_tmp forward itself;
    the writer's second rename then returns False — which must be
    treated as the idempotent finish it is (path holds exactly the
    contents the writer was installing), not an IOError. The race is
    made deterministic by triggering the reader from inside the
    writer's first rename."""
    from sec_financial_pipeline_spark.sources import sink

    path = str(tmp_path / "ds")
    spark.range(10).withColumn("v", F.col("id") * 2).write.parquet(path)

    real_hfs = sink._hadoop_fs
    state = {"renames": 0}

    class RacingFS:
        def __init__(self, real):
            self._real = real

        def rename(self, src, dst):
            ok = self._real.rename(src, dst)
            state["renames"] += 1
            if state["renames"] == 1:
                # the racing reader: path is absent, tmp is complete ->
                # recover_swap rolls it forward (reader uses the REAL fs)
                monkeypatch.setattr(sink, "_hadoop_fs", real_hfs)
                assert sink.recover_swap(spark, path) == "forward"
                monkeypatch.setattr(sink, "_hadoop_fs", racing_hfs)
            return ok

        def __getattr__(self, name):
            return getattr(self._real, name)

    def racing_hfs(spark_, p):
        fs, Path = real_hfs(spark_, p)
        return RacingFS(fs), Path

    monkeypatch.setattr(sink, "_hadoop_fs", racing_hfs)
    new = spark.range(5).withColumn("v", F.col("id") * 3)
    sink.swap_rewrite(new, path)  # must NOT raise
    monkeypatch.setattr(sink, "_hadoop_fs", real_hfs)
    got = sorted(r.v for r in spark.read.parquet(path).collect())
    assert got == [0, 3, 6, 9, 12]  # the new contents, installed once
    assert not os.path.exists(path + "__swap_tmp")
    assert not os.path.exists(path + "__lock")


def test_lease_release_is_ownership_checked(spark, tmp_path):
    """An operation that outlived the TTL and had its lease broken must
    NOT delete the new holder's marker on exit — only a marker still
    carrying the releaser's own token is removed."""
    from sec_financial_pipeline_spark.sources.sink import (
        _hadoop_fs,
        writer_lease,
    )

    path = str(tmp_path / "ds")
    spark.range(10).write.parquet(path)
    lock = path + "__lock"
    fs, Path = _hadoop_fs(spark, path)
    with writer_lease(spark, path):
        # simulate: our lease aged out, another writer broke it and
        # re-claimed with its own token
        fs.delete(Path(lock), False)
        with open(lock, "w") as f:
            f.write("pid=42424 token=someone-elses t=0")
    # exit must have LEFT the other writer's marker in place
    assert os.path.exists(lock)
    assert "someone-elses" in open(lock).read()
    os.remove(lock)


def test_multi_writer_storm_serializes_and_loses_nothing(spark, tmp_path):
    """Lease torture: 6 threads hammer ONE store with interleaved
    appends and compacts, retrying on WriterContention. Whatever the
    interleaving, no append may be lost, no rename may interleave
    (dataset always readable), and no lock/sibling dirs may leak."""
    import threading

    from sec_financial_pipeline_spark.sources.sink import (
        WriterContention,
        append_partitioned,
        compact,
    )

    path = str(tmp_path / "store")
    spark.range(0, 100).select(
        "id", (F.col("id") % 4).alias("part")
    ).write.partitionBy("part").parquet(path)

    barrier = threading.Barrier(6)
    errors: list = []

    def with_retry(fn, attempts=60):
        for _ in range(attempts):
            try:
                fn()
                return
            except WriterContention:
                import time

                time.sleep(0.2)
        raise AssertionError("writer starved beyond retry budget")

    def appender(lo):
        try:
            barrier.wait()
            df = spark.range(lo, lo + 50).select(
                "id", (F.col("id") % 4).alias("part")
            )
            with_retry(lambda: append_partitioned(df, path, ("part",)))
        except Exception as e:
            errors.append(e)

    def compactor():
        try:
            barrier.wait()
            with_retry(lambda: compact(spark, path, 1, ("part",)))
        except Exception as e:
            errors.append(e)

    threads = [
        threading.Thread(target=appender, args=(lo,))
        for lo in (1000, 2000, 3000, 4000)
    ] + [threading.Thread(target=compactor) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    back = spark.read.parquet(path)
    assert back.count() == 100 + 4 * 50  # every append landed exactly once
    assert back.select("id").distinct().count() == 300
    assert not os.path.exists(path + "__lock")
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__swap_tmp")
