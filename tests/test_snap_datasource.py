"""Spark 4 Python DataSource over snaptable
(sources/snap_datasource.py): format("snaptable") batch reads with
time travel + deletion vectors, and the Structured Streaming source
with version offsets, checkpointed exactly-once resume, maintenance
invisibility and Delta-style skipChangeCommits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.sources import snaptable as T
from sec_financial_pipeline_spark.sources.snap_datasource import (
    register_snaptable_source,
)


@pytest.fixture()
def snapds(spark):
    register_snaptable_source(spark)
    return spark


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def _drain(spark, path, name, checkpoint, **opts):
    reader = spark.readStream.format("snaptable")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(path)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _drain_to_parquet(spark, path, outdir, checkpoint, **opts):
    """Resumable drain: the memory sink cannot recover from a
    checkpoint, the file sink can — so exactly-once RESUME tests go
    through parquet and read the cumulative output back."""
    reader = spark.readStream.format("snaptable")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(path)
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return spark.read.parquet(outdir)
    except Exception:  # zero batches ever written
        return spark.createDataFrame([], "id bigint, v bigint")


def test_batch_read_matches_native_with_dv_and_time_travel(snapds, tmp_path):
    spark = snapds
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 100), path)
    T.append(_mk(spark, 100, 150), path)
    T.delete_where(spark, path, "id % 10 = 3", mode="dv")
    df = spark.read.format("snaptable").load(path)
    assert sorted(tuple(r) for r in df.collect()) == sorted(
        tuple(r) for r in T.read(spark, path).collect()
    )
    assert df.count() == 135
    # time travel via option
    assert (
        spark.read.format("snaptable").option("version", "1").load(path).count()
        == 100
    )


def test_batch_read_partitioned_with_special_chars_and_nulls(snapds, tmp_path):
    """Hive partition values (incl. %-escaped and NULL) are attached
    as typed constants from the manifest — the file itself lacks the
    column."""
    spark = snapds
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a:b"), (2, None), (3, "plain"), (4, "a:b")],
        "id bigint, p string",
    )
    T.create(df, path, partition_cols=("p",))
    got = spark.read.format("snaptable").load(path)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in T.read(spark, path).collect()
    )
    assert got.filter(F.col("p") == "a:b").count() == 2
    assert got.filter(F.col("p").isNull()).count() == 1


def test_stream_tails_appends_with_exactly_once_resume(snapds, tmp_path):
    """availableNow drains the history; after more appends a SECOND
    run from the same checkpoint ships ONLY the new rows (version
    offsets are durable); a compact between runs contributes nothing."""
    spark = snapds
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    T.create(_mk(spark, 0, 50), path)
    T.append(_mk(spark, 50, 80), path)
    out = _drain_to_parquet(spark, path, out_dir, ckpt)
    assert sorted(r.id for r in out.collect()) == list(range(80))
    # maintenance + new appends; resume must ship exactly 80..100
    T.compact(spark, path, target_files=1)
    T.append(_mk(spark, 80, 100), path)
    out2 = _drain_to_parquet(spark, path, out_dir, ckpt)
    ids = sorted(r.id for r in out2.collect())
    assert ids == list(range(100)), "exactly-once: no dup, no loss"
    # third run with nothing new: no new rows, no error
    out3 = _drain_to_parquet(spark, path, out_dir, ckpt)
    assert out3.count() == 100


def test_stream_fails_loud_on_rewrite_unless_skipped(snapds, tmp_path):
    spark = snapds
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 50), path)
    T.delete_where(spark, path, "id < 5")  # row-changing rewrite (cow)
    T.append(_mk(spark, 50, 60), path)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="row-changing"):
        q = (
            spark.readStream.format("snaptable")
            .load(path)
            .writeStream.format("memory")
            .queryName("snapds_fail")
            .option("checkpointLocation", str(tmp_path / "c1"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    # skipChangeCommits: the rewrite commit is skipped entirely; the
    # stream ships the create (pre-delete rows) and the append
    out = _drain(
        spark, path, "snapds_skip", str(tmp_path / "c2"),
        skipChangeCommits="true",
    )
    assert sorted(r.id for r in out.collect()) == list(range(60))


def test_stream_starting_version_latest(snapds, tmp_path):
    """startingVersion=latest consumes only commits after stream
    start — the tail-from-now mode."""
    spark = snapds
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    T.create(_mk(spark, 0, 50), path)
    out = _drain_to_parquet(
        spark, path, out_dir, ckpt, startingVersion="latest"
    )
    assert out.count() == 0
    T.append(_mk(spark, 50, 70), path)
    out2 = _drain_to_parquet(
        spark, path, out_dir, ckpt, startingVersion="latest"
    )
    assert sorted(r.id for r in out2.collect()) == list(range(50, 70))


def test_stream_dv_append_only_history_includes_sidecar_free_files(
    snapds, tmp_path
):
    """Appends AFTER a dv-delete (skipped via skipChangeCommits) ship
    clean; the dv'd file's rows stream as appended at their append
    version (pre-delete content — streaming replays history, exactly
    like Delta)."""
    spark = snapds
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 40), path)
    T.delete_where(spark, path, "id = 1", mode="dv")
    T.append(_mk(spark, 40, 50), path)
    out = _drain(
        spark, path, "snapds_dv", str(tmp_path / "c"),
        skipChangeCommits="true",
    )
    assert sorted(r.id for r in out.collect()) == list(range(50))


# ------------------------------------------------------------- writers


def test_batch_writer_create_append_overwrite(snapds, tmp_path):
    spark = snapds
    path = str(tmp_path / "t")
    _mk(spark, 0, 50).write.format("snaptable").mode("append").save(path)
    assert T.read(spark, path).count() == 50
    assert T.versions(spark, path) == [1]
    _mk(spark, 50, 70).write.format("snaptable").mode("append").save(path)
    assert sorted(r.id for r in T.read(spark, path).collect()) == list(range(70))
    _mk(spark, 0, 5).write.format("snaptable").mode("overwrite").save(path)
    assert T.read(spark, path).count() == 5
    # snapshot history: the overwrite is a version, not an erasure
    assert T.versions(spark, path) == [1, 2, 3]
    assert T.read(spark, path, version=2).count() == 70
    # manifest stats landed (arrow-side min/max)
    m = T._manifest(spark, path, None)
    assert all(e["stats"].get("id") for e in m["files"])


def test_batch_writer_schema_mismatch_is_loud(snapds, tmp_path):
    spark = snapds
    path = str(tmp_path / "t")
    _mk(spark, 0, 10).write.format("snaptable").mode("append").save(path)
    bad = spark.createDataFrame([(1, "x")], "id bigint, other string")
    import pytest as _pytest

    with _pytest.raises(Exception, match="schema mismatch"):
        bad.write.format("snaptable").mode("append").save(path)
    assert T.read(spark, path).count() == 10


def test_batch_writer_refuses_constrained_table(snapds, tmp_path):
    """The session-free writer cannot evaluate SQL CHECK expressions —
    it must refuse, not skip enforcement."""
    spark = snapds
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 10), path)
    T.add_constraint(spark, path, "v_nonneg", "v >= 0")
    import pytest as _pytest

    with _pytest.raises(Exception, match="CHECK"):
        _mk(spark, 10, 20).write.format("snaptable").mode("append").save(path)
    assert T.read(spark, path).count() == 10


def test_stream_writer_exactly_once_table_to_table(snapds, tmp_path):
    """snaptable -> snaptable streaming pipeline: version offsets on
    the read side, epoch txns on the write side; a resumed
    availableNow run ships only the new appends, and a replayed epoch
    commits nothing twice."""
    spark = snapds
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    T.create(_mk(spark, 0, 30), src)

    def run():
        q = (
            spark.readStream.format("snaptable").load(src)
            .writeStream.format("snaptable").option("path", dst)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run()
    assert sorted(r.id for r in T.read(spark, dst).collect()) == list(range(30))
    assert T.last_txn(spark, dst, "snapds-write") == 0
    T.append(_mk(spark, 30, 40), src)
    run()
    assert sorted(r.id for r in T.read(spark, dst).collect()) == list(range(40))
    # nothing new: a third run must not duplicate or error
    run()
    assert T.read(spark, dst).count() == 40


# ----------------------------------------------------- filter pushdown


def test_option_filters_prune_files_results_stay_exact(snapds, tmp_path):
    """Load-option predicates (filter.eq / filter.between) shrink the
    planned file set via manifest metadata (partition values, min/max
    stats) AND are applied exactly per row — the cache-safe
    replacement for pushFilters pruning."""
    import json as _json

    from sec_financial_pipeline_spark.sources.snap_datasource import (
        SnapBatchReader,
    )

    spark = snapds
    path = str(tmp_path / "t")
    df = spark.range(0, 4000).select(
        "id", (F.col("id") % 4).alias("p"), (F.col("id") * 2).alias("v")
    )
    T.create(df.repartitionByRange(4, "id"), path)

    # range option: id >= 3500 lives in the last range file
    total = len(SnapBatchReader(path, {}, T.read(spark, path).schema).partitions())
    rd = SnapBatchReader(
        path,
        {"filter.between": _json.dumps([["id", 3500, None]])},
        T.read(spark, path).schema,
    )
    assert len(rd.partitions()) < total
    got = (
        spark.read.format("snaptable")
        .option("filter.between", _json.dumps([["id", 3500, None]]))
        .load(path)
    )
    assert got.count() == 500  # rows EXACTLY filtered, not a superset
    assert got.agg(F.min("id")).collect()[0][0] == 3500

    # partitioned table: equality option on the partition column
    p2 = str(tmp_path / "t2")
    T.create(df, p2, partition_cols=("p",))
    t2 = len(SnapBatchReader(p2, {}, T.read(spark, p2).schema).partitions())
    rd2 = SnapBatchReader(
        p2, {"filter.eq": _json.dumps({"p": 2})}, T.read(spark, p2).schema
    )
    assert len(rd2.partitions()) < t2
    got2 = (
        spark.read.format("snaptable")
        .option("filter.eq", _json.dumps({"p": 2}))
        .load(p2)
    )
    native = T.read(spark, p2).filter(F.col("p") == 2)
    assert sorted(r.id for r in got2.collect()) == sorted(
        r.id for r in native.collect()
    )


def test_option_filter_bloom_point_probe(snapds, tmp_path):
    """A filter.eq probe on a bloom-indexed column prunes through the
    sidecars with zero false negatives."""
    import json as _json

    from sec_financial_pipeline_spark.sources.snap_datasource import (
        SnapBatchReader,
    )

    spark = snapds
    path = str(tmp_path / "t")
    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 997).alias("v")
    )
    T.create(df.repartition(16), path)
    T.add_bloom_index(spark, path, "doc_id", bits=1 << 18)
    total = len(SnapBatchReader(path, {}, T.read(spark, path).schema).partitions())
    rd = SnapBatchReader(
        path,
        {"filter.eq": _json.dumps({"doc_id": 12345})},
        T.read(spark, path).schema,
    )
    assert len(rd.partitions()) < total  # bloom actually skipped files
    got = (
        spark.read.format("snaptable")
        .option("filter.eq", _json.dumps({"doc_id": 12345}))
        .load(path)
        .collect()
    )
    assert [r.doc_id for r in got] == [12345]


def test_no_stale_pruning_across_queries_on_same_dataframe(
    snapds, tmp_path
):
    """Regression for the Spark 4.1.2 readInfo-cache hazard that made
    us remove pushFilters: a filtered action followed by an UNFILTERED
    aggregate on the SAME loaded DataFrame must see every row (with
    pushFilters pruning, the second query silently reused the first
    query's pruned partition list)."""
    spark = snapds
    path = str(tmp_path / "t")
    T.create(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "a bigint, v double"
        ).coalesce(1),
        path,
    )
    T.append(
        spark.createDataFrame([(1000, 1.0)], "a bigint, v double"), path
    )
    got = spark.read.format("snaptable").load(path)
    assert got.filter(F.col("a") == 1000).count() == 1
    assert got.agg(F.sum("a")).collect()[0][0] == 45 + 1000  # ALL files
    assert got.filter(F.col("a") == 3).count() == 1
    assert got.count() == 11


def test_stream_skips_constraint_commits(snapds, tmp_path):
    """A metadata-only constraint commit changes no rows — the stream
    must pass over it, not die."""
    spark = snapds
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    T.create(_mk(spark, 0, 20), path)
    T.add_constraint(spark, path, "v_nonneg", "v >= 0")
    T.append(_mk(spark, 20, 30), path)
    T.drop_constraint(spark, path, "v_nonneg")
    out = _drain_to_parquet(spark, path, out_dir, ckpt)
    assert sorted(r.id for r in out.collect()) == list(range(30))


def test_max_versions_per_trigger_bounds_batches(snapds, tmp_path):
    """maxVersionsPerTrigger: after the first (uncapped) trigger, each
    micro-batch advances at most K versions — a long-history backfill
    proceeds in bounded steps instead of one giant batch."""
    from sec_financial_pipeline_spark.sources.snap_datasource import (
        SnapStreamReader,
    )

    spark = snapds
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 10), path)
    for i in range(1, 6):
        T.append(_mk(spark, 10 * i, 10 * i + 10), path)  # head = 6
    rd = SnapStreamReader(
        path, {"maxVersionsPerTrigger": "2"}, T.read(spark, path).schema
    )
    assert rd.initialOffset() == {"version": 0}
    # first trigger: uncapped (restart-safety — the reader cannot know
    # the checkpointed position)
    assert rd.latestOffset() == {"version": 6}
    rd.commit({"version": 2})
    assert rd.latestOffset() == {"version": 4}
    rd.commit({"version": 4})
    assert rd.latestOffset() == {"version": 6}
    rd.commit({"version": 6})
    assert rd.latestOffset() == {"version": 6}  # caught up, capped at head
    # end-to-end: the capped stream still drains everything
    out = _drain_to_parquet(
        spark, path, str(tmp_path / "out"), str(tmp_path / "ck"),
        maxVersionsPerTrigger="2",
    )
    assert sorted(r.id for r in out.collect()) == sorted(
        list(range(10)) + [10 * i + j for i in range(1, 6) for j in range(10)]
    )


def test_stream_composes_with_watermark_window_agg(snapds, tmp_path):
    """The source composes with event-time machinery: watermark +
    tumbling-window aggregation over streamed table rows."""
    spark = snapds
    path = str(tmp_path / "t")
    df = spark.range(0, 120).select(
        F.col("id"),
        F.to_timestamp(
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id") * 30)
        ).alias("ts"),
    )
    T.create(df, path)
    q = (
        spark.readStream.format("snaptable").load(path)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory").queryName("snapds_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT n FROM snapds_win").collect()
    assert sorted(r.n for r in rows) == [20, 20, 20, 20, 20, 20]


def test_read_change_feed_streaming(snapds, tmp_path):
    """readChangeFeed=true: appends stream as tagged inserts, DMLs
    committed with cdf=True stream their persisted sidecars — the full
    per-commit change feed as a Structured Streaming source."""
    spark = snapds
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 20), path)                      # v1
    T.delete_where(spark, path, "id < 3", cdf=True)        # v2
    T.update_where(spark, path, "id = 5", {"v": "v + 100"},
                   cdf=True)                               # v3
    T.compact(spark, path, target_files=1)                 # v4 silent
    T.append(_mk(spark, 20, 25), path)                     # v5
    q = (
        spark.readStream.format("snaptable")
        .option("readChangeFeed", "true").load(path)
        .writeStream.format("memory").queryName("snapds_cdf")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM snapds_cdf").collect()
    by_v = {}
    for r in rows:
        by_v.setdefault(r._commit_version, []).append(r)
    assert sorted(by_v) == [1, 2, 3, 5]
    assert len(by_v[1]) == 20
    assert all(r._change_type == "insert" for r in by_v[1])
    assert sorted(r.id for r in by_v[2]) == [0, 1, 2]
    assert all(r._change_type == "delete" for r in by_v[2])
    assert sorted((r._change_type, r.v) for r in by_v[3]) == [
        ("delete", 10), ("insert", 110)]
    assert sorted(r.id for r in by_v[5]) == [20, 21, 22, 23, 24]


def test_read_change_feed_fails_without_sidecar(snapds, tmp_path):
    spark = snapds
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 10), path)
    T.delete_where(spark, path, "id = 1")  # no cdf sidecar
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="cdf=True"):
        q = (
            spark.readStream.format("snaptable")
            .option("readChangeFeed", "true").load(path)
            .writeStream.format("memory").queryName("snapds_cdf_fail")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)


def test_timestamp_as_of_batch_read(snapds, tmp_path):
    """Delta's TIMESTAMP AS OF on the datasource surface: resolve the
    version current at the instant, including its SCHEMA (a
    pre-evolution snapshot must not surface post-evolution columns)."""
    import time as _time

    path = str(tmp_path / "t")
    T.create(_mk(snapds, 0, 10), path)
    t1 = T._manifest(snapds, path, 1)["committed_at"]
    _time.sleep(1.1)
    T.evolve_schema(snapds, path, [("score", "double")])
    T.append(
        _mk(snapds, 10, 20).withColumn("score", F.lit(0.5)), path
    )
    old = (
        snapds.read.format("snaptable")
        .option("timestampAsOf", str(t1)).load(path)
    )
    assert old.count() == 10 and "score" not in old.columns
    head = snapds.read.format("snaptable").load(path)
    assert head.count() == 20 and "score" in head.columns
    with pytest.raises(Exception, match="not both"):
        (
            snapds.read.format("snaptable")
            .option("timestampAsOf", str(t1)).option("version", "1")
            .load(path).count()
        )
    with pytest.raises(Exception, match="at or before"):
        (
            snapds.read.format("snaptable")
            .option("timestampAsOf", "2001-01-01").load(path).count()
        )


def test_starting_timestamp_streams_from_the_instant(snapds, tmp_path):
    """Delta's startingTimestamp: commits AT or AFTER the instant
    stream; earlier history does not."""
    import time as _time

    spark = snapds
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 10), path)          # v1 (history)
    _time.sleep(1.1)
    T.append(_mk(spark, 10, 20), path)          # v2 (at/after instant)
    t2 = T._manifest(spark, path, 2)["committed_at"]
    T.append(_mk(spark, 20, 30), path)          # v3
    got = _drain(
        spark, path, "st_ts", str(tmp_path / "cp"),
        startingTimestamp=str(t2),
    )
    assert sorted(r.id for r in got.collect()) == list(range(10, 30))
    # an instant before all history streams everything
    got_all = _drain(
        spark, path, "st_ts_all", str(tmp_path / "cp2"),
        startingTimestamp="2001-01-01",
    )
    assert got_all.count() == 30
    with pytest.raises(Exception, match="not both"):
        _drain(
            spark, path, "st_ts_bad", str(tmp_path / "cp3"),
            startingTimestamp=str(t2), startingVersion="1",
        )


def test_option_filter_eq_bool_and_float_probes_stay_exact(snapds, tmp_path):
    """Probe types whose Python str() differs from Spark's partition-dir
    rendering must not dir-prune matching files away: booleans map to
    the lowercase dir form, floats skip dir pruning entirely (the exact
    per-row re-check still applies)."""
    import json as _json

    spark = snapds
    path = str(tmp_path / "tb")
    T.create(
        spark.range(0, 100).select(
            "id", (F.col("id") % 2 == 0).alias("flag")
        ),
        path,
        partition_cols=("flag",),
    )
    got = (
        spark.read.format("snaptable")
        .option("filter.eq", _json.dumps({"flag": True}))
        .load(path)
    )
    assert got.count() == 50
    assert all(r.flag for r in got.collect())

    pf = str(tmp_path / "tf")
    T.create(
        spark.range(0, 100).select("id", (F.col("id") % 5).alias("p")),
        pf,
        partition_cols=("p",),
    )
    # float probe of a bigint partition: str(2.0)='2.0' never equals
    # dir '2' — dir pruning must not fire; rows come back exact
    got2 = (
        spark.read.format("snaptable")
        .option("filter.eq", _json.dumps({"p": 2.0}))
        .load(pf)
    )
    assert sorted(r.id for r in got2.collect()) == [
        i for i in range(100) if i % 5 == 2
    ]
