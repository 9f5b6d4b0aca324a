"""Partition evolution (sources/snaptable.py::set_partition_spec):
change the partition spec for future writes as a metadata-only commit,
Iceberg-style. Contract under test: reads mix layouts transparently
(each entry self-describes its layout), scan pruning stays an
over-approximation across specs, DML stays exact, streams/CDF treat
the spec commit as metadata-only, and compaction converges the layout."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.sources import snaptable as T


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 4).alias("p"),
        (F.col("id") % 3).alias("q"),
        (F.col("id") * 7).alias("v"),
    )


def _expected(lo, hi):
    return sorted((i, i % 4, i % 3, i * 7) for i in range(lo, hi))


def _got(spark, path, **kw):
    df = T.read(spark, path, **kw) if not kw.get("scan") else None
    return sorted(
        (r.id, r.p, r.q, r.v)
        for r in T.read(spark, path).select("id", "p", "q", "v").collect()
    )


def test_unpartitioned_to_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 40), path)
    v = T.set_partition_spec(spark, path, ("p",))
    assert v == 2
    T.append(_mk(spark, 40, 80), path)
    # new files landed in Hive layout, old stayed flat — reads agree
    m = T._manifest(spark, path, None)
    layouts = {bool(e.get("partition")) for e in m["files"]}
    assert layouts == {True, False}
    assert _got(spark, path) == _expected(0, 80)


def test_respec_between_partition_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 40), path, partition_cols=("p",))
    T.set_partition_spec(spark, path, ("q",))
    T.append(_mk(spark, 40, 80), path)
    assert _got(spark, path) == _expected(0, 80)
    # old files: p from dirs, q from data; new files: the reverse
    m = T._manifest(spark, path, None)
    old = [e for e in m["files"] if "p" in e.get("partition", {})]
    new = [e for e in m["files"] if "q" in e.get("partition", {})]
    assert old and new


def test_scan_prunes_current_spec_keeps_foreign(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 40), path, partition_cols=("p",))
    T.set_partition_spec(spark, path, ("q",))
    T.append(_mk(spark, 40, 80), path)
    m = T._manifest(spark, path, None)
    kept = T._select_entries(m, {"q": 1})
    # every old-spec entry kept (q unknown there), new-spec pruned to q=1
    n_old = sum(1 for e in m["files"] if "p" in e.get("partition", {}))
    assert sum(1 for e in kept if "p" in e.get("partition", {})) == n_old
    new_kept = [e for e in kept if "q" in e.get("partition", {})]
    assert new_kept and all(e["partition"]["q"] == "1" for e in new_kept)
    got = sorted(
        (r.id, r.q)
        for r in T.scan(spark, path, partitions={"q": 1})
        .select("id", "q").collect()
    )
    assert got == sorted((i, 1) for i in range(80) if i % 3 == 1)


def test_dml_exact_across_mixed_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 40), path, partition_cols=("p",))
    T.set_partition_spec(spark, path, ("q",))
    T.append(_mk(spark, 40, 80), path)
    T.delete_where(spark, path, "p = 2")  # old spec's column
    assert (
        sorted(r.id for r in T.read(spark, path).collect())
        == [i for i in range(80) if i % 4 != 2]
    )
    # merge on the old partition key: upserts land under the NEW spec
    patch = spark.range(100, 104).select(
        "id",
        (F.col("id") % 4).alias("p"),
        (F.col("id") % 3).alias("q"),
        F.lit(-1).cast("long").alias("v"),
    )
    T.merge_upsert(patch, path, key_cols=["id"])
    assert T.read(spark, path).filter("v = -1").count() == 4


def test_compact_converges_to_current_spec(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 40), path, partition_cols=("p",))
    T.set_partition_spec(spark, path, ("q",))
    T.append(_mk(spark, 40, 80), path)
    T.compact(spark, path, target_files=1)
    m = T._manifest(spark, path, None)
    assert all(set(e["partition"]) == {"q"} for e in m["files"])
    assert _got(spark, path) == _expected(0, 80)


def test_validation_noop_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 10), path, partition_cols=("p",))
    with pytest.raises(ValueError, match="not a table column"):
        T.set_partition_spec(spark, path, ("nope",))
    assert T.set_partition_spec(spark, path, ("p",)) == 1  # no-op
    v = T.set_partition_spec(spark, path, ())
    assert v == 2
    T.append(_mk(spark, 10, 20), path)
    # time travel: v1 still reports the old spec and its rows
    m1 = T._manifest(spark, path, 1)
    assert list(m1["partition_cols"]) == ["p"]
    assert T.read(spark, path, version=1).count() == 10
    assert _got(spark, path) == _expected(0, 20)


def test_update_partition_column_after_respec(spark, tmp_path):
    """Directed worst case: evolve to partition on v, then UPDATE v
    itself — rewritten rows must land in their NEW partition dirs and
    reads stay exact across the mixed layout; a rollback then restores
    the pre-update contents."""
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 30), path)
    T.set_partition_spec(spark, path, ("v",))
    T.append(_mk(spark, 30, 40), path)
    v_before = T._manifest(spark, path, None)["version"]
    T.update_where(spark, path, "id % 10 = 0", {"v": "v + 1"})
    want = {
        i: i * 7 + (1 if i % 10 == 0 else 0) for i in range(40)
    }
    assert {r.id: r.v for r in T.read(spark, path).collect()} == want
    # updated rows live under their new v= dirs
    m = T._manifest(spark, path, None)
    moved = [
        e for e in m["files"]
        if e.get("partition", {}).get("v") in {"1", "71", "141", "211"}
    ]
    assert moved
    T.rollback(spark, path, to_version=v_before)
    assert {r.id: r.v for r in T.read(spark, path).collect()} == {
        i: i * 7 for i in range(40)
    }


def test_spec_commit_is_metadata_only_for_feeds(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create(_mk(spark, 0, 20), path)
    v_spec = T.set_partition_spec(spark, path, ("p",))
    T.append(_mk(spark, 20, 30), path)
    # incremental read across the spec commit: only the appended rows
    inc = T.read_increment(spark, path, since_version=1)
    assert sorted(r.id for r in inc.collect()) == list(range(20, 30))
    # change feed: the spec version contributes zero change rows
    feed = T.change_feed(spark, path, since_version=1)
    by_v = {
        r["_commit_version"]: r["n"]
        for r in feed.groupBy("_commit_version").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert v_spec not in by_v
    assert by_v.get(v_spec + 1) == 10