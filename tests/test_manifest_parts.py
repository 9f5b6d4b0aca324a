"""Iceberg-style manifest lists (sources/snaptable.py): commits past
_SPLIT_THRESHOLD entries store them in summary-pruned part files. The
contract under test: (1) the dict shape consumers see is unchanged —
every reader, DML op, and the datasource work identically on a parts
table; (2) part pruning is an over-approximation (a kept part may hold
non-matching entries, a pruned part NEVER holds a matching one);
(3) vacuum reaps orphaned parts and never a referenced one."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.sources import snaptable as T
from sec_financial_pipeline_spark.sources.snap_datasource import (
    register_snaptable_source,
)


@pytest.fixture
def small_split(monkeypatch):
    """Force the manifest-list form at toy entry counts."""
    monkeypatch.setattr(T, "_SPLIT_THRESHOLD", 6)
    monkeypatch.setattr(T, "_PART_TARGET", 4)
    yield


def _mk(spark, n=200, parts=8):
    return (
        spark.range(n)
        .select(
            "id",
            (F.col("id") % parts).alias("p"),
            (F.col("id") * 3).alias("v"),
        )
        .repartition(4)
    )


def _head_raw(path):
    vs = sorted(glob.glob(os.path.join(path, "_snapshots", "v*.json")))
    with open(vs[-1], "r", encoding="utf-8") as f:
        return json.load(f)


def test_large_commit_writes_parts_and_reads_back(spark, tmp_path, small_split):
    path = str(tmp_path / "t")
    T.create(_mk(spark), path, partition_cols=("p",))
    raw = _head_raw(path)
    assert "files" not in raw and len(raw["files_parts"]) >= 2
    for p in raw["files_parts"]:
        assert os.path.exists(os.path.join(path, "_snapshots", p["ref"]))
        assert p["n"] >= 1
    got = sorted(r.v for r in T.read(spark, path).collect())
    assert got == [3 * i for i in range(200)]


def test_small_commit_stays_inline(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create(spark.range(10).select("id"), path)
    raw = _head_raw(path)
    assert "files" in raw and "files_parts" not in raw


def test_scan_partition_probe_loads_fewer_parts(spark, tmp_path, small_split):
    path = str(tmp_path / "t")
    T.create(_mk(spark), path, partition_cols=("p",))
    raw = _head_raw(path)
    kept = T._prune_part_summaries(raw["files_parts"], {"p": 3}, [])
    # partition-coherent chunking: the probe must drop whole parts
    assert 0 < len(kept) < len(raw["files_parts"])
    # over-approximation: every entry for p=3 lives in a KEPT part
    df = T.scan(spark, path, partitions={"p": 3})
    assert sorted(r.id for r in df.collect()) == [
        i for i in range(200) if i % 8 == 3
    ]


def test_scan_stats_range_prunes_parts(spark, tmp_path, small_split):
    path = str(tmp_path / "t")
    # range-clustered files so per-part id ranges are disjoint
    df = spark.range(200).select("id", (F.col("id") * 3).alias("v"))
    T.create(df.repartitionByRange(16, "id"), path)
    raw = _head_raw(path)
    kept = T._prune_part_summaries(
        raw["files_parts"], None, [("id", 5, 10)]
    )
    assert 0 < len(kept) < len(raw["files_parts"])
    got = sorted(r.id for r in T.scan(spark, path, between=("id", 5, 10)).collect())
    assert got == list(range(5, 11))


def test_part_summary_unknown_means_keep():
    # a column missing from ANY entry is dropped from the summary; a
    # probe on it can then never prune the part (stays an optimization)
    chunk = [
        {"path": "a", "partition": {"p": "1"}, "stats": {"id": [0, 5]}},
        {"path": "b", "partition": {}, "stats": {}},
    ]
    s = T._part_summary(chunk)
    assert "p" not in s.get("partitions", {})
    assert "id" not in s.get("stats", {})
    assert T._prune_part_summaries([s], {"p": "9"}, [("id", 99, 99)]) == [s]


def test_part_summary_vals_cap(monkeypatch):
    monkeypatch.setattr(T, "_PART_VALS_CAP", 3)
    chunk = [
        {"path": str(i), "partition": {"p": str(i)}, "stats": {}}
        for i in range(5)
    ]
    s = T._part_summary(chunk)
    assert "partitions" not in s  # over cap -> unknown -> keep
    chunk_null = [
        {"path": "x", "partition": {"p": None}, "stats": {}},
        {"path": "y", "partition": {"p": "a"}, "stats": {}},
    ]
    s2 = T._part_summary(chunk_null)
    assert s2["partitions"]["p"] == ["a", None]
    # a null probe matches the null-listing part, prunes a non-null one
    assert T._prune_part_summaries([s2], {"p": None}, []) == [s2]
    assert T._prune_part_summaries([s], {"p": None}, []) == [s]


def test_dml_and_maintenance_on_parts_table(spark, tmp_path, small_split):
    path = str(tmp_path / "t")
    T.create(_mk(spark), path, partition_cols=("p",))
    v = T.delete_where(spark, path, "id < 20")
    assert T.read(spark, path).count() == 180
    T.append(_mk(spark).filter("id < 20"), path)
    assert T.read(spark, path).count() == 200
    # time travel across forms
    assert T.read(spark, path, version=v).count() == 180
    # compact: still one file per partition (8 > threshold 6), so the
    # head legitimately stays in manifest-list form — and reads fine
    T.compact(spark, path, target_files=1)
    assert sorted(r.v for r in T.read(spark, path).collect()) == [
        3 * i for i in range(200)
    ]
    # an unpartitioned table compacted below the threshold flips back
    p2 = str(tmp_path / "t2")
    T.create(spark.range(40).select("id").repartition(8), p2)
    assert "files_parts" in _head_raw(p2)
    T.compact(spark, p2, target_files=2)
    raw2 = _head_raw(p2)
    assert "files" in raw2 and "files_parts" not in raw2
    assert T.read(spark, p2).count() == 40


def test_rollback_resplits_and_matches(spark, tmp_path, small_split):
    path = str(tmp_path / "t")
    T.create(_mk(spark), path, partition_cols=("p",))
    T.delete_where(spark, path, "id >= 100")
    T.rollback(spark, path, to_version=1)
    assert T.read(spark, path).count() == 200
    assert "files_parts" in _head_raw(path)


def test_vacuum_reaps_orphan_parts_keeps_referenced(
    spark, tmp_path, small_split
):
    path = str(tmp_path / "t")
    T.create(_mk(spark), path, partition_cols=("p",))
    T.delete_where(spark, path, "id < 50")  # v2: new parts, v1's orphan
    orphan = os.path.join(path, "_snapshots", "parts", "m-deadbeef.json")
    with open(orphan, "w", encoding="utf-8") as f:
        json.dump({"entries": []}, f)
    n = T.vacuum(spark, path, keep_last=1, min_age_sec=0.0)
    assert n > 0
    assert not os.path.exists(orphan)
    live = _head_raw(path)["files_parts"]
    for p in live:
        assert os.path.exists(os.path.join(path, "_snapshots", p["ref"]))
    assert T.read(spark, path).count() == 150
    # age guard: fresh unreferenced parts survive a default-age vacuum
    with open(orphan, "w", encoding="utf-8") as f:
        json.dump({"entries": []}, f)
    T.vacuum(spark, path, keep_last=1)
    assert os.path.exists(orphan)


def test_datasource_reads_parts_table(spark, tmp_path, small_split):
    register_snaptable_source(spark)
    path = str(tmp_path / "t")
    T.create(_mk(spark, n=60, parts=4), path, partition_cols=("p",))
    got = (
        spark.read.format("snaptable").load(path)
        .select("id").orderBy("id").collect()
    )
    assert [r.id for r in got] == list(range(60))


def test_datasource_writer_splits(spark, tmp_path, small_split):
    # splitThreshold is a writer OPTION (the commit may run in a
    # separate Python worker, out of monkeypatch's reach)
    register_snaptable_source(spark)
    path = str(tmp_path / "t")
    (
        spark.range(50).select("id", (F.col("id") * 2).alias("v"))
        .repartition(8)
        .write.format("snaptable").mode("append")
        .option("splitThreshold", "4").save(path)
    )
    raw = _head_raw(path)
    assert "files_parts" in raw
    # datasource-written entries carry exact row counts (count_rows
    # stays metadata-only across writer surfaces)
    assert T.count_rows(spark, path) == 50
    got = sorted(
        r.v for r in spark.read.format("snaptable").load(path).collect()
    )
    assert got == [2 * i for i in range(50)]
    # and the JVM-native reader agrees
    assert T.read(spark, path).count() == 50


def test_datasource_pushdown_over_parts_table(spark, tmp_path, small_split):
    """The interop reader mirrors the native scan's manifest-list fast
    path: pushed filters prune part summaries before any part loads,
    and Spark's residual re-apply keeps results exact."""
    register_snaptable_source(spark)
    path = str(tmp_path / "t")
    T.create(_mk(spark, n=120, parts=6), path, partition_cols=("p",))
    assert "files_parts" in _head_raw(path)
    df = spark.read.format("snaptable").load(path).filter("p = 2")
    got = sorted(r.id for r in df.collect())
    assert got == [i for i in range(120) if i % 6 == 2]
    # range pushdown over footer stats, same table
    df2 = spark.read.format("snaptable").load(path).filter("id < 10")
    assert sorted(r.id for r in df2.collect()) == list(range(10))


def test_parts_with_partition_evolution_and_dml(spark, tmp_path, small_split):
    """Integration: manifest-list form + spec evolution + DML + pruned
    scan + scan-time travel (as_of) all compose."""
    import time as _time

    path = str(tmp_path / "t")
    T.create(_mk(spark, n=120, parts=6), path, partition_cols=("p",))
    t1 = T._manifest(spark, path, 1)["committed_at"]
    _time.sleep(1.1)
    T.set_partition_spec(spark, path, ("v",))
    T.delete_where(spark, path, "id >= 100")
    assert "files_parts" in _head_raw(path)
    got = sorted(
        r.id for r in T.scan(spark, path, partitions={"p": 2}).collect()
    )
    assert got == [i for i in range(100) if i % 6 == 2]
    # scan-level TIMESTAMP AS OF resolves the pre-evolution snapshot
    old = T.scan(spark, path, partitions={"p": 2}, as_of=t1)
    assert sorted(r.id for r in old.collect()) == [
        i for i in range(120) if i % 6 == 2
    ]


def test_parts_cache_hits_and_stays_correct(spark, tmp_path, small_split):
    """Parts are immutable uuid-named files, so _load_parts memoizes the
    parse per process (VERDICT r9 item 5). The cache must be invisible:
    same entries back on a warm load, new versions' new refs load fresh,
    and reads after DML reflect the new head (its parts have new uuids,
    so stale cache slots are simply never asked for again)."""
    path = str(tmp_path / "t")
    with T._PARTS_CACHE_LOCK:
        T._PARTS_CACHE.clear()
        T._parts_cache_total = 0
    T.create(_mk(spark, n=40, parts=4), path, partition_cols=("p",))
    refs1 = [p["ref"] for p in _head_raw(path)["files_parts"]]
    cold = T._load_parts(spark, path, refs1)
    assert {r for r in (f"{path}/_snapshots/{x}" for x in refs1)} <= set(
        T._PARTS_CACHE
    )
    warm = T._load_parts(spark, path, refs1)
    assert warm == cold  # value-identical on a warm load
    # DML commits a new version with NEW part refs; the read path must
    # see the new head, cache or no cache
    T.delete_where(spark, path, "id >= 20")
    assert sorted(r.id for r in T.read(spark, path).collect()) == list(
        range(20)
    )
    refs2 = [p["ref"] for p in _head_raw(path)["files_parts"]]
    assert set(refs2).isdisjoint(refs1)


def test_parts_cache_budget_evicts_lru(spark, tmp_path, small_split, monkeypatch):
    """The entry-count budget evicts least-recently-used parts; the
    running total stays consistent with the dict contents."""
    with T._PARTS_CACHE_LOCK:
        T._PARTS_CACHE.clear()
        T._parts_cache_total = 0
    monkeypatch.setattr(T, "_PARTS_CACHE_BUDGET", 10)
    path = str(tmp_path / "t")
    T.create(_mk(spark, n=48, parts=4), path, partition_cols=("p",))
    refs = [p["ref"] for p in _head_raw(path)["files_parts"]]
    got = T._load_parts(spark, path, refs)
    assert len(got) == len({e["path"] for e in got})
    with T._PARTS_CACHE_LOCK:
        total = sum(len(v) for v in T._PARTS_CACHE.values())
        assert total == T._parts_cache_total
        assert total <= max(10, max(len(v) for v in T._PARTS_CACHE.values()))
    # a second pass still returns every entry despite evictions
    again = T._load_parts(spark, path, refs)
    assert sorted(e["path"] for e in again) == sorted(e["path"] for e in got)
