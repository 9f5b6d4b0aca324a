"""Named snapshot tags (sources/snaptable.py::tag) — Iceberg-style
pins: resolvable by name, create-once (re-point = delete + re-tag),
and RETAINED BY VACUUM regardless of keep_last, which is the property
that makes a release/audit pin operationally real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sec_financial_pipeline_spark.sources.snaptable as T


def _mk(spark, path, n_commits=3):
    T.create(spark.range(10).select("id"), path)
    for k in range(1, n_commits):
        T.append(
            spark.range(10 * (k + 1) - 10 + 10, 10 * (k + 1) + 10 - 10
                        ).select("id"),
            path,
        )


def test_tag_resolve_read_and_delete(spark, tmp_path):
    p = str(tmp_path / "t")
    T.create(spark.range(10).select("id"), p)
    T.append(spark.range(10, 30).select("id"), p)
    v = T.tag(spark, p, "release-1", version=1)
    assert v == 1 and T.tags(spark, p) == {"release-1": 1}
    assert T.read(spark, p, tag="release-1").count() == 10
    # default pins the head
    assert T.tag(spark, p, "head.pin") == 2
    # create-once: re-tagging an existing name is loud
    with pytest.raises(FileExistsError):
        T.tag(spark, p, "release-1", version=2)
    assert T.delete_tag(spark, p, "release-1") == 1
    with pytest.raises(ValueError, match="no tag"):
        T.resolve_tag(spark, p, "release-1")
    # unknown version / bad names are loud
    with pytest.raises(ValueError, match="not a retained version"):
        T.tag(spark, p, "x", version=99)
    with pytest.raises(ValueError, match="tag name"):
        T.tag(spark, p, "bad name!")


def test_vacuum_retains_tagged_versions(spark, tmp_path):
    p = str(tmp_path / "t")
    T.create(spark.range(10).select("id"), p)          # v1
    T.append(spark.range(10, 20).select("id"), p)      # v2
    T.overwrite(spark.range(100, 105).select("id"), p)  # v3 (drops v1/v2 files)
    T.tag(spark, p, "audit", version=1)
    T.vacuum(spark, p, keep_last=1, min_age_sec=0.0)
    # v1 survives the vacuum BY TAG (keep_last=1 alone would reap it),
    # v2 is gone
    assert T.versions(spark, p) == [1, 3]
    assert sorted(r.id for r in T.read(spark, p, tag="audit").collect()) \
        == list(range(10))
    assert T.read(spark, p).count() == 5
    # untag -> the next vacuum reaps version AND its files
    T.delete_tag(spark, p, "audit")
    T.vacuum(spark, p, keep_last=1, min_age_sec=0.0)
    assert T.versions(spark, p) == [3]


def test_read_rejects_combined_selectors(spark, tmp_path):
    p = str(tmp_path / "t")
    T.create(spark.range(3).select("id"), p)
    T.tag(spark, p, "a")
    with pytest.raises(ValueError, match="not both"):
        T.read(spark, p, version=1, tag="a")


def test_tag_on_shallow_clone_pins_external_refs(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    T.create(spark.range(20).select("id"), src)
    T.shallow_clone(spark, src, dst)
    T.tag(spark, dst, "pin")                      # pins clone v1 (external)
    T.compact(spark, dst, target_files=1)         # v2 local
    T.vacuum(spark, dst, keep_last=1, min_age_sec=0.0)
    # the tagged external-referencing version stays readable
    assert T.read(spark, dst, tag="pin").count() == 20
    assert T.versions(spark, dst) == [1, 2]


def test_tag_cli(tmp_path, capsys, spark):
    from tests.test_cli import _run

    data = str(tmp_path / "d")
    spark.range(5).select("id").write.parquet(data)
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data])
    res = _run(capsys, spark, ["snap", "tag", "add", "--table", table,
                               "--name", "r1"])
    assert res["version"] == 1
    res = _run(capsys, spark, ["snap", "tag", "list", "--table", table])
    assert res["tags"] == {"r1": 1}
    res = _run(capsys, spark, ["snap", "tag", "rm", "--table", table,
                               "--name", "r1"])
    assert res["unpinned"] == 1
