"""convert_in_place (sources/snaptable.py): register an existing
parquet directory as a snaptable with zero bytes rewritten — the
CONVERT-TO-DELTA on-ramp. Contract: the version-1 manifest references
the original files in place (stats + Hive-unescaped partition values
lifted), every table feature works on top (append/DML/scan/time
travel), and vacuum NEVER touches the original files."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.sources import snaptable as T


def _write_plain(spark, path, n=60, partitioned=True):
    df = spark.range(n).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") * 5).alias("v")
    )
    w = df.repartition(4).write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("p")
    w.parquet(path)
    return df


def test_convert_partitioned_roundtrip(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_plain(spark, path)
    assert T.convert_in_place(spark, path, partition_cols=("p",)) == 1
    got = sorted((r.id, r.p, r.v) for r in T.read(spark, path).collect())
    assert got == [(i, i % 3, i * 5) for i in range(60)]
    m = T._manifest(spark, path, None)
    assert all(e["base"] == "" for e in m["files"])
    assert all(e["partition"].keys() == {"p"} for e in m["files"])
    # footer stats lifted: a range scan prunes original files
    kept = T._select_entries(m, None, between=("id", 0, 5))
    assert 0 < len(kept) < len(m["files"])
    assert sorted(
        r.id for r in T.scan(spark, path, between=("id", 0, 5)).collect()
    ) == list(range(6))


def test_convert_unpartitioned_and_append_dml(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_plain(spark, path, partitioned=False)
    T.convert_in_place(spark, path)
    orig = set(glob.glob(os.path.join(path, "*.parquet")))
    T.append(
        spark.range(60, 80).select(
            "id", (F.col("id") % 3).alias("p"), (F.col("id") * 5).alias("v")
        ),
        path,
    )
    assert T.read(spark, path).count() == 80
    v = T.delete_where(spark, path, "id < 10")
    assert T.read(spark, path).count() == 70
    # time travel to the conversion snapshot still reads the originals
    assert T.read(spark, path, version=1).count() == 60
    # COW rewrite landed under data/, originals untouched on disk
    assert set(glob.glob(os.path.join(path, "*.parquet"))) == orig
    assert v == 3


def test_vacuum_never_reaps_originals(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_plain(spark, path, partitioned=False)
    T.convert_in_place(spark, path)
    orig = set(glob.glob(os.path.join(path, "*.parquet")))
    # churn history until no retained version references the originals
    T.overwrite(
        spark.range(5).select(
            "id", (F.col("id") % 3).alias("p"), (F.col("id") * 5).alias("v")
        ),
        path,
    )
    T.compact(spark, path)
    n = T.vacuum(spark, path, keep_last=1, min_age_sec=0.0)
    assert T.read(spark, path).count() == 5
    # originals are outside data/ — deliberately never physically reaped
    assert set(glob.glob(os.path.join(path, "*.parquet"))) == orig
    assert n >= 0


def test_convert_guards(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_plain(spark, path)
    with pytest.raises(ValueError, match="partition dirs"):
        T.convert_in_place(spark, path)  # forgot partition_cols
    with pytest.raises(ValueError, match="not Hive-partitioned"):
        p2 = str(tmp_path / "flat")
        _write_plain(spark, p2, partitioned=False)
        T.convert_in_place(spark, p2, partition_cols=("p",))
    T.convert_in_place(spark, path, partition_cols=("p",))
    with pytest.raises(FileExistsError):
        T.convert_in_place(spark, path, partition_cols=("p",))
    with pytest.raises(FileNotFoundError):
        T.convert_in_place(spark, str(tmp_path / "nothing"))


def test_convert_schema_override_pins_partition_type(spark, tmp_path):
    """Hive layout drops the partition column's logical type (dirs are
    strings; inference says INT). An explicit schema pins LONG so
    appends written with the original writer's types keep matching."""
    path = str(tmp_path / "lake")
    _write_plain(spark, path)  # p was LONG in the writing df
    T.convert_in_place(
        spark, path, partition_cols=("p",),
        schema="id long, p long, v long",
    )
    assert T.read(spark, path).schema["p"].dataType.typeName() == "long"
    T.append(_write_plain(spark, str(tmp_path / "x"), n=10), path)
    assert T.read(spark, path).count() == 70


def test_bloom_index_on_converted_partitioned_table(spark, tmp_path):
    """The r8 critical bug shape on the converted surface: one Spark
    write reuses part-00000-<uuid> in EVERY partition dir, so bloom
    mask attribution must match full relative paths, not basenames —
    here on entries whose base is the table root itself. Every present
    key must stay findable after indexing (false negatives are the
    failure mode)."""
    path = str(tmp_path / "lake")
    df = spark.range(2000).select(
        "id",
        (F.col("id") % 4).cast("int").alias("p"),
        (F.col("id") * 7).alias("v"),
    )
    df.coalesce(1).write.partitionBy("p").mode("overwrite").parquet(path)
    T.convert_in_place(spark, path, partition_cols=("p",))
    m = T._manifest(spark, path, None)
    names = {e["path"].rsplit("/", 1)[-1] for e in m["files"]}
    assert len(names) < len(m["files"])  # basenames DO collide
    T.add_bloom_index(spark, path, "id", bits=1 << 14)
    m2 = T._manifest(spark, path, None)
    assert all(e.get("bloom", {}).get("id") for e in m2["files"])
    for probe in (0, 1, 999, 1234, 1999):
        assert T.scan(spark, path, point=("id", probe)).count() == 1, probe
    kept = T._select_entries(m2, None, None, ("id", 1234))
    assert len(kept) < len(m2["files"])  # the index actually prunes
    assert T.scan(spark, path, point=("id", 999999)).count() == 0


def test_convert_unescapes_hive_values(spark, tmp_path):
    path = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "a:b"), (2, "plain"), (3, None)], "id long, k string"
    )
    df.write.partitionBy("k").mode("overwrite").parquet(path)
    T.convert_in_place(spark, path, partition_cols=("k",))
    m = T._manifest(spark, path, None)
    vals = {e["partition"]["k"] for e in m["files"]}
    assert vals == {"a:b", "plain", None}
    assert T.scan(spark, path, partitions={"k": "a:b"}).count() == 1
    assert T.scan(spark, path, partitions={"k": None}).count() == 1