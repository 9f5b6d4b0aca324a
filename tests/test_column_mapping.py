"""RENAME / DROP COLUMN as metadata-only commits (Delta column-mapping
analog): the manifest's colmap resolves renamed logical names to the
physical column old files still carry; dropped physical names become
tombstones ADD COLUMN must refuse."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.sources import snaptable as T


def _mk(spark, tmp_path, n=100, files=4):
    path = str(tmp_path / "cm")
    T.create(
        spark.createDataFrame(
            [(i, float(i), f"s{i:03d}") for i in range(n)],
            "a bigint, v double, s string",
        ).repartitionByRange(files, "a"),
        path,
    )
    return path


def test_rename_is_metadata_only_and_reads_mixed_files(spark, tmp_path):
    path = _mk(spark, tmp_path)
    files_before = {e["path"] for e in T._manifest(spark, path, None)["files"]}
    v = T.rename_column(spark, path, "a", "k")
    m = T._manifest(spark, path, None)
    assert {e["path"] for e in m["files"]} == files_before  # zero rewrite
    assert m["tbl_meta"]["colmap"] == {"k": "a"}
    got = T.read(spark, path)
    assert got.columns == ["k", "v", "s"]
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(100))

    # post-rename appends write the LOGICAL name; both generations read
    T.append(
        spark.createDataFrame(
            [(1000, 1.0, "zz")], "k bigint, v double, s string"
        ),
        path,
    )
    got = T.read(spark, path)
    assert got.count() == 101
    assert got.filter(F.col("k") == 1000).count() == 1
    assert got.filter(F.col("k") == 50).count() == 1  # pre-rename file

    # time travel to the pre-rename version shows the OLD schema
    assert T.read(spark, path, version=v - 1).columns == ["a", "v", "s"]


def test_rename_keeps_stats_pruning_and_metadata_aggregates(spark, tmp_path):
    path = _mk(spark, tmp_path)
    T.rename_column(spark, path, "a", "k")
    m = T._manifest(spark, path, None)
    # old entries' stats are keyed by the PHYSICAL name; probes on the
    # logical name still prune through the colmap
    kept = T._select_entries(m, None, ("k", 10, 20), None)
    assert 0 < len(kept) < len(m["files"])
    assert T.scan(spark, path, between=("k", 10, 20)).count() == 11
    # metadata aggregates resolve through the map too
    assert T.column_bounds(spark, path, ["k"]) == {"k": (0, 99)}
    assert T.null_counts(spark, path, ["k"]) == {"k": 0}
    assert T.count_rows(spark, path) == 100


def test_dml_and_matview_survive_rename(spark, tmp_path):
    path = _mk(spark, tmp_path)
    T.rename_column(spark, path, "v", "val")
    T.update_where(spark, path, "a = 1", {"val": "val + 100.0"})
    T.delete_where(spark, path, "a >= 90")
    T.merge_upsert(
        spark.createDataFrame(
            [(1, 500.0, "x"), (2000, 1.0, "y")],
            "a bigint, val double, s string",
        ),
        path,
        key_cols=["a"],
    )
    got = {r["a"]: r["val"] for r in T.read(spark, path).collect()}
    assert got[1] == 500.0 and got[2000] == 1.0 and 90 not in got
    assert len(got) == 91


def test_chained_rename_and_rename_back(spark, tmp_path):
    path = _mk(spark, tmp_path)
    T.rename_column(spark, path, "a", "b")
    T.rename_column(spark, path, "b", "c")
    m = T._manifest(spark, path, None)
    assert m["tbl_meta"]["colmap"] == {"c": "a"}  # original physical
    assert T.read(spark, path).agg(F.sum("c")).collect()[0][0] == 4950
    # renaming back to the physical name collapses to identity
    T.rename_column(spark, path, "c", "a")
    m = T._manifest(spark, path, None)
    assert m["tbl_meta"]["colmap"] == {}
    assert T.read(spark, path).agg(F.sum("a")).collect()[0][0] == 4950


def test_drop_column_hides_data_and_tombstones_the_name(spark, tmp_path):
    path = _mk(spark, tmp_path)
    v = T.drop_column(spark, path, "s")
    got = T.read(spark, path)
    assert got.columns == ["a", "v"]
    assert got.count() == 100
    # time travel still sees it
    assert "s" in T.read(spark, path, version=v - 1).columns
    # re-adding the dropped name is refused — old files still carry it
    with pytest.raises(ValueError, match="dropped or renamed-away"):
        T.evolve_schema(spark, path, [("s", "string")])
    # a renamed-away physical name is equally refused
    T.rename_column(spark, path, "v", "val")
    with pytest.raises(ValueError, match="dropped or renamed-away"):
        T.evolve_schema(spark, path, [("v", "double")])
    # but a genuinely fresh name is fine, and appends carry on
    T.evolve_schema(spark, path, [("w", "bigint")])
    T.append(
        spark.createDataFrame(
            [(1000, 1.0, 7)], "a bigint, val double, w bigint"
        ),
        path,
    )
    assert T.read(spark, path).count() == 101


def test_rename_drop_guards(spark, tmp_path):
    path = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown column"):
        T.rename_column(spark, path, "zz", "x")
    with pytest.raises(ValueError, match="collides"):
        T.rename_column(spark, path, "a", "v")
    with pytest.raises(ValueError, match="invalid column name"):
        T.rename_column(spark, path, "a", "bad name")
    T.add_constraint(spark, path, "pos", "a >= 0")
    with pytest.raises(ValueError, match="constraint"):
        T.rename_column(spark, path, "a", "k")
    with pytest.raises(ValueError, match="constraint"):
        T.drop_column(spark, path, "a")
    T.drop_constraint(spark, path, "pos")
    with pytest.raises(ValueError, match="only column"):
        p2 = str(tmp_path / "one")
        T.create(spark.createDataFrame([(1,)], "x bigint"), p2)
        T.drop_column(spark, p2, "x")
    p3 = str(tmp_path / "pc")
    T.create(
        spark.createDataFrame([(1, 2)], "k bigint, g bigint"),
        p3,
        partition_cols=("g",),
    )
    with pytest.raises(ValueError, match="partition spec"):
        T.drop_column(spark, p3, "g")


def test_rename_partition_column_follows_spec(spark, tmp_path):
    path = str(tmp_path / "rp")
    T.create(
        spark.createDataFrame(
            [(i, i % 3) for i in range(30)], "k bigint, g bigint"
        ),
        path,
        partition_cols=("g",),
    )
    T.rename_column(spark, path, "g", "grp")
    m = T._manifest(spark, path, None)
    assert list(m["partition_cols"]) == ["grp"]
    got = T.read(spark, path)
    assert got.filter(F.col("grp") == 1).count() == 10
    # new appends land under the NEW dir name; both layouts read
    T.append(
        spark.createDataFrame([(100, 1)], "k bigint, grp bigint"), path
    )
    assert T.read(spark, path).filter(F.col("grp") == 1).count() == 11
    assert T.scan(spark, path, partitions={"grp": 1}).count() == 11


def test_datasource_reads_renamed_mixed_files(spark, tmp_path):
    from sec_financial_pipeline_spark.sources.snap_datasource import (
        register_snaptable_source,
    )

    register_snaptable_source(spark)
    path = _mk(spark, tmp_path)
    T.rename_column(spark, path, "a", "k")
    T.append(
        spark.createDataFrame(
            [(1000, 1.0, "zz")], "k bigint, v double, s string"
        ),
        path,
    )
    df = spark.read.format("snaptable").load(path)
    assert df.columns == ["k", "v", "s"]
    assert df.count() == 101
    assert df.agg(F.sum("k")).collect()[0][0] == sum(range(100)) + 1000


def test_change_feed_skips_rename_and_drop_commits(spark, tmp_path):
    path = _mk(spark, tmp_path, n=10, files=1)
    v0 = T._manifest(spark, path, None)["version"]
    T.rename_column(spark, path, "a", "k")
    T.drop_column(spark, path, "s")
    v1 = T._manifest(spark, path, None)["version"]
    assert T.change_feed(spark, path, v0, v1).count() == 0


def test_compact_purges_dropped_column_bytes(spark, tmp_path):
    """After DROP COLUMN the bytes linger in old files; compact writes
    the current (logical) schema, physically retiring them — and the
    tombstone keeps guarding re-add (time travel still needs it)."""
    import pyarrow.parquet as pq

    path = _mk(spark, tmp_path)
    T.drop_column(spark, path, "s")
    m = T._manifest(spark, path, None)
    f0 = f"{path}/{m['files'][0]['path']}"
    assert "s" in pq.ParquetFile(f0).schema_arrow.names  # bytes linger
    T.compact(spark, path)
    m = T._manifest(spark, path, None)
    for e in m["files"]:
        names = pq.ParquetFile(f"{path}/{e['path']}").schema_arrow.names
        assert "s" not in names
    with pytest.raises(ValueError, match="dropped or renamed-away"):
        T.evolve_schema(spark, path, [("s", "string")])


def test_export_file_list_duckdb_interop(spark, tmp_path):
    import duckdb

    path = _mk(spark, tmp_path, n=60, files=3)
    T.evolve_schema(spark, path, [("w", "bigint")])
    T.append(
        spark.createDataFrame(
            [(1000, 1.0, "zz", 7)], "a bigint, v double, s string, w bigint"
        ),
        path,
    )
    out = T.export_file_list(spark, path)
    assert len(out["files"]) >= 4 and out["manifest"].endswith(
        f"manifest-v{out['version']}.txt"
    )
    con = duckdb.connect()
    n, sv, nw = con.execute(
        f"SELECT count(*), sum(a), count(w) FROM {out['duckdb_sql']}"
    ).fetchone()
    assert (n, sv, nw) == (61, sum(range(60)) + 1000, 1)

    # refusal cases: deletion vectors, then column mapping
    T.delete_where(spark, path, "a = 5", mode="dv")
    with pytest.raises(ValueError, match="deletion vectors"):
        T.export_file_list(spark, path)
    T.purge_deletes(spark, path)
    T.export_file_list(spark, path)  # clean again after purge
    T.rename_column(spark, path, "a", "k")
    with pytest.raises(ValueError, match="column mapping"):
        T.export_file_list(spark, path)
    # compaction converges files to the logical names -> exportable,
    # and the external reader sees the RENAMED column
    T.compact(spark, path)
    out = T.export_file_list(spark, path)
    n2, sk = con.execute(
        f"SELECT count(*), sum(k) FROM {out['duckdb_sql']}"
    ).fetchone()
    assert n2 == 60 and sk == sum(range(60)) - 5 + 1000


def test_full_rewrite_clears_colmap_and_rollback_restores_it(spark, tmp_path):
    path = _mk(spark, tmp_path, n=40, files=2)
    T.rename_column(spark, path, "a", "k")
    v_mapped = T._manifest(spark, path, None)["version"]
    T.compact(spark, path)
    m = T._manifest(spark, path, None)
    assert T._colmap(m) == {}  # files converged to logical names
    assert T.read(spark, path).agg(F.sum("k")).collect()[0][0] == 780
    # rollback to the mapped version restores its files AND its map
    T.rollback(spark, path, to_version=v_mapped)
    m = T._manifest(spark, path, None)
    assert T._colmap(m) == {"k": "a"}
    assert T.read(spark, path).agg(F.sum("k")).collect()[0][0] == 780


def test_append_racing_rename_lands_readable(spark, tmp_path):
    """An append whose files were written under the OLD logical name
    can commit AFTER a rename wins the version race: its files carry
    the physical name, which is exactly what the colmap resolves —
    no row lost, no NULL column."""
    import threading

    path = _mk(spark, tmp_path, n=20, files=1)
    barrier = threading.Barrier(2)
    errs = []

    def do_append():
        try:
            barrier.wait()
            for i in range(3):
                T.append(
                    spark.createDataFrame(
                        [(10_000 + i, 1.0, "r")],
                        "a bigint, v double, s string",
                    ),
                    path,
                )
        except Exception as e:  # schema guard may fire post-rename: ok
            errs.append(e)

    def do_rename():
        barrier.wait()
        T.rename_column(spark, path, "a", "k")

    ta, tb = threading.Thread(target=do_append), threading.Thread(
        target=do_rename
    )
    ta.start(); tb.start(); ta.join(); tb.join()
    # the rename always lands; appends either landed (pre- or post-
    # race, files under either name) or failed LOUDLY on the schema
    # guard — never silently wrote unreadable data
    got = T.read(spark, path)
    assert got.columns == ["k", "v", "s"]
    n = got.count()
    landed = sum(
        1 for r in got.collect() if r["k"] is not None and r["k"] >= 10_000
    )
    assert n == 20 + landed
    assert got.filter(F.col("k").isNull()).count() == 0
    for e in errs:
        assert "schema mismatch" in str(e)


def test_export_identity_dirs_via_hive_partitioning(spark, tmp_path):
    """VERDICT r9 item 3: identity-partitioned snapshots export as
    hive-aware DuckDB SQL (typed, schema-ordered) instead of refusing;
    layouts hive partitioning cannot represent still refuse loudly."""
    import duckdb

    ident = str(tmp_path / "ident")
    T.create(
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)],
            "k bigint, g string, v double",
        ),
        ident,
        partition_cols=("g",),
    )
    out = T.export_file_list(spark, ident)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT k, g, v FROM {out['duckdb_sql']} ORDER BY k"
    ).fetchall()
    assert rows == [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)]
    # the lifted dir column is typed per the TABLE schema, so numeric-
    # looking string labels survive untouched
    ident2 = str(tmp_path / "ident2")
    T.create(
        spark.createDataFrame(
            [(1, "0123"), (2, "0456")], "k bigint, tag string"
        ),
        ident2,
        partition_cols=("tag",),
    )
    out2 = T.export_file_list(spark, ident2)
    got = dict(
        con.execute(f"SELECT k, tag FROM {out2['duckdb_sql']}").fetchall()
    )
    assert got == {1: "0123", 2: "0456"}
    # NULL partition dirs cannot ride hive_partitioning: refuse loudly
    identn = str(tmp_path / "identn")
    T.create(
        spark.createDataFrame([(1, "a"), (2, None)], "k bigint, g string"),
        identn,
        partition_cols=("g",),
    )
    with pytest.raises(ValueError, match="NULL partition"):
        T.export_file_list(spark, identn)
    # converge: flat spec + compact -> plain exportable again
    T.set_partition_spec(spark, identn, ())
    T.compact(spark, identn)
    out3 = T.export_file_list(spark, identn)
    assert con.execute(
        f"SELECT count(*) FROM {out3['duckdb_sql']}"
    ).fetchone()[0] == 2

    hp = str(tmp_path / "hp")
    T.create(
        spark.createDataFrame(
            [(i, f"u{i}") for i in range(40)], "k bigint, s string"
        ),
        hp,
        partition_cols=("bucket(4,k)",),
    )
    out = T.export_file_list(spark, hp)  # transforms: source col in data
    n, sk = con.execute(
        f"SELECT count(*), sum(k) FROM {out['duckdb_sql']}"
    ).fetchone()
    assert (n, sk) == (40, sum(range(40)))


def test_chained_rename_with_appends_between_reads_every_generation(
    spark, tmp_path
):
    """ADVICE r9 (high): files appended BETWEEN two renames carry the
    intermediate logical name; a later rename must keep resolving them
    (the colmap alone only remembers the ORIGINAL physical name)."""
    path = _mk(spark, tmp_path)  # physical name 'a', sum 4950
    T.rename_column(spark, path, "a", "b")
    T.append(
        spark.createDataFrame(
            [(1000, 1.0, "mid")], "b bigint, v double, s string"
        ),
        path,
    )
    T.rename_column(spark, path, "b", "c")
    got = T.read(spark, path)
    assert got.columns == ["c", "v", "s"]
    # the intermediate-generation file's value is NOT a silent NULL
    assert got.filter(F.col("c") == 1000).count() == 1
    assert got.agg(F.sum("c")).collect()[0][0] == 4950 + 1000
    # the intermediate name joined the physical namespace: re-adding it
    # would resurrect the dead 'b' bytes hiding in retained files
    with pytest.raises(ValueError, match="dropped or renamed-away"):
        T.evolve_schema(spark, path, [("b", "bigint")])


def test_rename_back_with_intermediate_appends_still_reads_them(
    spark, tmp_path
):
    """a->b, append, b->a: the colmap collapses to identity but files
    written under 'b' must still resolve to the logical column."""
    path = _mk(spark, tmp_path)
    T.rename_column(spark, path, "a", "b")
    T.append(
        spark.createDataFrame(
            [(1000, 1.0, "mid")], "b bigint, v double, s string"
        ),
        path,
    )
    T.rename_column(spark, path, "b", "a")
    m = T._manifest(spark, path, None)
    assert m["tbl_meta"].get("colmap", {}) == {}
    got = T.read(spark, path)
    assert got.filter(F.col("a") == 1000).count() == 1
    assert got.agg(F.sum("a")).collect()[0][0] == 4950 + 1000


def test_chained_rename_pruning_probes_every_generation_name(
    spark, tmp_path
):
    """Stats/bounds written under the intermediate name keep pruning
    (and never WRONGLY prune) after further renames."""
    path = _mk(spark, tmp_path)  # a: 0..99 in 4 range files
    T.rename_column(spark, path, "a", "b")
    T.append(
        spark.createDataFrame(
            [(200 + i, 1.0, "mid") for i in range(10)],
            "b bigint, v double, s string",
        ).coalesce(1),
        path,
    )
    T.rename_column(spark, path, "b", "c")
    m = T._manifest(spark, path, None)
    # probe a range only the intermediate-generation file can hold:
    # the original files prune away, the 'b'-keyed file is kept
    kept = T._select_entries(m, None, ("c", 200, 300), None)
    assert len(kept) == 1
    assert T.scan(spark, path, between=("c", 200, 300)).count() == 10
    # and a range only pre-rename files hold keeps those
    assert T.scan(spark, path, between=("c", 0, 10)).count() == 11


def test_drop_after_chained_rename_tombstones_every_generation(
    spark, tmp_path
):
    path = _mk(spark, tmp_path)
    T.rename_column(spark, path, "a", "b")
    T.append(
        spark.createDataFrame(
            [(1000, 1.0, "mid")], "b bigint, v double, s string"
        ),
        path,
    )
    T.rename_column(spark, path, "b", "c")
    T.drop_column(spark, path, "c")
    for dead in ("a", "b", "c"):
        with pytest.raises(ValueError, match="dropped or renamed-away"):
            T.evolve_schema(spark, path, [(dead, "bigint")])


def test_datasource_reads_chained_rename_with_intermediate_files(
    spark, tmp_path
):
    """The arrow-side DataSource conform path resolves intermediate
    generation names too."""
    path = _mk(spark, tmp_path, n=10, files=1)
    T.rename_column(spark, path, "a", "b")
    T.append(
        spark.createDataFrame(
            [(1000, 1.0, "mid")], "b bigint, v double, s string"
        ),
        path,
    )
    T.rename_column(spark, path, "b", "c")
    from sec_financial_pipeline_spark.sources.snap_datasource import (
        register_snaptable_source,
    )

    register_snaptable_source(spark)
    got = spark.read.format("snaptable").load(path)
    assert got.filter(F.col("c") == 1000).count() == 1
    assert got.agg(F.sum("c")).collect()[0][0] == 45 + 1000


def test_rename_to_own_intermediate_name_is_legal(spark, tmp_path):
    """c->b where 'b' is this column's own prior name: the 'b'-keyed
    files ARE this column's data, so the rename is not a collision."""
    path = _mk(spark, tmp_path, n=10, files=1)
    T.rename_column(spark, path, "a", "b")
    T.append(
        spark.createDataFrame(
            [(1000, 1.0, "mid")], "b bigint, v double, s string"
        ),
        path,
    )
    T.rename_column(spark, path, "b", "c")
    T.rename_column(spark, path, "c", "b")
    got = T.read(spark, path)
    assert got.columns == ["b", "v", "s"]
    assert got.agg(F.sum("b")).collect()[0][0] == 45 + 1000
