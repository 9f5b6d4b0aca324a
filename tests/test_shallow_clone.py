"""Shallow clone — zero-copy table branching
(sources/snaptable.py::shallow_clone).

The clone's manifest REFERENCES the source snapshot's files through
per-entry external-root indexes (``x`` into ``tbl_meta.ext_roots``);
every scan/DV/rewrite keys on the ``x{i}:``-prefixed rel
(:func:`snaptable._erel`) so clone-local mutations can never collide
with or leak into the source. These tests pin: value equality with
the cloned version, mutual independence under every DML mode, the
materialization converges (compact clears the provenance), vacuum
safety on both sides, interop export, metadata aggregates, the Spark
DataSource read path, and the refusal contract for DV'd sources.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import sec_financial_pipeline_spark.sources.snaptable as T


def _mkdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("v")
    )


def _ids(spark, path, version=None):
    return sorted(r.id for r in T.read(spark, path, version).collect())


@pytest.fixture()
def src(spark, tmp_path):
    p = str(tmp_path / "src")
    T.create(_mkdf(spark, 0, 100), p, partition_cols=("k",))
    T.append(_mkdf(spark, 100, 150), p)
    return p


def test_clone_is_zero_copy_and_value_equal(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst)
    assert _ids(spark, dst) == list(range(150))
    # zero-copy: no data dir of its own, every entry external
    assert not os.path.exists(os.path.join(dst, "data"))
    m = T._manifest(spark, dst, None)
    assert all(e.get("x") is not None for e in m["files"])
    assert T._ext_roots(m) == [os.path.abspath(src)]
    # partition spec, stats and schema carried
    assert m.get("partition_cols") == ["k"]
    assert json.loads(m["schema"]) == json.loads(
        T._manifest(spark, src, None)["schema"]
    )


def test_time_travel_clone(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst, version=1)
    assert _ids(spark, dst) == list(range(100))


def test_mutual_independence_under_dml(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst)
    # clone-side append / COW delete / DV delete never touch the source
    T.append(_mkdf(spark, 150, 160), dst)
    T.delete_where(spark, dst, "id < 10")  # rewrites external files locally
    T.delete_where(spark, dst, "id >= 155", mode="dv")
    assert _ids(spark, dst) == list(range(10, 155))
    assert _ids(spark, src) == list(range(150))
    # source-side append after the clone is invisible to the clone
    T.append(_mkdf(spark, 1000, 1010), src)
    assert _ids(spark, dst) == list(range(10, 155))


def test_dv_on_clone_keys_on_prefixed_rel(spark, tmp_path, src):
    # the DV sidecar must store the x{i}:-prefixed rel; a reader keyed
    # on the bare rel would mis-apply it. Also pins CDF of the delete.
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst)
    T.delete_where(spark, dst, "id = 42", mode="dv", cdf=True)
    assert 42 not in _ids(spark, dst)
    m = T._manifest(spark, dst, None)
    dv_refs = sorted({r for e in m["files"] for r in e.get("dv", ())})
    assert dv_refs
    stored = (
        spark.read.schema("path string, pos long")
        .parquet(*[os.path.join(dst, r) for r in dv_refs])
        .collect()
    )
    assert all(r["path"].startswith("x0:") for r in stored)
    # the change feed serves the deleted row
    ch = T.table_changes(spark, dst, 1).filter("_change_type = 'delete'")
    assert [r.id for r in ch.collect()] == [42]


def test_compact_materializes_and_severs_provenance(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst)
    T.compact(spark, dst, target_files=2)
    m = T._manifest(spark, dst, None)
    assert T._ext_roots(m) == [] and all("x" not in e for e in m["files"])
    assert _ids(spark, dst) == list(range(150))
    # after materialization + vacuum the clone survives source vacuum
    T.vacuum(spark, dst, keep_last=1, min_age_sec=0.0)
    T.overwrite(_mkdf(spark, 0, 5), src)
    T.vacuum(spark, src, keep_last=1, min_age_sec=0.0)
    assert _ids(spark, dst) == list(range(150))


def test_clone_vacuum_never_touches_source(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst)
    T.delete_where(spark, dst, "id < 50")
    before = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(os.path.join(src, "data"))
        for f in fs
    )
    T.vacuum(spark, dst, keep_last=1, min_age_sec=0.0)
    after = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(os.path.join(src, "data"))
        for f in fs
    )
    assert before == after
    assert _ids(spark, src) == list(range(150))
    assert _ids(spark, dst) == list(range(50, 150))


def test_pruning_and_metadata_aggregates_on_clone(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst)
    # partition-probe pruning plans fewer files than the full snapshot
    got = sorted(r.id for r in T.scan(spark, dst, partitions={"k": 3}).collect())
    assert got == [i for i in range(150) if i % 5 == 3]
    # metadata-only count/bounds (no files opened for the count path)
    assert T.count_rows(spark, dst) == 150
    assert T.column_bounds(spark, dst, ["id"]) == {"id": (0, 149)}
    assert T.table_bytes(spark, dst) > 0


def test_export_file_list_reads_equal_in_duckdb(spark, tmp_path):
    import duckdb

    srcp = str(tmp_path / "flat_src")
    T.create(_mkdf(spark, 0, 60), srcp)  # flat: export is plain parquet
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, srcp, dst)
    exp = T.export_file_list(spark, dst)
    assert all(os.path.isabs(f) for f in exp["files"])
    con = duckdb.connect()
    n, lo, hi = con.execute(
        f"SELECT count(*), min(id), max(id) FROM {exp['duckdb_sql']}"
    ).fetchone()
    assert (n, lo, hi) == (60, 0, 59)


def test_clone_of_clone_remaps_to_original_roots(spark, tmp_path, src):
    c1 = str(tmp_path / "c1")
    c2 = str(tmp_path / "c2")
    T.shallow_clone(spark, src, c1)
    T.append(_mkdf(spark, 150, 155), c1)  # c1 gains a LOCAL file
    T.shallow_clone(spark, c1, c2)
    m = T._manifest(spark, c2, None)
    # provenance flattens: src for the inherited files, c1 for its own
    assert T._ext_roots(m) == [
        os.path.abspath(src), os.path.abspath(c1)
    ] or T._ext_roots(m) == [os.path.abspath(c1), os.path.abspath(src)]
    assert _ids(spark, c2) == list(range(155))


def test_refuses_dv_source_and_existing_target(spark, tmp_path, src):
    T.delete_where(spark, src, "id = 3", mode="dv")
    dst = str(tmp_path / "dst")
    with pytest.raises(ValueError, match="deletion vectors"):
        T.shallow_clone(spark, src, dst)
    T.purge_deletes(spark, src)
    T.shallow_clone(spark, src, dst)  # converged source clones fine
    assert 3 not in _ids(spark, dst)
    with pytest.raises(FileExistsError):
        T.shallow_clone(spark, src, str(tmp_path / "dst"))


def test_datasource_reads_clone_with_dv_and_filters(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst)
    T.delete_where(spark, dst, "id = 7", mode="dv")
    from sec_financial_pipeline_spark.sources.snap_datasource import (
        register_snaptable_source,
    )

    register_snaptable_source(spark)
    got = sorted(
        r.id for r in spark.read.format("snaptable").load(dst).collect()
    )
    assert got == [i for i in range(150) if i != 7]
    # option-predicate path (per-entry pruning + exact row filter)
    import json as _json

    got = sorted(
        r.id
        for r in spark.read.format("snaptable")
        .option("filter.eq", _json.dumps({"k": 2}))
        .load(dst)
        .collect()
    )
    assert got == [i for i in range(150) if i % 5 == 2 and i != 7]


def test_deep_clone_dispatch_unchanged(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.clone(spark, src, dst)  # default: deep
    assert os.path.exists(os.path.join(dst, "data"))
    assert _ids(spark, dst) == list(range(150))
    dst2 = str(tmp_path / "dst2")
    T.clone(spark, src, dst2, shallow=True)
    assert not os.path.exists(os.path.join(dst2, "data"))
    assert _ids(spark, dst2) == list(range(150))


def test_change_feed_from_zero_treats_clone_v1_as_inserts(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst)
    ch = T.change_feed(spark, dst, 0)
    got = sorted(r.id for r in ch.collect())
    assert got == list(range(150))
    assert set(r["_change_type"] for r in ch.collect()) == {"insert"}


def test_stream_replay_ships_clone_v1_files(spark, tmp_path, src):
    dst = str(tmp_path / "dst")
    T.shallow_clone(spark, src, dst)
    T.append(_mkdf(spark, 150, 160), dst)
    from sec_financial_pipeline_spark.sources.snap_datasource import (
        register_snaptable_source,
    )

    register_snaptable_source(spark)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("snaptable")
        .option("startingVersion", "1")
        .load(dst)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(160))


def test_matview_over_shallow_clone_refreshes_incrementally(
    spark, tmp_path, src
):
    # composition: an incrementally-refreshed view on a CLONE tracks
    # clone-local DML through the change feed without touching source
    from sec_financial_pipeline_spark.sources import matview as MV

    dst = str(tmp_path / "dst")
    view = str(tmp_path / "view")
    T.shallow_clone(spark, src, dst)
    MV.create_matview(
        spark, dst, view, group_cols=["k"],
        aggs=[("count", None, "n"), ("sum", "v", "sv")],
    )
    def _recompute():
        return {
            (r.k): (r.n, r.sv)
            for r in T.read(spark, dst)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .collect()
        }
    def _view():
        return {
            (r.k): (r.n, r.sv) for r in MV.read_matview(spark, view).collect()
        }
    assert _view() == _recompute()
    T.append(_mkdf(spark, 150, 170), dst)
    T.delete_where(spark, dst, "id < 20")
    MV.refresh_matview(spark, view)
    assert _view() == _recompute()
    assert _ids(spark, src) == list(range(150))


# ---------------------------------------------------------------------------
# Model-based: random DML interleavings across a source and its
# shallow clones, each tracked by its own pure-Python model. Pins the
# isolation contract: no operation on any table ever changes another,
# clone-side vacuum never breaks anybody, and materializing every
# clone (compact) makes even a source rewrite + vacuum safe.
# ---------------------------------------------------------------------------

import tempfile  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402

_CLONE_OPS = st.lists(
    st.sampled_from(
        ["src_append", "src_delete", "clone_now", "c_append",
         "c_delete", "c_delete_dv", "c_update", "c_compact", "c_vacuum"]
    ),
    min_size=3,
    max_size=8,
)


@settings(max_examples=4, deadline=None)
@given(ops=_CLONE_OPS)
def test_clone_isolation_matches_python_model(spark, ops):
    base = tempfile.mkdtemp(prefix="clonemodel_")
    src = f"{base}/src"
    rows = {i: i * 10 for i in range(12)}
    T.create(
        spark.createDataFrame(
            [(i, v) for i, v in rows.items()], "id long, v long"
        ),
        src,
    )
    models = {src: rows}  # path -> {id: v}
    clones: list[str] = []
    next_id = 1000

    def check_all():
        for p, model in models.items():
            got = {r["id"]: r["v"] for r in T.read(spark, p).collect()}
            assert got == model, p

    for k, op in enumerate(ops):
        tgt = clones[k % len(clones)] if clones else None
        if op == "src_append" or (op.startswith("c_") and tgt is None):
            new = {i: i * 10 for i in range(next_id, next_id + 5)}
            next_id += 5
            T.append(
                spark.createDataFrame(
                    [(i, x) for i, x in new.items()], "id long, v long"
                ),
                src,
            )
            models[src] = {**models[src], **new}
        elif op == "src_delete":
            T.delete_where(spark, src, "id % 7 = 3")
            models[src] = {
                i: x for i, x in models[src].items() if i % 7 != 3
            }
        elif op == "clone_now" and len(clones) < 3:
            c = f"{base}/c{len(clones)}"
            T.shallow_clone(spark, src, c)
            models[c] = dict(models[src])
            clones.append(c)
        elif op == "c_append":
            new = {i: -i for i in range(next_id, next_id + 4)}
            next_id += 4
            T.append(
                spark.createDataFrame(
                    [(i, x) for i, x in new.items()], "id long, v long"
                ),
                tgt,
            )
            models[tgt] = {**models[tgt], **new}
        elif op == "c_delete":
            T.delete_where(spark, tgt, "id % 3 = 1")
            models[tgt] = {
                i: x for i, x in models[tgt].items() if i % 3 != 1
            }
        elif op == "c_delete_dv":
            T.delete_where(spark, tgt, "id % 5 = 2", mode="dv")
            models[tgt] = {
                i: x for i, x in models[tgt].items() if i % 5 != 2
            }
        elif op == "c_update":
            T.update_where(spark, tgt, "id % 2 = 0", {"v": "v + 1"})
            models[tgt] = {
                i: (x + 1 if i % 2 == 0 else x)
                for i, x in models[tgt].items()
            }
        elif op == "c_compact":
            T.compact(spark, tgt, target_files=1)
        elif op == "c_vacuum":
            T.vacuum(spark, tgt, keep_last=1, min_age_sec=0.0)
        check_all()
    # endgame: materialize every clone, then a source rewrite + source
    # vacuum must leave every clone intact (the documented converge)
    for c in clones:
        T.compact(spark, c, target_files=1)
    T.overwrite(
        spark.createDataFrame([(0, 0)], "id long, v long"), src
    )
    models[src] = {0: 0}
    T.vacuum(spark, src, keep_last=1, min_age_sec=0.0)
    check_all()
