"""Incrementally-maintained materialized views (sources/matview.py) and
the conditional MERGE clauses (snaptable.merge_into clause lists /
insert-expression dicts) that give them their single-commit refresh.

The standing witness: after EVERY refresh, read_matview must equal a
from-scratch recompute of the same aggregation over the source head —
bit-identically (sums ride the decimal firewall, so incremental
addition and full recomputation agree exactly).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.sources import matview as MV
from sec_financial_pipeline_spark.sources import snaptable as T

_SCHEMA = "k bigint, g string, v double"


def _src_rows():
    return [
        (1, "A", 10.0), (2, "A", 20.5), (3, "A", None),
        (4, "B", 7.25), (5, "B", 2.75),
        (6, "C", 100.0),
        (7, "E", None), (8, "E", None),
    ]


def _expected(spark, src_path):
    """Independent full recompute in the user-facing shape."""
    df = T.read(spark, src_path)
    dec = F.col("v").cast("decimal(30,6)")
    return df.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count("v").cast("bigint").alias("nv"),
        F.sum(dec).cast("double").alias("sv"),
        (F.sum(dec).cast("double") / F.count("v")).alias("av"),
    )


def _assert_view_matches(spark, src, dst):
    got = sorted(
        map(tuple, MV.read_matview(spark, dst).collect())
    )
    want = sorted(map(tuple, _expected(spark, src).collect()))
    assert got == want


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "view")


_AGGS = [
    ("count", None, "n"),
    ("count", "v", "nv"),
    ("sum", "v", "sv"),
    ("avg", "v", "av"),
]


def test_algebraic_matview_tracks_a_dml_storm(spark, paths):
    src, dst = paths
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    cur = MV.create_matview(spark, src, dst, ["g"], _AGGS)
    assert cur == 1
    _assert_view_matches(spark, src, dst)

    # no source movement -> no-op, cursor unchanged, no new version
    v_before = T._manifest(spark, dst, None)["version"]
    assert MV.refresh_matview(spark, dst) == cur
    assert T._manifest(spark, dst, None)["version"] == v_before

    # append: existing group grows, a new group appears
    T.append(
        spark.createDataFrame(
            [(9, "A", 1.5), (10, "D", 40.0), (11, "D", None)], _SCHEMA
        ),
        src,
    )
    MV.refresh_matview(spark, dst)
    _assert_view_matches(spark, src, dst)

    # copy-on-write delete wipes group B entirely -> view row deleted
    T.delete_where(spark, src, "g = 'B'")
    MV.refresh_matview(spark, dst)
    _assert_view_matches(spark, src, dst)
    assert not [
        r for r in MV.read_matview(spark, dst).collect() if r["g"] == "B"
    ]

    # deletion-vector delete (merge-on-read commit) folds identically
    T.delete_where(spark, src, "k = 2", mode="dv")
    MV.refresh_matview(spark, dst)
    _assert_view_matches(spark, src, dst)

    # UPDATE moving values within a group, then one moving rows ACROSS
    # groups (delete-from-C + insert-into-D in the net feed)
    T.update_where(spark, src, "k = 1", {"v": "v + 5.0"})
    MV.refresh_matview(spark, dst)
    _assert_view_matches(spark, src, dst)
    T.update_where(spark, src, "g = 'C'", {"g": "'D'"})
    MV.refresh_matview(spark, dst)
    _assert_view_matches(spark, src, dst)
    assert not [
        r for r in MV.read_matview(spark, dst).collect() if r["g"] == "C"
    ]

    # merge-upsert: replace one key, insert another, then several
    # commits folded by ONE refresh
    T.merge_upsert(
        spark.createDataFrame([(3, "A", 9.0), (12, "F", 3.25)], _SCHEMA),
        src,
        key_cols=("k",),
    )
    T.append(spark.createDataFrame([(13, "F", None)], _SCHEMA), src)
    T.delete_where(spark, src, "k = 10")
    MV.refresh_matview(spark, dst)
    _assert_view_matches(spark, src, dst)

    # a vanished group re-appearing is a plain re-insert
    T.append(spark.createDataFrame([(14, "B", 8.0)], _SCHEMA), src)
    MV.refresh_matview(spark, dst)
    _assert_view_matches(spark, src, dst)


def test_sum_null_semantics_survive_incremental_maintenance(spark, paths):
    src, dst = paths
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    MV.create_matview(spark, src, dst, ["g"], _AGGS)
    by_g = {r["g"]: r for r in MV.read_matview(spark, dst).collect()}
    assert by_g["E"]["sv"] is None and by_g["E"]["av"] is None

    # the group's first non-null value arrives, then is deleted again:
    # a naive t.sum + delta would read 0.0, not NULL — the __nn counter
    # is what makes the round trip exact
    T.append(spark.createDataFrame([(20, "E", 6.5)], _SCHEMA), src)
    MV.refresh_matview(spark, dst)
    by_g = {r["g"]: r for r in MV.read_matview(spark, dst).collect()}
    assert by_g["E"]["sv"] == 6.5
    T.delete_where(spark, src, "k = 20")
    MV.refresh_matview(spark, dst)
    by_g = {r["g"]: r for r in MV.read_matview(spark, dst).collect()}
    assert by_g["E"]["sv"] is None and by_g["E"]["av"] is None
    assert by_g["E"]["n"] == 2
    _assert_view_matches(spark, src, dst)


def test_refresh_is_exactly_once_and_replay_safe(spark, paths):
    src, dst = paths
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    MV.create_matview(spark, src, dst, ["g"], _AGGS)
    T.append(spark.createDataFrame([(30, "A", 2.0)], _SCHEMA), src)
    cur = MV.refresh_matview(spark, dst)
    v = T._manifest(spark, dst, None)["version"]
    # replay of the SAME range: cursor and table version both unchanged
    assert MV.refresh_matview(spark, dst) == cur
    assert T._manifest(spark, dst, None)["version"] == v
    # the txn guard also absorbs a crash-replay of the merge itself
    assert T.last_txn(spark, dst, "matview") == cur
    _assert_view_matches(spark, src, dst)


def test_holistic_min_max_recomputes_only_touched_groups(spark, paths):
    src, dst = paths
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    aggs = [
        ("count", None, "n"),
        ("sum", "v", "sv"),
        ("min", "v", "lo"),
        ("max", "v", "hi"),
    ]
    MV.create_matview(spark, src, dst, ["g"], aggs)

    def expected():
        df = T.read(spark, src)
        dec = F.col("v").cast("decimal(30,6)")
        return sorted(
            map(
                tuple,
                df.groupBy("g").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum(dec).cast("double").alias("sv"),
                    F.min("v").alias("lo"),
                    F.max("v").alias("hi"),
                ).collect(),
            )
        )

    def got():
        return sorted(map(tuple, MV.read_matview(spark, dst).collect()))

    assert got() == expected()
    # deleting the current minimum RAISES the min — the case no delta
    # arithmetic can maintain, hence the touched-group recompute
    T.delete_where(spark, src, "k = 4")  # B's min (7.25 -> 2.75 stays)
    T.delete_where(spark, src, "k = 5")  # ...then B vanishes entirely
    MV.refresh_matview(spark, dst)
    assert got() == expected()
    T.append(
        spark.createDataFrame([(40, "A", -3.5), (41, "G", 0.25)], _SCHEMA),
        src,
    )
    T.update_where(spark, src, "k = 6", {"v": "0.125"})
    MV.refresh_matview(spark, dst)
    assert got() == expected()


def test_refresh_carries_untouched_view_files(spark, paths):
    """Copy-on-write confinement: a refresh whose delta hits one group
    must carry view files holding only other groups by reference."""
    src, dst = paths
    rows = [(i, f"g{i % 40:02d}", float(i)) for i in range(400)]
    T.create(
        spark.createDataFrame(rows, _SCHEMA).repartitionByRange(8, "g"), src
    )
    MV.create_matview(
        spark, src, dst, ["g"], [("sum", "v", "sv")], range_files=8
    )
    before = {e["path"] for e in T._manifest(spark, dst, None)["files"]}
    T.append(spark.createDataFrame([(1000, "g00", 5.0)], _SCHEMA), src)
    MV.refresh_matview(spark, dst)
    after = {e["path"] for e in T._manifest(spark, dst, None)["files"]}
    carried = before & after
    assert len(before) > 1, "need a multi-file view for this witness"
    assert carried, "refresh rewrote every view file for a 1-group delta"
    _assert_ = MV.read_matview(spark, dst)  # still readable


def test_matview_guards(spark, paths):
    src, dst = paths
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    with pytest.raises(MV.MatviewError, match="unknown aggregate"):
        MV.create_matview(spark, src, dst, ["g"], [("median", "v", "m")])
    with pytest.raises(MV.MatviewError, match="identifier"):
        MV.create_matview(spark, src, dst, ["g"], [("sum", "v", "bad name")])
    with pytest.raises(MV.MatviewError, match="group column"):
        MV.create_matview(spark, src, dst, ["g; drop"], [("sum", "v", "s")])
    with pytest.raises(MV.MatviewError, match="not a materialized view"):
        MV.refresh_matview(spark, str(dst) + "_nope")


# ---------------------------------------------------------------------------
# merge_into conditional clauses / insert-expression dicts
# ---------------------------------------------------------------------------


def _mk(spark, tmp_path, rows):
    p = str(tmp_path / "t")
    T.create(spark.createDataFrame(rows, "k bigint, n bigint, lbl string"), p)
    return p


def test_merge_clause_list_first_match_wins(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, 5, "a"), (2, 0, "b"), (3, 9, "c")])
    src = spark.createDataFrame(
        [(1, -5), (2, 3), (3, 1), (4, 7)], "k bigint, d bigint"
    )
    T.merge_into(
        src,
        p,
        key_cols=["k"],
        when_matched=[
            ("t.n + s.d = 0", "delete"),       # k=1: 5 + -5 -> deleted
            ("t.n + s.d > 9", {"lbl": "'big'"}),  # k=3: 10 -> s updated
            (None, {"n": "t.n + s.d"}),         # k=2: plain delta update
        ],
        when_not_matched={"k": "s.k", "n": "s.d", "lbl": "'fresh'"},
    )
    got = {r["k"]: (r["n"], r["lbl"]) for r in T.read(spark, p).collect()}
    assert got == {2: (3, "b"), 3: (9, "big"), 4: (7, "fresh")}


def test_merge_clause_no_match_leaves_row_and_feed_untouched(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, 5, "a"), (2, 6, "b")])
    src = spark.createDataFrame([(1, 1), (2, 2)], "k bigint, d bigint")
    v = T.merge_into(
        src,
        p,
        key_cols=["k"],
        when_matched=[("s.d > 1", {"n": "t.n + s.d"})],
        when_not_matched="ignore",
        cdf=True,
    )
    got = {r["k"]: r["n"] for r in T.read(spark, p).collect()}
    assert got == {1: 5, 2: 8}
    feed = T.change_feed(spark, p, v - 1, v).collect()
    ks = {(r["k"], r["_change_type"]) for r in feed}
    # k=1 satisfied no clause: unchanged AND absent from the feed
    assert ks == {(2, "delete"), (2, "insert")}


def test_merge_insert_dict_defaults_and_null_pad(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, 5, "a")])
    src = spark.createDataFrame([(9, 4)], "k bigint, d bigint")
    T.merge_into(
        src,
        p,
        key_cols=["k"],
        when_matched="delete",
        when_not_matched={"n": "s.d * 10"},  # k defaults to source k; lbl -> NULL
    )
    got = {r["k"]: (r["n"], r["lbl"]) for r in T.read(spark, p).collect()}
    assert got == {1: (5, "a"), 9: (40, None)}


def test_merge_clause_validation(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, 5, "a")])
    src = spark.createDataFrame([(1, 1)], "k bigint, d bigint")
    with pytest.raises(ValueError, match="unknown column"):
        T.merge_into(
            src, p, ["k"], when_matched=[(None, {"zz": "1"})],
            when_not_matched="ignore",
        )
    with pytest.raises(ValueError, match="clause list is empty"):
        T.merge_into(
            src, p, ["k"], when_matched=[], when_not_matched="ignore"
        )
    with pytest.raises(ValueError, match="condition, action"):
        T.merge_into(
            src, p, ["k"], when_matched=["delete"], when_not_matched="ignore"
        )
    with pytest.raises(ValueError, match="full-schema"):
        T.merge_into(
            src, p, ["k"], when_matched="replace",
            when_not_matched={"n": "s.d"},
        )


def test_merge_clause_replace_action_inside_list(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, 5, "a"), (2, 6, "b")])
    src = spark.createDataFrame(
        [(1, 50, "x"), (2, 60, "y")], "k bigint, n bigint, lbl string"
    )
    T.merge_into(
        src,
        p,
        key_cols=["k"],
        when_matched=[("s.n >= 60", "replace")],
        when_not_matched="ignore",
    )
    got = {r["k"]: (r["n"], r["lbl"]) for r in T.read(spark, p).collect()}
    assert got == {1: (5, "a"), 2: (60, "y")}


def test_matview_lag_tracks_source_versions(spark, paths):
    src, dst = paths
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    MV.create_matview(spark, src, dst, ["g"], [("count", None, "n")])
    assert MV.matview_lag(spark, dst)["behind_versions"] == 0
    T.append(spark.createDataFrame([(50, "A", 1.0)], _SCHEMA), src)
    T.delete_where(spark, src, "k = 6")
    assert MV.matview_lag(spark, dst)["behind_versions"] == 2
    MV.refresh_matview(spark, dst)
    lag = MV.matview_lag(spark, dst)
    assert lag["behind_versions"] == 0
    assert lag["view_cursor"] == lag["src_version"] == 3


def _assert_sets_match(spark, src, dst):
    """Row-set equality (None-safe — NULL group keys can't sort)."""
    got = {tuple(r) for r in MV.read_matview(spark, dst).collect()}
    want = {tuple(r) for r in _expected(spark, src).collect()}
    assert got == want


def test_null_group_key_refresh_updates_not_duplicates(spark, paths):
    """ADVICE r9 (medium): a NULL group key is a real group — refresh
    must UPDATE/DELETE its view row via null-safe key matching, never
    insert a duplicate NULL-key row."""
    src, dst = paths
    T.create(
        spark.createDataFrame(
            [(1, None, 10.0), (2, None, 5.0), (3, "A", 1.0)], _SCHEMA
        ),
        src,
    )
    MV.create_matview(spark, src, dst, ["g"], _AGGS)
    # touch the NULL group twice across refreshes
    T.append(spark.createDataFrame([(4, None, 2.5)], _SCHEMA), src)
    MV.refresh_matview(spark, dst)
    rows = MV.read_matview(spark, dst).collect()
    assert sum(1 for r in rows if r["g"] is None) == 1  # no duplicate
    _assert_sets_match(spark, src, dst)
    T.delete_where(spark, src, "g IS NULL")
    MV.refresh_matview(spark, dst)
    rows = MV.read_matview(spark, dst).collect()
    assert sum(1 for r in rows if r["g"] is None) == 0  # group deleted
    _assert_sets_match(spark, src, dst)
    # holistic path: min/max view over a NULL-able group
    dst2 = dst + "2"
    MV.create_matview(
        spark, src, dst2, ["g"], [("min", "v", "mn"), ("max", "v", "mx")]
    )
    T.append(
        spark.createDataFrame([(9, None, 7.0), (10, None, 3.0)], _SCHEMA),
        src,
    )
    MV.refresh_matview(spark, dst2)
    got = {r["g"]: (r["mn"], r["mx"]) for r in MV.read_matview(spark, dst2).collect()}
    assert got[None] == (3.0, 7.0)
    T.delete_where(spark, src, "v = 3.0")
    MV.refresh_matview(spark, dst2)
    got = {r["g"]: (r["mn"], r["mx"]) for r in MV.read_matview(spark, dst2).collect()}
    assert got[None] == (7.0, 7.0)  # delete RAISED the min, no dup row


def test_crashed_create_is_rerunnable(spark, paths, monkeypatch):
    """ADVICE r9 (low): the spec sidecar commits BEFORE the view
    table, so a crash between the two leaves a re-runnable create, not
    a stuck table."""
    src, dst = paths
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    calls = {"n": 0}
    real_create = T.create

    def boom(df, path, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated crash after spec write")

    monkeypatch.setattr(MV.T, "create", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        MV.create_matview(spark, src, dst, ["g"], _AGGS)
    assert calls["n"] == 1
    import os

    assert os.path.exists(MV._spec_path(dst))  # spec landed first
    monkeypatch.setattr(MV.T, "create", real_create)
    # re-run succeeds (spec with no table = crashed create, recreatable)
    MV.create_matview(spark, src, dst, ["g"], _AGGS)
    _assert_view_matches(spark, src, dst)
    # ...but a COMPLETE view refuses a second create
    with pytest.raises(MV.MatviewError, match="already holds"):
        MV.create_matview(spark, src, dst, ["g"], _AGGS)


def test_filtered_view_where_and_agg_filter_incremental_exact(
    spark, paths
):
    """VERDICT r9 item 4: WHERE on the view definition and per-
    aggregate FILTER clauses, maintained incrementally and equal to a
    from-scratch SQL recompute after every refresh (the reference's
    per-metric cached responses are filtered aggregates)."""
    src, dst = paths
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    MV.create_matview(
        spark,
        src,
        dst,
        ["g"],
        [
            ("count", None, "n"),
            ("count", None, "n_big", "v > 8.0"),
            ("sum", "v", "sv_big", "v > 8.0"),
            ("avg", "v", "av_small", "v <= 8.0"),
            ("min", "v", "mn_pos", "v > 0.0"),
        ],
        where="k <= 6",
    )

    def _recompute():
        df = T.read(spark, src).filter("k <= 6")
        dec = F.col("v").cast("decimal(30,6)")
        big = F.when(F.expr("v > 8.0"), F.lit(1))
        return {
            tuple(r)
            for r in df.groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.count(big).cast("bigint").alias("n_big"),
                F.sum(F.when(F.expr("v > 8.0"), dec)).cast("double").alias("sv_big"),
                (
                    F.sum(F.when(F.expr("v <= 8.0"), dec)).cast("double")
                    / F.count(F.when(F.expr("v <= 8.0"), F.col("v")))
                ).alias("av_small"),
                F.min(F.when(F.expr("v > 0.0"), F.col("v"))).alias("mn_pos"),
            )
            .collect()
        }

    assert {tuple(r) for r in MV.read_matview(spark, dst).collect()} == _recompute()
    # rows inside and OUTSIDE the WHERE, nulls, filter-boundary values
    T.append(
        spark.createDataFrame(
            [(5, "B", 9.5), (6, "C", None), (90, "A", 50.0), (2, "D", 8.0)],
            _SCHEMA,
        ),
        src,
    )
    MV.refresh_matview(spark, dst)
    assert {tuple(r) for r in MV.read_matview(spark, dst).collect()} == _recompute()
    # deletes that empty a group's filtered subset and the group itself
    T.delete_where(spark, src, "g = 'C' OR v = 9.5")
    MV.refresh_matview(spark, dst)
    assert {tuple(r) for r in MV.read_matview(spark, dst).collect()} == _recompute()
    # a commit touching ONLY where-excluded rows is a no-op refresh
    T.delete_where(spark, src, "k = 90")
    v_before = T._manifest(spark, dst, None)["version"]
    MV.refresh_matview(spark, dst)
    assert MV.read_matview(spark, dst).count() > 0
    assert {tuple(r) for r in MV.read_matview(spark, dst).collect()} == _recompute()


def test_stream_refresh_three_epochs_and_crash_resume(spark, paths, tmp_path):
    """VERDICT r9 item 7: the continuous snaptable->matview pipeline —
    a version-offset stream over the source drives refresh_matview per
    epoch. Three source commits (two appends + a delete) each fold
    within their own epoch and the view equals a full recompute after
    every one; a restart from the same checkpoint after an out-of-band
    refresh (the crash shape: refresh committed, epoch not yet
    checkpointed) replays without double-folding — the view's txn
    cursor, not the stream offsets, is the exactly-once authority."""
    src, dst = paths
    ck = str(tmp_path / "ck")
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    MV.create_matview(spark, src, dst, ["g"], _AGGS)

    def drain():
        q = MV.stream_refresh_matview(spark, dst, ck, available_now=True)
        q.awaitTermination(120)
        assert not q.isActive

    drain()  # v1 already folded by create: refresh is a cursor no-op
    _assert_view_matches(spark, src, dst)

    commits = [
        lambda: T.append(
            spark.createDataFrame(
                [(20, "A", 5.0), (21, "F", 9.0)], _SCHEMA
            ),
            src,
        ),
        lambda: T.delete_where(spark, src, "g = 'C'"),
        lambda: T.append(
            spark.createDataFrame([(22, "F", None)], _SCHEMA), src
        ),
    ]
    for commit in commits:
        commit()
        drain()
        _assert_view_matches(spark, src, dst)
        assert MV.matview_lag(spark, dst)["behind_versions"] == 0

    # crash shape: a refresh lands OUTSIDE the stream (as if the epoch
    # function ran but the checkpoint write died) — the restarted
    # stream replays the epoch, which must re-fold nothing
    T.append(spark.createDataFrame([(23, "A", 2.0)], _SCHEMA), src)
    MV.refresh_matview(spark, dst)
    v_after_manual = T._manifest(spark, dst, None)["version"]
    _assert_view_matches(spark, src, dst)
    drain()  # replay from the pre-append checkpoint
    _assert_view_matches(spark, src, dst)
    assert T._manifest(spark, dst, None)["version"] == v_after_manual


def test_cascaded_matview_rollup(spark, tmp_path):
    """Views COMPOSE: a second matview over the first view's TABLE
    rolls (a, b)-level state up to a-level, refreshing O(view1-delta)
    from view1's own change feed (table_changes diffs any snaptable,
    merge commits included). The stored shape is the contract the
    cascade aggregates: sum of stored counts == count, sum of stored
    decimal sums == sum (exact decimal addition), so the top of the
    chain still equals a from-scratch recompute of the base. Refresh
    order is upstream-first (each view folds whatever its source has
    committed so far)."""
    src, v1, v2 = (
        str(tmp_path / "src"), str(tmp_path / "v1"), str(tmp_path / "v2")
    )
    df = spark.createDataFrame(
        [(i, f"g{i % 4}", f"h{i % 2}", float(i)) for i in range(100)],
        "k bigint, a string, b string, v double",
    )
    T.create(df, src)
    MV.create_matview(
        spark, src, v1, ["a", "b"], [("count", None, "n"), ("sum", "v", "sv")]
    )
    MV.create_matview(
        spark, v1, v2, ["a"], [("sum", "n", "n"), ("sum", "sv", "sv")]
    )
    T.append(
        spark.createDataFrame(
            [(200 + i, f"g{i % 4}", "h9", 10.0 + i) for i in range(20)],
            "k bigint, a string, b string, v double",
        ),
        src,
    )
    T.delete_where(spark, src, "k < 10")
    MV.refresh_matview(spark, v1)
    MV.refresh_matview(spark, v2)
    assert MV.matview_lag(spark, v2)["behind_versions"] == 0
    got = {r.a: (r.n, r.sv) for r in MV.read_matview(spark, v2).collect()}
    want = {
        r.a: (r.n, r.sv)
        for r in T.read(spark, src)
        .groupBy("a")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("v").cast("decimal(30,6)")).cast("double").alias("sv"),
        )
        .collect()
    }
    assert got == want
    # a second DML storm + refreshes stays exact (the v1 merge commits
    # feed v2 through the exceptAll fallback diff — no cdf sidecar)
    T.delete_where(spark, src, "b = 'h9'")
    MV.refresh_matview(spark, v1)
    MV.refresh_matview(spark, v2)
    got2 = {r.a: (r.n, r.sv) for r in MV.read_matview(spark, v2).collect()}
    want2 = {
        r.a: (r.n, r.sv)
        for r in T.read(spark, src)
        .groupBy("a")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("v").cast("decimal(30,6)")).cast("double").alias("sv"),
        )
        .collect()
    }
    assert got2 == want2


def test_create_refuses_to_rebadge_plain_snaptable(spark, paths):
    """A plain snaptable at dst must refuse BEFORE the spec write — the
    residue would re-badge someone else's table as a view of src."""
    import os

    src, dst = paths
    T.create(spark.createDataFrame(_src_rows(), _SCHEMA), src)
    T.create(spark.createDataFrame([(1, 9.0)], "g bigint, v double"), dst)
    with pytest.raises(MV.MatviewError, match="not a materialized view"):
        MV.create_matview(spark, src, dst, ["g"], [("count", None, "n")])
    assert not os.path.exists(os.path.join(dst, "matview.json"))
    # the plain table is untouched and still reads as itself
    assert T.read(spark, dst).count() == 1


def test_matview_randomized_dml_storm_model_based(spark, paths):
    """Model-based: a seeded random sequence of appends / deletes /
    no-op refreshes over a NULL-able group domain, with the view
    refreshed at random points — after every refresh the view must
    equal the from-scratch recompute bit-for-bit (the standing witness,
    now exercised over arbitrary interleavings instead of
    hand-authored ones)."""
    import random

    rng = random.Random(11)
    src, dst = paths
    groups = ["A", "B", "C", None]
    rows = [(i, rng.choice(groups),
             None if rng.random() < 0.2 else round(rng.uniform(-50, 50), 2))
            for i in range(40)]
    T.create(spark.createDataFrame(rows, _SCHEMA), src)
    MV.create_matview(spark, src, dst, ["g"], _AGGS)
    nxt = 100
    for step in range(12):
        op = rng.random()
        if op < 0.5:
            batch = [
                (nxt + j, rng.choice(groups),
                 None if rng.random() < 0.2
                 else round(rng.uniform(-50, 50), 2))
                for j in range(rng.randint(1, 6))
            ]
            nxt += len(batch)
            T.append(spark.createDataFrame(batch, _SCHEMA), src)
        elif op < 0.8:
            k = rng.randrange(nxt)
            T.delete_where(spark, src, f"k % {rng.randint(2, 7)} = {k % 2}")
        # else: no source movement this step — refresh must no-op
        if rng.random() < 0.7 or step == 11:
            MV.refresh_matview(spark, dst)
            got = {r.g: r[1:] for r in MV.read_matview(spark, dst).collect()}
            want = {r.g: r[1:] for r in _expected(spark, src).collect()}
            assert got == want, f"step {step}: {got} != {want}"


def _roll_a(spark, src):
    """Independent a-level recompute of the 2-level cascade from the
    BASE table (not from v1) — the strongest equality witness."""
    return {
        r.a: (r.n, r.sv)
        for r in T.read(spark, src)
        .groupBy("a")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("v").cast("decimal(30,6)")).cast("double").alias("sv"),
        )
        .collect()
    }


def _v2_state(spark, v2):
    return {r.a: (r.n, r.sv) for r in MV.read_matview(spark, v2).collect()}


def test_cascaded_stream_daemons_kill_resume_exactly_once(spark, tmp_path):
    """VERDICT r10 item 7: the CONTINUOUS daemon over a 2-level cascade
    (src -> v1 -> v2, each level its own stream_refresh_matview query)
    with a mid-epoch crash injected at EACH level — the refresh commits,
    then the epoch function dies before the checkpoint write, the exact
    shape of a worker loss between commit and offset persistence. The
    resumed daemon replays the epoch; the view's txn cursor (not the
    stream checkpoint) is the exactly-once authority, so the replay must
    re-fold NOTHING: view version unchanged, both levels equal a
    from-scratch recompute of the BASE table. Ends with both daemons
    running CONCURRENTLY on processing-time triggers through a third
    DML storm."""
    src = str(tmp_path / "src")
    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    sch = "k bigint, a string, b string, v double"
    T.create(
        spark.createDataFrame(
            [(i, f"g{i % 4}", f"h{i % 3}", float(i)) for i in range(60)], sch
        ),
        src,
    )
    MV.create_matview(
        spark, src, v1, ["a", "b"], [("count", None, "n"), ("sum", "v", "sv")]
    )
    MV.create_matview(
        spark, v1, v2, ["a"], [("sum", "n", "n"), ("sum", "sv", "sv")]
    )

    def drain(dst, ck, expect_crash=False):
        q = MV.stream_refresh_matview(spark, dst, ck, available_now=True)
        try:
            q.awaitTermination(180)
        except Exception:
            pass
        assert not q.isActive
        assert (q.exception() is not None) == expect_crash

    # storm 1: append + delete on the base
    T.append(
        spark.createDataFrame(
            [(100 + i, f"g{i % 4}", "h9", 10.0 + i) for i in range(12)], sch
        ),
        src,
    )
    T.delete_where(spark, src, "k < 8")

    # ---- level 1 crash: refresh commits, epoch checkpoint dies ----
    real = MV.refresh_matview

    def commit_then_die(sp, dst):
        real(sp, dst)
        raise RuntimeError("injected crash after refresh commit")

    MV.refresh_matview = commit_then_die
    try:
        drain(v1, ck1, expect_crash=True)
    finally:
        MV.refresh_matview = real
    v1_ver = T._manifest(spark, v1, None)["version"]
    assert MV.matview_lag(spark, v1)["behind_versions"] == 0  # commit landed
    drain(v1, ck1)  # resume: replayed epoch must re-fold nothing
    assert T._manifest(spark, v1, None)["version"] == v1_ver
    assert MV.matview_lag(spark, v1)["behind_versions"] == 0

    # ---- level 2 crash: same shape, downstream of v1's merge commits ----
    MV.refresh_matview = commit_then_die
    try:
        drain(v2, ck2, expect_crash=True)
    finally:
        MV.refresh_matview = real
    v2_ver = T._manifest(spark, v2, None)["version"]
    drain(v2, ck2)  # resume
    assert T._manifest(spark, v2, None)["version"] == v2_ver
    assert MV.matview_lag(spark, v2)["behind_versions"] == 0
    assert _v2_state(spark, v2) == _roll_a(spark, src)

    # ---- storm 2 folds cleanly end-to-end through resumed checkpoints
    T.delete_where(spark, src, "b = 'h9'")
    T.append(spark.createDataFrame([(500, "g9", "h0", 5.5)], sch), src)
    drain(v1, ck1)
    drain(v2, ck2)
    assert _v2_state(spark, v2) == _roll_a(spark, src)

    # ---- storm 3 under BOTH daemons live on processing-time triggers
    q1 = MV.stream_refresh_matview(spark, v1, ck1, processing_time="150 milliseconds")
    q2 = MV.stream_refresh_matview(spark, v2, ck2, processing_time="150 milliseconds")
    try:
        T.append(
            spark.createDataFrame(
                [(600 + i, f"g{i % 5}", f"h{i % 2}", 2.0 * i) for i in range(10)],
                sch,
            ),
            src,
        )
        T.delete_where(spark, src, "a = 'g0'")
        import time

        deadline = time.time() + 180
        want = _roll_a(spark, src)
        while time.time() < deadline:
            if (
                MV.matview_lag(spark, v1)["behind_versions"] == 0
                and MV.matview_lag(spark, v2)["behind_versions"] == 0
                and _v2_state(spark, v2) == want
            ):
                break
            time.sleep(0.3)
        assert _v2_state(spark, v2) == want
        assert q1.exception() is None and q2.exception() is None
    finally:
        q1.stop()
        q2.stop()


def test_source_column_rename_fails_refresh_loudly(spark, tmp_path):
    """Renaming a source column a view aggregates (or groups by) must
    make the next refresh raise, never silently fold wrong columns —
    the spec names columns, and a rename is a schema contract change
    the view owner has to re-create around."""
    import os

    root = str(tmp_path)
    src, dst = os.path.join(root, "src"), os.path.join(root, "v")
    T.create(
        spark.createDataFrame(
            [(1, "A", 1.0), (2, "B", 2.0)], "k bigint, g string, v double"
        ),
        src,
    )
    MV.create_matview(spark, src, dst, ["g"], [("sum", "v", "sv")])
    T.rename_column(spark, src, "v", "w")
    T.append(
        spark.createDataFrame([(3, "A", 5.0)], "k bigint, g string, w double"),
        src,
    )
    with pytest.raises(Exception, match="`v`|cannot be resolved"):
        MV.refresh_matview(spark, dst)

    src2, dst2 = os.path.join(root, "src2"), os.path.join(root, "v2")
    T.create(
        spark.createDataFrame([(1, "A", 1.0)], "k bigint, g string, v double"),
        src2,
    )
    MV.create_matview(spark, src2, dst2, ["g"], [("count", None, "n")])
    T.rename_column(spark, src2, "g", "h")
    T.append(
        spark.createDataFrame([(2, "B", 2.0)], "k bigint, h string, v double"),
        src2,
    )
    with pytest.raises(Exception, match="`g`|cannot be resolved"):
        MV.refresh_matview(spark, dst2)


def test_repin_matview_join_moves_to_dim_head(spark, tmp_path):
    """repin_matview_join: the explicit dim-evolution operation — full
    recompute at (fact head, dim head), spec re-pinned, refreshes keep
    working incrementally afterwards against the NEW pin."""
    from pyspark.sql import functions as F

    import sec_financial_pipeline_spark.sources.snaptable as T
    from sec_financial_pipeline_spark.sources import matview as MV

    fact, dim, view = (str(tmp_path / n) for n in ("fact", "dim", "view"))
    T.create(
        spark.createDataFrame(
            [(k, f"r{k % 2}") for k in range(4)], "k bigint, region string"
        ),
        dim,
    )
    T.create(
        spark.range(0, 30).select(
            "id", (F.col("id") % 6).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    MV.create_matview(
        spark, fact, view, ["region"], [("sum", "v", "sv")],
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"]},
    )

    def expected(dim_keys):
        out = {}
        for i in range(30) if not expected.extra else list(range(30)) + expected.extra:
            fk = i % 6
            if fk in dim_keys:
                g = dim_keys[fk]
                out[g] = out.get(g, 0) + i * 2
        return {g: float(v) for g, v in out.items()}
    expected.extra = []

    dim_v1 = {k: f"r{k % 2}" for k in range(4)}
    got = {r.region: r.sv for r in MV.read_matview(spark, view).collect()}
    assert got == expected(dim_v1)

    # dim gains rows for fk 4 and 5 — invisible until the repin
    T.append(
        spark.createDataFrame(
            [(4, "r4"), (5, "r5")], "k bigint, region string"
        ),
        dim,
    )
    MV.refresh_matview(spark, view)
    got = {r.region: r.sv for r in MV.read_matview(spark, view).collect()}
    assert got == expected(dim_v1)  # pin held

    MV.repin_matview_join(spark, view)
    dim_v2 = {**dim_v1, 4: "r4", 5: "r5"}
    got = {r.region: r.sv for r in MV.read_matview(spark, view).collect()}
    assert got == expected(dim_v2)

    # incremental refresh works against the new pin
    T.append(
        spark.range(100, 112).select(
            "id", (F.col("id") % 6).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    MV.refresh_matview(spark, view)
    expected.extra = list(range(100, 112))
    got = {r.region: r.sv for r in MV.read_matview(spark, view).collect()}
    assert got == expected(dim_v2)
    # non-join views refuse
    plain = str(tmp_path / "plain")
    MV.create_matview(spark, fact, plain, ["fk"], [("count", None, "n")])
    import pytest as _pytest

    with _pytest.raises(MV.MatviewError, match="not a join view"):
        MV.repin_matview_join(spark, plain)


def test_follow_view_dim_signal_daemon(spark, tmp_path):
    """A second daemon with signal_path=<dim> wakes the refresh on
    dim-only commits; two daemons never double-fold (txn cursor)."""
    from pyspark.sql import functions as F

    import sec_financial_pipeline_spark.sources.snaptable as T
    from sec_financial_pipeline_spark.sources import matview as MV

    fact, dim, view = (str(tmp_path / n) for n in ("fact", "dim", "view"))
    T.create(
        spark.createDataFrame(
            [(k, f"r{k % 2}") for k in range(4)], "k bigint, region string"
        ),
        dim,
    )
    T.create(
        spark.range(0, 20).select(
            "id", (F.col("id") % 4).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    MV.create_matview(
        spark, fact, view, ["region"], [("sum", "v", "sv")],
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"], "mode": "follow"},
    )
    # dim-only commit: re-segment key 1
    T.merge_upsert(
        spark.createDataFrame([(1, "rX")], "k bigint, region string"),
        dim,
        key_cols=["k"],
    )
    q = MV.stream_refresh_matview(
        spark, view, str(tmp_path / "ckpt_dim"),
        available_now=True, signal_path=dim,
    )
    q.awaitTermination(120)
    want = {}
    for i in range(20):
        g = {0: "r0", 1: "rX", 2: "r0", 3: "r1"}[i % 4]
        want[g] = want.get(g, 0) + i * 2
    got = {r.region: r.sv for r in MV.read_matview(spark, view).collect()}
    assert got == {g: float(v) for g, v in want.items()}
    assert MV.matview_lag(spark, view)["dim_behind_versions"] == 0


def test_snowflake_left_join_matview(spark, tmp_path):
    """Snowflake chain + left joins (VERDICT r12 item 3): two pinned
    dims fold left-to-right (the second keys on a column the FIRST dim
    introduced); left semantics keep unmatched facts as NULL-group
    rows. Incremental refresh over fact DML == pure-Python recompute,
    repin moves BOTH pins, and the final state equals a from-scratch
    create."""
    from pyspark.sql import functions as F

    import sec_financial_pipeline_spark.sources.snaptable as T
    from sec_financial_pipeline_spark.sources import matview as MV

    fact, d1, d2, view = (
        str(tmp_path / n) for n in ("fact", "d1", "d2", "view")
    )
    # d1: k -> sub (keys 0..5); d2: sub -> region (subs 0..2 only, so
    # sub 3 is unmatched at the SECOND hop)
    sub_of = {k: k % 4 for k in range(6)}
    region_of = {s: f"R{s}" for s in range(3)}
    T.create(
        spark.createDataFrame(sorted(sub_of.items()), "k bigint, sub bigint"),
        d1,
    )
    T.create(
        spark.createDataFrame(
            sorted(region_of.items()), "sub2 bigint, region string"
        ),
        d2,
    )
    # facts: fk 0..7 — 6,7 miss d1 entirely (NULL at hop 1)
    rows = {i: (i % 8, i * 2) for i in range(32)}

    def mk(items):
        return spark.createDataFrame(
            [(i, fk, v) for i, (fk, v) in items.items()],
            "id long, fk long, v long",
        )

    T.create(mk(rows), fact)
    joins = [
        {"dim": d1, "key": "fk", "dim_key": "k", "dim_cols": ["sub"],
         "how": "left"},
        {"dim": d2, "key": "sub", "dim_key": "sub2",
         "dim_cols": ["region"], "how": "left"},
    ]
    MV.create_matview(
        spark, fact, view, ["region"],
        [("count", None, "n"), ("sum", "v", "sv")],
        where="id % 7 != 3", join=joins,
    )

    def expected():
        out = {}
        for i, (fk, v) in rows.items():
            if i % 7 == 3:
                continue
            sub = sub_of.get(fk)
            g = region_of.get(sub) if sub is not None else None
            n, sv = out.get(g, (0, 0))
            out[g] = (n + 1, sv + v)
        return {g: (n, float(sv)) for g, (n, sv) in out.items()}

    def got():
        return {
            r.region: (r.n, r.sv)
            for r in MV.read_matview(spark, view).collect()
        }

    assert got() == expected()
    assert None in got()  # the orphan group is a first-class view row

    # fact DML: append (some orphans), delete, update — one refresh
    new = {i: (i % 9, i) for i in range(100, 118)}
    T.append(mk(new), fact)
    rows.update(new)
    T.delete_where(spark, fact, "id % 5 = 1")
    rows = {i: x for i, x in rows.items() if i % 5 != 1}
    T.update_where(spark, fact, "id % 6 = 2", {"v": "v + 1000"})
    rows = {
        i: (fk, v + 1000 if i % 6 == 2 else v)
        for i, (fk, v) in rows.items()
    }
    MV.refresh_matview(spark, view)
    assert got() == expected()

    # dims move; the pins hold until an explicit repin of the chain
    T.append(
        spark.createDataFrame([(6, 2)], "k bigint, sub bigint"), d1
    )
    T.append(
        spark.createDataFrame([(3, "R3")], "sub2 bigint, region string"), d2
    )
    T.append(mk({200: (6, 50)}), fact)
    rows[200] = (6, 50)
    MV.refresh_matview(spark, view)
    assert got() == expected()  # fk 6 still NULL-group: pins held

    MV.repin_matview_join(spark, view)
    sub_of[6] = 2
    region_of[3] = "R3"
    assert got() == expected()

    # refresh keeps folding against the new pins
    T.append(mk({201: (3, 60), 202: (7, 70)}), fact)
    rows[201], rows[202] = (3, 60), (7, 70)
    MV.refresh_matview(spark, view)
    assert got() == expected()

    # from-scratch create of the same definition matches
    fresh = str(tmp_path / "fresh")
    MV.create_matview(
        spark, fact, fresh, ["region"],
        [("count", None, "n"), ("sum", "v", "sv")],
        where="id % 7 != 3", join=joins,
    )
    assert got() == {
        r.region: (r.n, r.sv)
        for r in MV.read_matview(spark, fresh).collect()
    }


def test_join_spec_validation_snowflake(spark, tmp_path):
    """Definition-time refusals: follow mode stays single-inner-join;
    unknown keys and collisions across the chain are named."""
    import pytest
    from pyspark.sql import functions as F

    import sec_financial_pipeline_spark.sources.snaptable as T
    from sec_financial_pipeline_spark.sources import matview as MV

    fact, d1, view = (str(tmp_path / n) for n in ("fact", "d1", "view"))
    T.create(
        spark.createDataFrame([(0, 0)], "k bigint, sub bigint"), d1
    )
    T.create(
        spark.range(0, 5).select(
            "id", (F.col("id") % 2).alias("fk"), F.col("id").alias("v")
        ),
        fact,
    )
    base = {"dim": d1, "key": "fk", "dim_key": "k", "dim_cols": ["sub"]}
    with pytest.raises(MV.MatviewError, match="share one mode"):
        MV.create_matview(
            spark, fact, view, ["sub"], [("count", None, "n")],
            join=[dict(base, mode="follow"), dict(base)],
        )
    with pytest.raises(MV.MatviewError, match="inner|left"):
        MV.create_matview(
            spark, fact, view, ["sub"], [("count", None, "n")],
            join=dict(base, how="full"),
        )
    with pytest.raises(MV.MatviewError, match="not a fact column"):
        MV.create_matview(
            spark, fact, view, ["sub"], [("count", None, "n")],
            join=dict(base, key="nope"),
        )
    with pytest.raises(MV.MatviewError, match="collide"):
        MV.create_matview(
            spark, fact, view, ["sub"], [("count", None, "n")],
            join=[dict(base), dict(base, key="sub", dim_key="k")],
        )


def test_chain_follow_dim_signal_daemon(spark, tmp_path):
    """A dim-signal daemon on the SECOND dim of a follow chain: a
    dim2-only commit wakes the refresh, which folds it through the
    multilinear feed (both other sides quiet)."""
    from pyspark.sql import functions as F

    import sec_financial_pipeline_spark.sources.snaptable as T
    from sec_financial_pipeline_spark.sources import matview as MV

    fact, d1, d2, view = (
        str(tmp_path / n) for n in ("fact", "d1", "d2", "view")
    )
    T.create(
        spark.createDataFrame(
            [(k, k % 3) for k in range(6)], "k bigint, sub bigint"
        ),
        d1,
    )
    T.create(
        spark.createDataFrame(
            [(s, f"R{s}") for s in range(3)], "sub2 bigint, region string"
        ),
        d2,
    )
    T.create(
        spark.range(0, 24).select(
            "id", (F.col("id") % 6).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    MV.create_matview(
        spark, fact, view, ["region"], [("sum", "v", "sv")],
        join=[
            {"dim": d1, "key": "fk", "dim_key": "k", "dim_cols": ["sub"],
             "mode": "follow"},
            {"dim": d2, "key": "sub", "dim_key": "sub2",
             "dim_cols": ["region"], "mode": "follow"},
        ],
    )
    # dim2-only commit: re-label region 1
    T.merge_upsert(
        spark.createDataFrame([(1, "RX")], "sub2 bigint, region string"),
        d2, key_cols=["sub2"],
    )
    q = MV.stream_refresh_matview(
        spark, view, str(tmp_path / "ckpt_d2"),
        available_now=True, signal_path=d2,
    )
    q.awaitTermination(120)
    want = {}
    for i in range(24):
        sub = (i % 6) % 3
        g = {0: "R0", 1: "RX", 2: "R2"}[sub]
        want[g] = want.get(g, 0) + i * 2
    got = {r.region: r.sv for r in MV.read_matview(spark, view).collect()}
    assert got == {g: float(v) for g, v in want.items()}
    lag = MV.matview_lag(spark, view)
    assert [d["dim_behind_versions"] for d in lag["dims"]] == [0, 0]


def test_repin_crash_guard_fails_loudly(spark, tmp_path):
    """ADVICE r12: repin writes the spec sidecar BEFORE the table
    overwrite — a crash (or an interleaved refresh) between the two
    steps must make refresh_matview fail loudly on the spec/table
    dim-pin disagreement (the overwrite records the pin under the
    'matview_dimpin' app id) instead of silently folding new-pin
    deltas onto old-pin aggregates; re-running the repin converges."""
    import json

    import pytest
    from pyspark.sql import functions as F

    import sec_financial_pipeline_spark.sources.snaptable as T
    from sec_financial_pipeline_spark.sources import matview as MV

    fact, dim, view = (str(tmp_path / n) for n in ("fact", "dim", "view"))
    T.create(
        spark.createDataFrame(
            [(k, f"r{k % 2}") for k in range(4)], "k bigint, region string"
        ),
        dim,
    )
    T.create(
        spark.range(0, 20).select(
            "id", (F.col("id") % 4).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    MV.create_matview(
        spark, fact, view, ["region"], [("sum", "v", "sv")],
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"]},
    )
    # create recorded the pin in the view's own txn map
    assert T.last_txn(spark, view, "matview_dimpin") == 1
    # dim moves; simulate a repin that crashed after its spec write
    T.append(
        spark.createDataFrame([(9, "r9")], "k bigint, region string"), dim
    )
    spec_p = str(tmp_path / "view" / "matview.json")
    with open(spec_p) as f:
        spec = json.load(f)
    spec["join"]["dim_version"] = 2
    with open(spec_p, "w") as f:
        json.dump(spec, f)
    T.append(
        spark.range(100, 104).select(
            "id", (F.col("id") % 4).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    with pytest.raises(MV.MatviewError, match="repin did not complete"):
        MV.refresh_matview(spark, view)
    # re-running the repin converges; refresh then folds normally
    MV.repin_matview_join(spark, view)
    assert T.last_txn(spark, view, "matview_dimpin") == 2
    MV.refresh_matview(spark, view)
    want = {}
    for i in list(range(20)) + list(range(100, 104)):
        g = f"r{(i % 4) % 2}"
        want[g] = want.get(g, 0) + i * 2
    got = {r.region: r.sv for r in MV.read_matview(spark, view).collect()}
    assert got == {g: float(v) for g, v in want.items()}


def test_daemon_fold_retries_snapshot_conflict(spark, tmp_path, monkeypatch):
    """ADVICE r12: in two-daemon mode (fact-signal + dim-signal), the
    losing fold's merge raises SnapshotConflict — the _fold callback
    must retry once (a raced range is by construction already applied
    or re-foldable) instead of killing the streaming query on its
    first genuine race."""
    from pyspark.sql import functions as F

    import sec_financial_pipeline_spark.sources.snaptable as T
    from sec_financial_pipeline_spark.sources import matview as MV

    fact, view = (str(tmp_path / n) for n in ("fact", "view"))
    T.create(
        spark.range(0, 20).select(
            "id", (F.col("id") % 4).alias("g"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    MV.create_matview(spark, fact, view, ["g"], [("sum", "v", "sv")])
    T.append(
        spark.range(100, 110).select(
            "id", (F.col("id") % 4).alias("g"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    real = MV.refresh_matview
    state = {"n": 0}

    def flaky(sp, dst):
        state["n"] += 1
        if state["n"] == 1:
            raise T.SnapshotConflict("simulated raced fold")
        return real(sp, dst)

    monkeypatch.setattr(MV, "refresh_matview", flaky)
    q = MV.stream_refresh_matview(
        spark, view, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    monkeypatch.undo()
    assert state["n"] >= 2  # the conflict was retried, not fatal
    assert MV.matview_lag(spark, view)["behind_versions"] == 0
    want = {}
    for i in list(range(20)) + list(range(100, 110)):
        want[i % 4] = want.get(i % 4, 0) + i * 2
    got = {r.g: r.sv for r in MV.read_matview(spark, view).collect()}
    assert got == {g: float(v) for g, v in want.items()}
