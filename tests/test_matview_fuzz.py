"""Cross-feature fuzz: an incrementally-maintained matview riding a
snaptable under the FULL DML/maintenance op set (append / merge /
cow-delete / dv-delete / update / compact / optimize / purge /
partition-spec evolution / rollback / vacuum), with randomly
interleaved refreshes checked against a pure-Python recompute of the
current table state.

The existing model-based matview storm covers appends/deletes only;
every other op reaches the view exclusively through the change feed's
net-diff semantics (maintenance commits must fold to NOTHING, a
rollback commit must fold to the delta back to the old state), which
is exactly where a silent-wrong-results bug would hide. NOTE on
refresh-path routing: ANY min/max aggregate routes the ENTIRE refresh
through the holistic touched-group recompute, so the storms whose agg
set includes `min` exercise ONLY that branch; the min/max-free
variants at the bottom of this file exercise the algebraic delta fold
(including the follow-mode trilinear __sign feed) over the same DML
storm. Both run over a view WHERE clause and NULL-able values. Vacuum follows the operational discipline
the module documents (refresh first, so the cursor is never behind the
reaped feed). At the end the incrementally-maintained view must equal
a from-scratch create_matview of the same definition, row for row.
"""

from __future__ import annotations

import os
import random
import tempfile

import pytest

import sec_financial_pipeline_spark.sources.snaptable as T
from sec_financial_pipeline_spark.sources import matview as MV

SEEDS = int(os.environ.get("MVFUZZ_SEEDS", "3"))
OPS = int(os.environ.get("MVFUZZ_OPS", "30"))

_WHERE = "id % 7 != 3"
_AGGS = [
    ("count", None, "n"),
    ("sum", "v", "sv"),
    ("avg", "v", "av"),
    ("min", "v", "mn"),
    ("count", "v", "nhi", "v > 50"),
]


def _mkdf(spark, items):
    # items: {id: (g, v_or_None)}
    rows = [(i, g, v) for i, (g, v) in items.items()]
    return spark.createDataFrame(rows, "id long, g string, v long")


def _expected(rows):
    """Pure-Python recompute of the view over the CURRENT table rows."""
    out = {}
    for i, (g, v) in rows.items():
        if i % 7 == 3:
            continue  # the view WHERE
        n, sv, nn, mn, nhi = out.get(g, (0, 0, 0, None, 0))
        n += 1
        if v is not None:
            sv += v
            nn += 1
            mn = v if mn is None else min(mn, v)
            if v > 50:
                nhi += 1
        out[g] = (n, sv, nn, mn, nhi)
    return {
        g: (
            n,
            float(sv) if nn else None,
            (float(sv) / nn) if nn else None,
            mn,
            nhi,
        )
        for g, (n, sv, nn, mn, nhi) in out.items()
    }


def _view_state(spark, dst):
    return {
        r.g: (r.n, r.sv, r.av, r.mn, r.nhi)
        for r in MV.read_matview(spark, dst).collect()
    }


@pytest.mark.parametrize("seed", range(SEEDS))
def test_matview_rides_full_dml_fuzz(spark, seed):
    rng = random.Random(4400 + seed)
    root = tempfile.mkdtemp(prefix="mvfuzz_")
    src, dst = f"{root}/src", f"{root}/view"

    rows = {
        i: (f"g{i % 4}", None if i % 11 == 5 else i * 3) for i in range(24)
    }
    T.create(_mkdf(spark, rows), src)
    history = {1: dict(rows)}
    retained = {1}
    MV.create_matview(
        spark, src, dst, ["g"], _AGGS, where=_WHERE
    )
    next_id = 1000

    def refresh_and_check():
        MV.refresh_matview(spark, dst)
        assert _view_state(spark, dst) == _expected(rows), (
            f"seed {seed}: view diverged from recompute"
        )

    ops = ["append", "merge", "cow_delete", "dv_delete", "update",
           "compact", "optimize", "purge", "respec", "rollback",
           "vacuum", "refresh", "refresh"]

    for _ in range(OPS):
        op = rng.choice(ops)
        if op == "append":
            new = {
                i: (f"g{i % 5}", None if i % 9 == 2 else i % 97)
                for i in range(next_id, next_id + 6)
            }
            next_id += 6
            v = T.append(_mkdf(spark, new), src)
            rows.update(new)
            history[v] = dict(rows)
            retained.add(v)
        elif op == "merge":
            upd = {
                i: (rows[i][0], (rows[i][1] or 0) + 100)
                for i in sorted(rows)[:2]
            }
            ins = {next_id: ("g9", 7), next_id + 1: ("g9", None)}
            next_id += 2
            inc = {**upd, **ins}
            v = T.merge_upsert(_mkdf(spark, inc), src, key_cols=["id"])
            rows.update(inc)
            history[v] = dict(rows)
            retained.add(v)
        elif op in ("cow_delete", "dv_delete"):
            m, r = rng.choice([(3, 0), (4, 1), (5, 2)])
            hit = {i for i in rows if i % m == r}
            mode = "dv" if op == "dv_delete" else "cow"
            v = T.delete_where(spark, src, f"id % {m} = {r}", mode=mode)
            if hit:
                rows = {i: x for i, x in rows.items() if i not in hit}
                history[v] = dict(rows)
                retained.add(v)
        elif op == "update":
            m, r = rng.choice([(2, 0), (6, 4)])
            hit = {i for i in rows if i % m == r}
            v = T.update_where(spark, src, f"id % {m} = {r}", {"v": "v + 1"})
            if hit:
                rows = {
                    i: (g, (x + 1) if (i in hit and x is not None) else x)
                    for i, (g, x) in rows.items()
                }
                history[v] = dict(rows)
                retained.add(v)
        elif op == "compact":
            v = T.compact(spark, src, target_files=1)
            history[v] = dict(rows)
            retained.add(v)
        elif op == "optimize":
            v = T.optimize_cluster(spark, src, ["id"], target_files=2)
            history[v] = dict(rows)
            retained.add(v)
        elif op == "purge":
            T.purge_deletes(spark, src)
            v = max(T.versions(spark, src))
            history[v] = dict(rows)
            retained.add(v)
        elif op == "respec":
            cur = tuple(
                T._manifest(spark, src, None).get("partition_cols", ())
            )
            v = T.set_partition_spec(spark, src, () if cur else ("g",))
            history[v] = dict(rows)
            retained.add(v)
        elif op == "rollback":
            candidates = sorted(retained - {max(history)})
            if not candidates:
                continue
            to = rng.choice(candidates)
            v = T.rollback(spark, src, to_version=to)
            rows = dict(history[to])
            history[v] = dict(rows)
            retained.add(v)
        elif op == "vacuum":
            # operational discipline (module docstring): the view's
            # cursor must never fall behind the reaped change feed
            refresh_and_check()
            T.vacuum(spark, src, keep_last=2, min_age_sec=0.0)
            retained = set(sorted(retained)[-2:]) | {max(history)}
        elif op == "refresh":
            refresh_and_check()

    # final: incremental view == from-scratch recompute of the SAME
    # definition, row for row
    refresh_and_check()
    fresh = f"{root}/fresh"
    MV.create_matview(spark, src, fresh, ["g"], _AGGS, where=_WHERE)
    assert _view_state(spark, dst) == _view_state(spark, fresh)
    assert MV.matview_lag(spark, dst)["behind_versions"] == 0


# ---------------------------------------------------------------------------
# Join views (VERDICT r11 item 8): the same full-DML storm on the FACT
# side of a fact⨝broadcast-dim view (the sec_ratios shape) — group and
# filter columns come from the PINNED dim; every refresh must equal the
# pure-Python recompute of join+where+aggregate over the current fact
# rows, and the final state must equal a from-scratch create.
# ---------------------------------------------------------------------------

#: dim: k -> region; fact fks 10/11 have NO dim row (inner-join drops)
_DIM = {k: f"r{k % 3}" for k in range(10)}
_JWHERE = "id % 7 != 3"
_JAGGS = [
    ("count", None, "n"),
    ("sum", "v", "sv"),
    ("avg", "v", "av"),
    ("min", "v", "mn"),
    ("count", "v", "nhi", "v > 50"),
]


def _mkfact(spark, items):
    # items: {id: (fk, v_or_None)}
    rows = [(i, fk, v) for i, (fk, v) in items.items()]
    return spark.createDataFrame(rows, "id long, fk long, v long")


def _jexpected(rows):
    out = {}
    for i, (fk, v) in rows.items():
        if fk not in _DIM or i % 7 == 3:
            continue
        g = _DIM[fk]
        n, sv, nn, mn, nhi = out.get(g, (0, 0, 0, None, 0))
        n += 1
        if v is not None:
            sv += v
            nn += 1
            mn = v if mn is None else min(mn, v)
            if v > 50:
                nhi += 1
        out[g] = (n, sv, nn, mn, nhi)
    return {
        g: (
            n,
            float(sv) if nn else None,
            (float(sv) / nn) if nn else None,
            mn,
            nhi,
        )
        for g, (n, sv, nn, mn, nhi) in out.items()
    }


def _jview_state(spark, dst):
    return {
        r.region: (r.n, r.sv, r.av, r.mn, r.nhi)
        for r in MV.read_matview(spark, dst).collect()
    }


@pytest.mark.parametrize("seed", range(SEEDS))
def test_join_matview_rides_full_dml_fuzz(spark, seed):
    rng = random.Random(8800 + seed)
    root = tempfile.mkdtemp(prefix="mvjfuzz_")
    src, dim, dst = f"{root}/fact", f"{root}/dim", f"{root}/view"

    T.create(
        spark.createDataFrame(
            sorted(_DIM.items()), "k bigint, region string"
        ),
        dim,
    )
    rows = {
        i: (i % 12, None if i % 11 == 5 else i * 3) for i in range(24)
    }
    T.create(_mkfact(spark, rows), src)
    history = {1: dict(rows)}
    retained = {1}
    MV.create_matview(
        spark, src, dst, ["region"], _JAGGS, where=_JWHERE,
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"]},
    )
    # a post-create dim commit must NOT leak into refreshes (the spec
    # pins the dim version the view was defined over)
    T.append(
        spark.createDataFrame([(99, "r9")], "k bigint, region string"), dim
    )
    next_id = 1000

    def refresh_and_check():
        MV.refresh_matview(spark, dst)
        assert _jview_state(spark, dst) == _jexpected(rows), (
            f"seed {seed}: join view diverged from recompute"
        )

    ops = ["append", "merge", "cow_delete", "dv_delete", "update",
           "compact", "rollback", "vacuum", "refresh", "refresh"]

    for _ in range(OPS):
        op = rng.choice(ops)
        if op == "append":
            new = {
                i: (i % 12, None if i % 9 == 2 else i % 97)
                for i in range(next_id, next_id + 6)
            }
            next_id += 6
            v = T.append(_mkfact(spark, new), src)
            rows.update(new)
            history[v] = dict(rows)
            retained.add(v)
        elif op == "merge":
            upd = {
                i: (rows[i][0], (rows[i][1] or 0) + 100)
                for i in sorted(rows)[:2]
            }
            ins = {next_id: (3, 7), next_id + 1: (11, None)}
            next_id += 2
            inc = {**upd, **ins}
            v = T.merge_upsert(_mkfact(spark, inc), src, key_cols=["id"])
            rows.update(inc)
            history[v] = dict(rows)
            retained.add(v)
        elif op in ("cow_delete", "dv_delete"):
            m, r = rng.choice([(3, 0), (4, 1), (5, 2)])
            hit = {i for i in rows if i % m == r}
            mode = "dv" if op == "dv_delete" else "cow"
            v = T.delete_where(spark, src, f"id % {m} = {r}", mode=mode)
            if hit:
                rows = {i: x for i, x in rows.items() if i not in hit}
                history[v] = dict(rows)
                retained.add(v)
        elif op == "update":
            m, r = rng.choice([(2, 0), (6, 4)])
            hit = {i for i in rows if i % m == r}
            v = T.update_where(spark, src, f"id % {m} = {r}", {"v": "v + 1"})
            if hit:
                rows = {
                    i: (fk, (x + 1) if (i in hit and x is not None) else x)
                    for i, (fk, x) in rows.items()
                }
                history[v] = dict(rows)
                retained.add(v)
        elif op == "compact":
            v = T.compact(spark, src, target_files=1)
            history[v] = dict(rows)
            retained.add(v)
        elif op == "rollback":
            candidates = sorted(retained - {max(history)})
            if not candidates:
                continue
            to = rng.choice(candidates)
            v = T.rollback(spark, src, to_version=to)
            rows = dict(history[to])
            history[v] = dict(rows)
            retained.add(v)
        elif op == "vacuum":
            refresh_and_check()
            T.vacuum(spark, src, keep_last=2, min_age_sec=0.0)
            retained = set(sorted(retained)[-2:]) | {max(history)}
        elif op == "refresh":
            refresh_and_check()

    refresh_and_check()
    # from-scratch view of the same definition: note the dim has moved
    # since the incremental view was created, so the fresh view pins
    # the NEW dim head — define it over the dim's ORIGINAL version by
    # time-traveling a clone-free equality instead: the pinned spec
    # means the incremental view must equal a recompute at dim v1,
    # which _jexpected models; the fresh-create comparison uses the
    # dim restored to v1 content via rollback.
    T.rollback(spark, dim, to_version=1)
    fresh = f"{root}/fresh"
    MV.create_matview(
        spark, src, fresh, ["region"], _JAGGS, where=_JWHERE,
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"]},
    )
    assert _jview_state(spark, dst) == _jview_state(spark, fresh)


# ---------------------------------------------------------------------------
# Follow-mode join views (r12, full IVM): the storm now hits BOTH
# sides — fact DML (append/merge/cow+dv delete/update/compact/rollback/
# vacuum) AND dim DML (append new keys / segment updates / key deletes)
# — and every refresh folds the trilinear signed delta
# ΔF⋈D_old + F_old⋈ΔD + ΔF⋈ΔD. Checked against the pure-Python join
# recompute at the CURRENT (fact, dim) state after every refresh, and
# against a from-scratch create at the end.
# ---------------------------------------------------------------------------


def _fexpected(rows, dimmap):
    out = {}
    for i, (fk, v) in rows.items():
        if fk not in dimmap or i % 7 == 3:
            continue
        g = dimmap[fk]
        n, sv, nn, mn, nhi = out.get(g, (0, 0, 0, None, 0))
        n += 1
        if v is not None:
            sv += v
            nn += 1
            mn = v if mn is None else min(mn, v)
            if v > 50:
                nhi += 1
        out[g] = (n, sv, nn, mn, nhi)
    return {
        g: (
            n,
            float(sv) if nn else None,
            (float(sv) / nn) if nn else None,
            mn,
            nhi,
        )
        for g, (n, sv, nn, mn, nhi) in out.items()
    }


@pytest.mark.parametrize("seed", range(SEEDS))
def test_follow_join_matview_rides_two_sided_dml_fuzz(spark, seed):
    rng = random.Random(13200 + seed)
    root = tempfile.mkdtemp(prefix="mvffuzz_")
    src, dim, dst = f"{root}/fact", f"{root}/dim", f"{root}/view"

    dimmap = {k: f"r{k % 3}" for k in range(10)}
    T.create(
        spark.createDataFrame(
            sorted(dimmap.items()), "k bigint, region string"
        ),
        dim,
    )
    rows = {
        i: (i % 14, None if i % 11 == 5 else i * 3) for i in range(24)
    }
    T.create(_mkfact(spark, rows), src)
    history = {1: dict(rows)}
    retained = {1}
    MV.create_matview(
        spark, src, dst, ["region"], _JAGGS, where=_JWHERE,
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"], "mode": "follow"},
    )
    next_id = 1000
    # dim appends start at 10: facts carry fk in 0..13, so the first
    # four appended dim keys MATCH already-present facts — the
    # interesting F_old⋈ΔD case where unmatched facts enter the view
    next_dimk = [10]

    def refresh_and_check(tag):
        MV.refresh_matview(spark, dst)
        assert _jview_state(spark, dst) == _fexpected(rows, dimmap), (
            f"seed {seed} after {tag}: follow view diverged from recompute"
        )

    ops = ["append", "merge", "cow_delete", "dv_delete", "update",
           "compact", "rollback", "vacuum", "refresh", "refresh",
           "dim_append", "dim_update", "dim_delete"]

    for _ in range(OPS):
        op = rng.choice(ops)
        if op == "append":
            new = {
                i: (i % 14, None if i % 9 == 2 else i % 97)
                for i in range(next_id, next_id + 6)
            }
            next_id += 6
            v = T.append(_mkfact(spark, new), src)
            rows.update(new)
            history[v] = dict(rows)
            retained.add(v)
        elif op == "merge":
            upd = {
                i: (rows[i][0], (rows[i][1] or 0) + 100)
                for i in sorted(rows)[:2]
            }
            ins = {next_id: (rng.randrange(14), 7)}
            next_id += 1
            inc = {**upd, **ins}
            v = T.merge_upsert(_mkfact(spark, inc), src, key_cols=["id"])
            rows.update(inc)
            history[v] = dict(rows)
            retained.add(v)
        elif op in ("cow_delete", "dv_delete"):
            m, r = rng.choice([(3, 0), (4, 1), (5, 2)])
            hit = {i for i in rows if i % m == r}
            mode = "dv" if op == "dv_delete" else "cow"
            v = T.delete_where(spark, src, f"id % {m} = {r}", mode=mode)
            if hit:
                rows = {i: x for i, x in rows.items() if i not in hit}
                history[v] = dict(rows)
                retained.add(v)
        elif op == "update":
            m, r = rng.choice([(2, 0), (6, 4)])
            hit = {i for i in rows if i % m == r}
            v = T.update_where(spark, src, f"id % {m} = {r}", {"v": "v + 1"})
            if hit:
                rows = {
                    i: (fk, (x + 1) if (i in hit and x is not None) else x)
                    for i, (fk, x) in rows.items()
                }
                history[v] = dict(rows)
                retained.add(v)
        elif op == "compact":
            v = T.compact(spark, src, target_files=1)
            history[v] = dict(rows)
            retained.add(v)
        elif op == "rollback":
            candidates = sorted(retained - {max(history)})
            if not candidates:
                continue
            to = rng.choice(candidates)
            v = T.rollback(spark, src, to_version=to)
            rows = dict(history[to])
            history[v] = dict(rows)
            retained.add(v)
        elif op == "vacuum":
            # discipline: cursors (fact AND dim versions) must stay
            # retained — refresh first, then reap
            refresh_and_check("pre-vacuum refresh")
            T.vacuum(spark, src, keep_last=2, min_age_sec=0.0)
            retained = set(sorted(retained)[-2:]) | {max(history)}
        elif op == "dim_append":
            k = next_dimk[0]
            next_dimk[0] += 1
            T.append(
                spark.createDataFrame(
                    [(k, f"r{k % 3}")], "k bigint, region string"
                ),
                dim,
            )
            dimmap[k] = f"r{k % 3}"
            # future fact rows can reference it
        elif op == "dim_update":
            if not dimmap:
                continue
            k = rng.choice(sorted(dimmap))
            seg = f"rU{rng.randrange(3)}"
            T.merge_upsert(
                spark.createDataFrame(
                    [(k, seg)], "k bigint, region string"
                ),
                dim,
                key_cols=["k"],
            )
            dimmap[k] = seg
        elif op == "dim_delete":
            if not dimmap:
                continue
            k = rng.choice(sorted(dimmap))
            T.delete_where(spark, dim, f"k = {k}")
            del dimmap[k]
        elif op == "refresh":
            refresh_and_check("refresh")

    refresh_and_check("final")
    fresh = f"{root}/fresh"
    MV.create_matview(
        spark, src, fresh, ["region"], _JAGGS, where=_JWHERE,
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"], "mode": "follow"},
    )
    assert _jview_state(spark, dst) == _jview_state(spark, fresh)


# ---------------------------------------------------------------------------
# ALGEBRAIC follow-mode fuzz (ADVICE r12, medium): the storm above
# includes a `min`, and ANY holistic aggregate routes the WHOLE refresh
# through the touched-group recompute (matview.py) — so the trilinear
# signed feed's fold through _algebraic_delta (the __sign column,
# including the ΔF⋈D_old fact term and the ΔF⋈ΔD sign-PRODUCT cross
# term) was never executed by the fuzz. This variant is count/sum/avg-
# only (min/max-free), so every refresh takes the algebraic branch and
# folds the signed feed by pure delta arithmetic. A sign bug in the
# fact or cross term fails HERE.
# ---------------------------------------------------------------------------

_ALG_JAGGS = [a for a in _JAGGS if a[0] not in ("min", "max")]


def _alg_fexpected(rows, dimmap):
    full = _fexpected(rows, dimmap)
    return {g: (n, sv, av, nhi) for g, (n, sv, av, mn, nhi) in full.items()}


def _alg_view_state(spark, dst):
    return {
        r.region: (r.n, r.sv, r.av, r.nhi)
        for r in MV.read_matview(spark, dst).collect()
    }


def test_follow_algebraic_cross_term_exact(spark):
    """Deterministic trilinear fold: ONE refresh window containing a
    dim update + dim delete + dim append AND fact appends/deletes that
    reference exactly those keys — all three signed terms (fact, dim,
    and the sign-product cross term) are non-empty in a single
    _algebraic_delta fold."""
    root = tempfile.mkdtemp(prefix="mvxterm_")
    src, dim, dst = f"{root}/fact", f"{root}/dim", f"{root}/view"
    dimmap = {k: f"r{k % 3}" for k in range(6)}
    T.create(
        spark.createDataFrame(
            sorted(dimmap.items()), "k bigint, region string"
        ),
        dim,
    )
    rows = {i: (i % 8, None if i % 11 == 5 else i * 3) for i in range(20)}
    T.create(_mkfact(spark, rows), src)
    MV.create_matview(
        spark, src, dst, ["region"], _ALG_JAGGS, where=_JWHERE,
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"], "mode": "follow"},
    )
    # dim: key 1 moves groups, key 2 vanishes, key 6 appears (facts
    # with fk 6/7 existed unmatched from the start)
    T.merge_upsert(
        spark.createDataFrame([(1, "rMOVED")], "k bigint, region string"),
        dim, key_cols=["k"],
    )
    dimmap[1] = "rMOVED"
    T.delete_where(spark, dim, "k = 2")
    del dimmap[2]
    T.append(
        spark.createDataFrame([(6, "rNEW")], "k bigint, region string"), dim
    )
    dimmap[6] = "rNEW"
    # fact: appends referencing the moved (1), deleted (2), new (6) and
    # untouched (3) dim keys — the ΔF⋈ΔD cross term covers +Δfact rows
    # against +/-Δdim rows in every combination — plus a fact delete
    new = {100: (1, 55), 101: (2, 66), 102: (6, 77), 103: (3, None)}
    T.append(_mkfact(spark, new), src)
    rows.update(new)
    T.delete_where(spark, src, "id % 4 = 1")
    rows = {i: x for i, x in rows.items() if i % 4 != 1}
    MV.refresh_matview(spark, dst)
    assert _alg_view_state(spark, dst) == _alg_fexpected(rows, dimmap)
    fresh = f"{root}/fresh"
    MV.create_matview(
        spark, src, fresh, ["region"], _ALG_JAGGS, where=_JWHERE,
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"], "mode": "follow"},
    )
    assert _alg_view_state(spark, dst) == _alg_view_state(spark, fresh)


# ---------------------------------------------------------------------------
# Algebraic (min/max-free) follow-mode join view under the two-sided
# DML storm: exercises the signed-delta fold path end to end (the
# holistic storms above route through the touched-group recompute).
# The snowflake-chain and depth-3 families live in
# test_matview_fuzz_chain.py / test_matview_fuzz_chain3.py (r15 split
# for shard balance).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(SEEDS))
def test_follow_join_matview_algebraic_two_sided_fuzz(spark, seed):
    rng = random.Random(17600 + seed)
    root = tempfile.mkdtemp(prefix="mvafuzz_")
    src, dim, dst = f"{root}/fact", f"{root}/dim", f"{root}/view"

    dimmap = {k: f"r{k % 3}" for k in range(10)}
    T.create(
        spark.createDataFrame(
            sorted(dimmap.items()), "k bigint, region string"
        ),
        dim,
    )
    rows = {
        i: (i % 14, None if i % 11 == 5 else i * 3) for i in range(24)
    }
    T.create(_mkfact(spark, rows), src)
    history = {1: dict(rows)}
    retained = {1}
    MV.create_matview(
        spark, src, dst, ["region"], _ALG_JAGGS, where=_JWHERE,
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"], "mode": "follow"},
    )
    next_id = 1000
    next_dimk = [10]

    def refresh_and_check(tag):
        MV.refresh_matview(spark, dst)
        assert _alg_view_state(spark, dst) == _alg_fexpected(rows, dimmap), (
            f"seed {seed} after {tag}: algebraic follow view diverged"
        )

    ops = ["append", "merge", "cow_delete", "dv_delete", "update",
           "compact", "rollback", "vacuum", "refresh", "refresh",
           "dim_append", "dim_update", "dim_delete"]

    for _ in range(OPS):
        op = rng.choice(ops)
        if op == "append":
            new = {
                i: (i % 14, None if i % 9 == 2 else i % 97)
                for i in range(next_id, next_id + 6)
            }
            next_id += 6
            v = T.append(_mkfact(spark, new), src)
            rows.update(new)
            history[v] = dict(rows)
            retained.add(v)
        elif op == "merge":
            upd = {
                i: (rows[i][0], (rows[i][1] or 0) + 100)
                for i in sorted(rows)[:2]
            }
            ins = {next_id: (rng.randrange(14), 7)}
            next_id += 1
            inc = {**upd, **ins}
            v = T.merge_upsert(_mkfact(spark, inc), src, key_cols=["id"])
            rows.update(inc)
            history[v] = dict(rows)
            retained.add(v)
        elif op in ("cow_delete", "dv_delete"):
            m, r = rng.choice([(3, 0), (4, 1), (5, 2)])
            hit = {i for i in rows if i % m == r}
            mode = "dv" if op == "dv_delete" else "cow"
            v = T.delete_where(spark, src, f"id % {m} = {r}", mode=mode)
            if hit:
                rows = {i: x for i, x in rows.items() if i not in hit}
                history[v] = dict(rows)
                retained.add(v)
        elif op == "update":
            m, r = rng.choice([(2, 0), (6, 4)])
            hit = {i for i in rows if i % m == r}
            v = T.update_where(spark, src, f"id % {m} = {r}", {"v": "v + 1"})
            if hit:
                rows = {
                    i: (fk, (x + 1) if (i in hit and x is not None) else x)
                    for i, (fk, x) in rows.items()
                }
                history[v] = dict(rows)
                retained.add(v)
        elif op == "compact":
            v = T.compact(spark, src, target_files=1)
            history[v] = dict(rows)
            retained.add(v)
        elif op == "rollback":
            candidates = sorted(retained - {max(history)})
            if not candidates:
                continue
            to = rng.choice(candidates)
            v = T.rollback(spark, src, to_version=to)
            rows = dict(history[to])
            history[v] = dict(rows)
            retained.add(v)
        elif op == "vacuum":
            refresh_and_check("pre-vacuum refresh")
            T.vacuum(spark, src, keep_last=2, min_age_sec=0.0)
            retained = set(sorted(retained)[-2:]) | {max(history)}
        elif op == "dim_append":
            k = next_dimk[0]
            next_dimk[0] += 1
            T.append(
                spark.createDataFrame(
                    [(k, f"r{k % 3}")], "k bigint, region string"
                ),
                dim,
            )
            dimmap[k] = f"r{k % 3}"
        elif op == "dim_update":
            if not dimmap:
                continue
            k = rng.choice(sorted(dimmap))
            seg = f"rU{rng.randrange(3)}"
            T.merge_upsert(
                spark.createDataFrame(
                    [(k, seg)], "k bigint, region string"
                ),
                dim,
                key_cols=["k"],
            )
            dimmap[k] = seg
        elif op == "dim_delete":
            if not dimmap:
                continue
            k = rng.choice(sorted(dimmap))
            T.delete_where(spark, dim, f"k = {k}")
            del dimmap[k]
        elif op == "refresh":
            refresh_and_check("refresh")

    refresh_and_check("final")
    fresh = f"{root}/fresh"
    MV.create_matview(
        spark, src, fresh, ["region"], _ALG_JAGGS, where=_JWHERE,
        join={"dim": dim, "key": "fk", "dim_key": "k",
              "dim_cols": ["region"], "mode": "follow"},
    )
    assert _alg_view_state(spark, dst) == _alg_view_state(spark, fresh)
