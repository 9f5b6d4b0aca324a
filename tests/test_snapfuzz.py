"""Adversarial cross-feature DML fuzz on the snaptable (VERDICT r10
item 2): randomly interleave shallow-clone / tag / partition-spec
evolution / column rename (column mapping) / DV-delete / COW-delete /
merge / update / compact / optimize / rollback / vacuum on a family of
tables (a source plus up to two shallow clones, clones-of-clones
included) against a pure-Python model.

After EVERY op the touched table's head must equal the model; at the
end of every sequence EVERY retained version of EVERY table must
time-travel to its recorded contents under its historical column name,
every tag must resolve and read correctly, and a vacuumed-away version
must refuse to read.

Model subtleties the ops encode:
- a delete/update matching nothing commits nothing (version unchanged);
- rename flips the LOGICAL column name — history records the name per
  version, so time travel across a rename must surface each version's
  own name;
- vacuum retains ``keep_last`` + tagged versions; rollback targets are
  drawn from the retained set only;
- shallow_clone is REFUSED iff the source head carries deletion
  vectors (probed from the manifest, asserted both ways);
- vacuum is never run on a table that a live shallow clone references
  (the documented Delta caveat — reaping under a clone is data loss by
  design, not a defect to fuzz for).

Suite mode runs SEEDS sequences of OPS ops; the pre-commit campaign
(SNAPFUZZ_SEEDS/SNAPFUZZ_OPS env) ran 24 seeds x 25 ops = 600 ops
clean (2026-08-15) after the package split.
"""

from __future__ import annotations

import os
import random
import tempfile

import pytest

import sec_financial_pipeline_spark.sources.snaptable as T

SEEDS = int(os.environ.get("SNAPFUZZ_SEEDS", "4"))
OPS = int(os.environ.get("SNAPFUZZ_OPS", "25"))


def _mkdf(spark, items, vn):
    return spark.createDataFrame(
        [(i, x) for i, x in items] or [(None, None)],
        f"id long, {vn} long",
    ).filter("id IS NOT NULL")


def _head_dv(spark, path) -> bool:
    m = T._manifest(spark, path, None)
    return any(e.get("dv") for e in m["files"])


def _cur_spec(spark, path) -> tuple:
    return tuple(T._manifest(spark, path, None).get("partition_cols", ()))


class _Tbl:
    """Pure-Python model of one table."""

    def __init__(self, path, rows, vn, ancestors):
        self.path = path
        self.rows = dict(rows)      # id -> value at head
        self.vn = vn                # logical value-column name at head
        self.history = {1: (vn, dict(rows))}
        self.tags = {}              # name -> version
        self.retained = {1}         # versions still readable
        self.ancestors = set(ancestors)  # tables our files may live in
        self.dropped = set()        # versions vacuum removed

    def commit(self, v):
        self.history[v] = (self.vn, dict(self.rows))
        self.retained.add(v)


def _assert_head(spark, t: _Tbl):
    got = {r["id"]: r[t.vn] for r in T.read(spark, t.path).collect()}
    assert got == t.rows, f"head mismatch at {t.path}"


@pytest.mark.parametrize("seed", range(SEEDS))
def test_cross_feature_fuzz(spark, seed):
    rng = random.Random(8800 + seed)
    root = tempfile.mkdtemp(prefix="snapfuzz_")
    src = _Tbl(f"{root}/t0", {i: i * 10 for i in range(12)}, "v", ())
    T.create(
        _mkdf(spark, src.rows.items(), "v"), src.path
    )
    tables = [src]
    next_id = 1000
    tag_n = 0
    clone_n = 0

    ops = ["append", "merge", "cow_delete", "dv_delete", "update",
           "compact", "optimize", "rollback", "rename", "respec",
           "tag", "delete_tag", "vacuum", "clone", "purge"]

    for _ in range(OPS):
        t = rng.choice(tables)
        op = rng.choice(ops)

        if op == "append":
            new = {i: i * 7 for i in range(next_id, next_id + 5)}
            next_id += 5
            v = T.append(_mkdf(spark, new.items(), t.vn), t.path)
            t.rows.update(new)
            t.commit(v)
        elif op == "merge":
            upd = {i: -i - 1 for i in sorted(t.rows)[:2]}
            ins = {next_id: next_id * 3, next_id + 1: 0}
            next_id += 2
            inc = {**upd, **ins}
            v = T.merge_upsert(
                _mkdf(spark, inc.items(), t.vn), t.path, key_cols=["id"]
            )
            t.rows.update(inc)
            t.commit(v)
        elif op in ("cow_delete", "dv_delete"):
            m, r = rng.choice([(3, 0), (4, 1), (5, 2), (7, 3)])
            hit = {i for i in t.rows if i % m == r}
            mode = "dv" if op == "dv_delete" else "cow"
            v = T.delete_where(spark, t.path, f"id % {m} = {r}", mode=mode)
            if hit:
                t.rows = {i: x for i, x in t.rows.items() if i not in hit}
                t.commit(v)
            else:
                assert v == max(t.history), "no-match delete must not commit"
        elif op == "update":
            m, r = rng.choice([(2, 0), (5, 2), (6, 4)])
            hit = {i for i in t.rows if i % m == r}
            v = T.update_where(
                spark, t.path, f"id % {m} = {r}", {t.vn: f"{t.vn} + 1"}
            )
            if hit:
                t.rows = {
                    i: (x + 1 if i in hit else x) for i, x in t.rows.items()
                }
                t.commit(v)
            else:
                assert v == max(t.history), "no-match update must not commit"
        elif op == "compact":
            v = T.compact(spark, t.path, target_files=1)
            t.commit(v)
        elif op == "optimize":
            v = T.optimize_cluster(spark, t.path, [t.vn], target_files=2)
            t.commit(v)
        elif op == "rollback":
            candidates = sorted(t.retained - {max(t.history)})
            if not candidates:
                continue
            to = rng.choice(candidates)
            v = T.rollback(spark, t.path, to_version=to)
            t.vn, rows = t.history[to]
            t.rows = dict(rows)
            t.commit(v)
        elif op == "rename":
            new_vn = "w" if t.vn == "v" else "v"
            v = T.rename_column(spark, t.path, t.vn, new_vn)
            t.vn = new_vn
            t.commit(v)
        elif op == "respec":
            cur = _cur_spec(spark, t.path)
            v = T.set_partition_spec(
                spark, t.path, () if cur else (t.vn,)
            )
            t.commit(v)
        elif op == "tag":
            name = f"pin{tag_n}"
            tag_n += 1
            v = T.tag(spark, t.path, name)
            assert v == max(t.history)
            t.tags[name] = v
        elif op == "delete_tag":
            if not t.tags:
                continue
            name = rng.choice(sorted(t.tags))
            T.delete_tag(spark, t.path, name)
            del t.tags[name]
        elif op == "vacuum":
            if any(t.path in o.ancestors for o in tables):
                continue  # a live clone references our files
            keep = {max(t.history)}
            vs = sorted(t.retained)
            keep.update(vs[-2:])
            keep.update(t.tags.values())
            T.vacuum(spark, t.path, keep_last=2, min_age_sec=0.0)
            t.dropped |= t.retained - keep
            t.retained = keep
        elif op == "purge":
            T.purge_deletes(spark, t.path)
            # rewrites surviving rows of DV'd files; head rows unchanged.
            # purge on a DV-free head is a no-op (no commit).
            t.history[max(T.versions(spark, t.path))] = (
                t.vn, dict(t.rows)
            )
            t.retained.add(max(T.versions(spark, t.path)))
        elif op == "clone":
            if clone_n >= 2:
                continue
            dst = f"{root}/c{clone_n}"
            has_dv = _head_dv(spark, t.path)
            if has_dv:
                with pytest.raises(ValueError):
                    T.shallow_clone(spark, t.path, dst)
                continue
            T.shallow_clone(spark, t.path, dst)
            clone_n += 1
            c = _Tbl(dst, t.rows, t.vn, {t.path} | t.ancestors)
            tables.append(c)
        _assert_head(spark, t)

    # end-of-sequence: full time travel + tags + vacuumed refusal
    for t in tables:
        for v in sorted(t.retained):
            if v not in t.history:
                continue
            name, model = t.history[v]
            got = {
                r["id"]: r[name]
                for r in T.read(spark, t.path, version=v).collect()
            }
            assert got == model, f"{t.path} v{v}"
        for name, v in t.tags.items():
            assert T.resolve_tag(spark, t.path, name) == v
            cn, model = t.history[v]
            got = {
                r["id"]: r[cn]
                for r in T.read(spark, t.path, tag=name).collect()
            }
            assert got == model, f"{t.path} tag {name}"
        if t.dropped:
            v = sorted(t.dropped)[0]
            with pytest.raises(Exception):
                T.read(spark, t.path, version=v).collect()
