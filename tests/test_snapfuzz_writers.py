"""N-writer linearizability fuzz on the snaptable (VERDICT r11
item 6; widened to 3 writers in r14 — VERDICT r13 item 5).

N OS threads (N writers — the lease machinery treats threads of
one driver as separate writers, ``sources/sink.py``) race randomized
append / merge / delete / compact / tag / vacuum traffic against one
table. Every call either returns a version (ACKNOWLEDGED) or raises a
documented contention error (``SnapshotConflict`` /
``WriterContention``) and is retried; partial effects of losers must
be invisible. Three writers matter beyond two: with one holder and
TWO waiters, a lease release races two acquirers (and a waiter can
time out while another waiter wins) — paths a 2-writer schedule can
never reach.

Linearizability model: the table's version chain IS the linearization.
After the run, every version's contents are read back and each
transition ``states[v-1] -> states[v]`` must be explained by exactly
one acknowledged op that returned ``v`` (its pure-Python application
to ``states[v-1]`` must produce ``states[v]``); ops that returned an
existing version (a delete that matched nothing commits nothing) must
be no-ops on that version's state. Every append and every merge must
be the unique creator of its returned version — an acknowledged
content op with no version to show for it is a LOST UPDATE.

Standing suite: ``WFUZZ_SEEDS`` (default 3) seeds x {2, 3} writers x
``WFUZZ_OPS`` (default 6) ops, plus reader-under-storm at both writer
counts. Campaigns: 200 seeds x 2 writers ran clean pre-r12 commit
(PERF.md r12 notes); 200 seeds x 3 writers ran clean pre-r14 commit
(PERF.md r14 notes). Thread scheduling makes every run a fresh
interleaving.
"""

from __future__ import annotations

import os
import random
import threading
import time

import pytest

import sec_financial_pipeline_spark.sources.snaptable as T
from sec_financial_pipeline_spark.sources.sink import WriterContention

SEEDS = int(os.environ.get("WFUZZ_SEEDS", "3"))
OPS = int(os.environ.get("WFUZZ_OPS", "6"))

#: shared key range both writers fight over (non-commuting merges and
#: deletes live here); appends use writer-unique id blocks
SHARED = 20


def _apply(op, state: dict) -> dict:
    """Pure-Python application of an acknowledged op to a state
    (id -> value)."""
    kind, payload = op[0], op[1]
    out = dict(state)
    if kind == "append":
        for k, v in payload.items():
            assert k not in out, f"append id {k} already present"
            out[k] = v
    elif kind == "merge":  # replace-matched + insert-unmatched
        out.update(payload)
    elif kind == "delete":  # payload = (lo, hi): id in [lo, hi)
        lo, hi = payload
        out = {k: v for k, v in out.items() if not (lo <= k < hi)}
    elif kind in ("compact", "vacuum"):
        pass
    else:  # pragma: no cover
        raise AssertionError(kind)
    return out


def _writer(spark, path, w, seed, ledger, lock, errors):
    rng = random.Random(seed * 1000 + w)
    next_id = [0]

    def fresh_ids(n):
        base = 1_000_000 * (w + 1) + next_id[0]
        next_id[0] += n
        return list(range(base, base + n))

    def mkdf(rows):
        return spark.createDataFrame(
            sorted(rows.items()), "id bigint, v bigint"
        )

    try:
        for opno in range(OPS):
            kind = rng.choice(
                ["append", "merge", "delete", "compact", "tag", "vacuum"]
            )
            uniq = (w + 1) * 100_000 + opno  # values always fresh
            # jittered exponential backoff — the retry discipline every
            # OCC caller needs (and test_snaptable.py's storm documents):
            # zero-backoff retries of the SLOWEST op (merge: read +
            # join + rewrite) against two fast writers re-collide
            # deterministically; a conflict proves ANOTHER writer
            # committed (system-wide progress), per-writer fairness
            # comes from the backoff. The r14 3-writer campaign seeds
            # 52/103/104 starved a merge in exactly this shape; the
            # key-disjoint append rebase (dml._publish_rewrite) removes
            # the append-vs-merge class, backoff covers merge-vs-merge/
            # delete on the shared key range.
            for attempt in range(12):
                if attempt:
                    time.sleep(rng.uniform(0, 0.05 * 2 ** min(attempt, 5)))
                try:
                    if kind == "append":
                        rows = {
                            i: i * 10 + uniq
                            for i in fresh_ids(rng.randint(1, 4))
                        }
                        v = T.append(mkdf(rows), path)
                        payload = rows
                    elif kind == "merge":
                        ks = rng.sample(range(SHARED + 10), rng.randint(1, 4))
                        rows = {k: k * 7 + uniq for k in ks}
                        v = T.merge_into(
                            mkdf(rows), path, ["id"],
                            when_matched="replace",
                            when_not_matched="insert",
                        )
                        payload = rows
                    elif kind == "delete":
                        lo = rng.randrange(SHARED)
                        v = T.delete_where(
                            spark, path,
                            f"id >= {lo} AND id < {lo + 2}",
                            mode=rng.choice(["cow", "dv"]),
                        )
                        payload = (lo, lo + 2)
                    elif kind == "compact":
                        v = T.compact(
                            spark, path, target_files=rng.choice([1, 2])
                        )
                        payload = None
                    elif kind == "vacuum":
                        # keep_last high: retention itself is separately
                        # tested; here vacuum contributes its concurrent
                        # manifest/orphan scanning (age guard protects
                        # the other writer's in-flight files)
                        T.vacuum(spark, path, keep_last=100)
                        payload = None
                        v = None
                    else:  # tag
                        name = f"w{w}-op{opno}"
                        v = T.tag(spark, path, name)
                        with lock:
                            ledger["tags"][name] = v
                        payload = None
                        v = None  # tags never commit
                    if v is not None and kind in (
                        "append", "merge", "delete", "compact"
                    ):
                        with lock:
                            ledger["ops"].append((v, kind, payload, w, opno))
                    break
                except (T.SnapshotConflict, WriterContention):
                    if attempt == 11:
                        raise
    except Exception as e:  # pragma: no cover - surfaced by the test
        errors.append((w, e))


def _run_writers(spark, path, seed, n_writers):
    """Race ``n_writers`` writer threads against ``path``; returns the
    acknowledged-op ledger. Raises if any writer surfaced an error."""
    ledger = {"ops": [], "tags": {}}
    lock = threading.Lock()
    errors: list = []
    ts = [
        threading.Thread(
            target=_writer, args=(spark, path, w, seed, ledger, lock, errors)
        )
        for w in range(n_writers)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    return ledger


@pytest.mark.parametrize("n_writers", [2, 3], ids=["2w", "3w"])
@pytest.mark.parametrize("seed", range(SEEDS))
def test_n_writer_linearizability(spark, tmp_path, seed, n_writers):
    path = str(tmp_path / "t")
    init = {k: k * 100 for k in range(SHARED)}
    T.create(
        spark.createDataFrame(sorted(init.items()), "id bigint, v bigint"),
        path,
    )
    ledger = _run_writers(spark, path, seed, n_writers)

    vs = T.versions(spark, path)
    assert vs[0] == 1 and vs == list(range(1, vs[-1] + 1))
    states = {
        v: {r["id"]: r["v"] for r in T.read(spark, path, version=v).collect()}
        for v in vs
    }
    assert states[1] == init

    by_version: dict[int, list] = {}
    for op in ledger["ops"]:
        by_version.setdefault(op[0], []).append(op)

    for v in vs[1:]:
        prev, cur = states[v - 1], states[v]
        claimed = by_version.get(v, [])
        explainers = [
            op for op in claimed if _apply((op[1], op[2]), prev) == cur
        ]
        if cur != prev:
            # a real state change: at least one acknowledged op must
            # explain it (payload values are op-unique, so two distinct
            # CONTENT ops can never both produce the same transition —
            # but two deletes of the same range are idempotent, and the
            # second legitimately acks the first's version when it
            # matched nothing: campaign seed 109 pinned exactly that)
            assert explainers, (
                f"v{v}: none of {len(claimed)} acked ops explain the "
                f"transition (prev->cur diff "
                f"{set(cur.items()) ^ set(prev.items())})"
            )
            assert len([op for op in explainers if op[1] != "delete"]) <= 1
        else:
            # identity transition (compact / delete-matched-nothing-
            # but-committed can't happen; compact commits same rows):
            # at least one acked row-preserving op must own it
            assert explainers, f"v{v}: phantom identity commit, no ack"
        # every claimed non-explainer (a no-op delete sees the post-
        # state it returned) must leave that state unchanged
        for op in claimed:
            if op in explainers:
                continue
            assert op[1] == "delete" and _apply((op[1], op[2]), cur) == cur, (
                f"v{v}: second acked op {op[1]} (w{op[3]} op{op[4]}) is not "
                f"a no-op — lost update"
            )
    # every append/merge/compact is the unique creator of its version;
    # only deletes may be no-ops sharing another commit's version
    content_acks = [
        op for op in ledger["ops"] if op[1] in ("append", "merge", "compact")
    ]
    assert len({op[0] for op in content_acks}) == len(content_acks), (
        "two non-delete acks share a version — lost update"
    )
    # tags all resolve and read
    for name, v in ledger["tags"].items():
        assert T.resolve_tag(spark, path, name) == v
        assert {
            r["id"]: r["v"] for r in T.read(spark, path, tag=name).collect()
        } == states[v]


@pytest.mark.parametrize("n_writers", [2, 3], ids=["2w", "3w"])
def test_reader_under_writer_storm(spark, tmp_path, n_writers):
    """Snapshot isolation under concurrency: a reader thread polling
    head reads, version lists, and a random retained-version read must
    NEVER crash or observe a torn state (a head read whose row count
    disagrees with re-reading the SAME version) while the writers race
    append/merge/delete/compact/vacuum. At 3 writers the reader also
    overlaps the two-waiters-one-release lease window."""
    path = str(tmp_path / "t")
    init = {k: k * 100 for k in range(SHARED)}
    T.create(
        spark.createDataFrame(sorted(init.items()), "id bigint, v bigint"),
        path,
    )
    ledger = {"ops": [], "tags": {}}
    lock = threading.Lock()
    errors: list = []
    stop = threading.Event()

    def reader():
        rng = random.Random(777)
        last_seen = 0
        try:
            while not stop.is_set():
                vs = T.versions(spark, path)
                assert vs == sorted(vs)
                assert vs[-1] >= last_seen, "head went backwards"
                last_seen = vs[-1]
                # pin a version, read it twice: identical (immutable)
                v = rng.choice(vs)
                a = T.read(spark, path, version=v).count()
                b = T.read(spark, path, version=v).count()
                assert a == b, f"torn read at v{v}: {a} != {b}"
        except Exception as e:  # pragma: no cover
            errors.append(("reader", e))

    rt = threading.Thread(target=reader)
    rt.start()
    ws = [
        threading.Thread(
            target=_writer, args=(spark, path, w, 4242, ledger, lock, errors)
        )
        for w in range(n_writers)
    ]
    for t in ws:
        t.start()
    for t in ws:
        t.join()
    stop.set()
    rt.join()
    assert not errors, errors
