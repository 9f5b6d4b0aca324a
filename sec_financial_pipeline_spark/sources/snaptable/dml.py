"""Row-changing operations: append, constraints, merge/upsert/delete/update, copy-on-write rewrites and the change-feed writers.

Split from the former single-module snaptable.py (VERDICT r10 item 3);
see the package __init__ for the protocol overview.
"""

from __future__ import annotations

import json
import re as _re
import threading
import time
import uuid
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

from sec_financial_pipeline_spark.sources.sink import _hadoop_fs


def _pkg():
    """The snaptable package itself — tunables and the manifest-part
    cache live on the PACKAGE namespace so tests can monkeypatch
    ``snaptable._SPLIT_THRESHOLD`` etc. and every submodule sees the
    patched value at call time."""
    import sec_financial_pipeline_spark.sources.snaptable as p
    return p

from sec_financial_pipeline_spark.sources.snaptable.spec import _TS_QUOTED
from sec_financial_pipeline_spark.sources.snaptable.manifest import (
    SnapshotConflict,
    _CDFDIR,
    _DVDIR,
    _MAX_RETRIES,
    _df_for,
    _erel,
    _ext_roots,
    _manifest,
    _name_chain,
    _select_entries,
    _try_commit,
    _txn_applied,
    _txn_merged,
    _write_files,
)



def append(
    df: DataFrame,
    path: str,
    txn: tuple | None = None,
    optimize_write: bool = False,
) -> int:
    """Transactional append: write immutable files once, then union
    them onto the head manifest. On a version race the append REBASES
    — its files are disjoint from every concurrent change — and
    retries on the new head; data is never written twice.

    ``txn=(app_id, epoch)`` makes the append IDEMPOTENT (Delta's
    txnAppId/txnVersion): if the head already records ``app_id`` at an
    epoch >= ``epoch``, the call is a no-op returning the head version
    — a replayed foreachBatch epoch (Spark re-delivers the in-flight
    epoch after a crash) can never double-append. The check runs both
    before the file write (cheap replay skip) and inside the commit
    loop (a racing same-app writer that wins first is honored; our
    already-written files are left uncommitted and age out via
    vacuum's orphan reaping)."""
    spark = df.sparkSession
    head = _manifest(spark, path, None)
    if _txn_applied(head, txn):
        return head["version"]
    _check_schema(df, head, "append")
    _check_constraints(df, head, "append")
    new_files = _write_files(
        df, path, tuple(head.get("partition_cols", ())),
        head.get("stats_cols", []),
        distribute=optimize_write,
    )
    for _ in range(_MAX_RETRIES):
        head = _manifest(spark, path, None)
        if _txn_applied(head, txn):
            return head["version"]  # same-app racer won; ours orphans
        if not _try_commit(
            spark,
            path,
            head["version"] + 1,
            head["files"] + new_files,
            head["schema"],
            "append",
            head["version"],
            head.get("partition_cols", ()),
            head.get("stats_cols", ()),
            _txn_merged(head, txn),
            head.get("constraints", {}),
        ):
            continue  # lost the race: rebase on the new head
        return head["version"] + 1
    raise SnapshotConflict(
        f"snaptable: append lost {_MAX_RETRIES} version races at {path}"
    )



def _check_schema(df: DataFrame, head: dict, op: str) -> None:
    """Loud schema guard: committing files whose schema differs from
    the table's would poison later reads with a parquet schema-merge
    surprise (missing columns silently null, type widenings engine-
    dependent). Field ORDER is not significant — reads go through the
    manifest schema — but names and types are."""
    table = {
        (f["name"], json.dumps(f["type"], sort_keys=True))
        for f in json.loads(head["schema"])["fields"]
    }
    incoming = {
        (f["name"], json.dumps(f["type"], sort_keys=True))
        for f in json.loads(df.schema.json())["fields"]
    }
    if table != incoming:
        raise ValueError(
            f"snaptable: {op} schema mismatch — table has "
            f"{sorted(n for n, _ in table)}, incoming has "
            f"{sorted(n for n, _ in incoming)} (or a type differs); "
            f"evolve the table explicitly rather than mixing file schemas"
        )



class ConstraintViolation(ValueError):
    """A write's rows violate a table CHECK constraint — the commit is
    refused before any manifest publish."""



def _check_constraints(df: DataFrame, head: dict, op: str) -> None:
    """Enforce the table's CHECK constraints on an incoming batch
    BEFORE committing (Delta's write-time enforcement): SQL CHECK
    semantics — a row violates only when the expression is FALSE
    (NULL passes). All constraints validate in ONE pass: a single
    filter ORing the negations, counted per constraint via
    conditional aggregation."""
    from pyspark.sql import functions as F

    cons = head.get("constraints", {})
    if not cons:
        return
    aggs = [
        F.sum(
            F.when(
                F.coalesce(F.expr(e), F.lit(True)) == False,  # noqa: E712
                1,
            ).otherwise(0)
        ).alias(name)
        for name, e in cons.items()
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {name: int(row[name] or 0) for name in cons if (row[name] or 0) > 0}
    if bad:
        raise ConstraintViolation(
            f"snaptable: {op} violates CHECK constraint(s) "
            + ", ".join(
                f"{n!r} ({c} rows; expr: {cons[n]})" for n, c in bad.items()
            )
            + " — no rows were committed"
        )



def add_constraint(
    spark: SparkSession, path: str, name: str, expr: str
) -> int:
    """ALTER TABLE ADD CONSTRAINT (Delta's CHECK analog): verify the
    EXISTING data satisfies ``expr`` (one scan; NULL passes, SQL CHECK
    semantics), then commit the constraint into the manifest metadata
    — every subsequent create/append/merge/overwrite validates its
    batch against it before publishing. Metadata-only when the scan
    passes; the constraint map is carried forward by every commit
    (compact, rollback, evolve included), so time travel sees each
    version's own constraint set."""
    base = _manifest(spark, path, None)
    cons = dict(base.get("constraints", {}))
    if name in cons:
        raise ValueError(
            f"snaptable: constraint {name!r} already exists at {path} "
            f"(expr: {cons[name]}) — drop it first"
        )
    trial = {**base, "constraints": {name: expr}}
    _check_constraints(_df_for(spark, path, base), trial, "add_constraint")
    cons[name] = expr
    if not _try_commit(
        spark, path, base["version"] + 1, base["files"], base["schema"],
        f"constraint:add:{name}", base["version"],
        base.get("partition_cols", ()), base.get("stats_cols", ()),
        base.get("txn", {}), cons,
    ):
        raise SnapshotConflict(
            f"snaptable: add_constraint at {path} raced a concurrent "
            f"commit; re-run against the new head"
        )
    return base["version"] + 1



def drop_constraint(spark: SparkSession, path: str, name: str) -> int:
    """ALTER TABLE DROP CONSTRAINT: metadata-only commit removing the
    named CHECK; unknown names are a loud error (a typo must not
    silently leave the constraint enforced)."""
    base = _manifest(spark, path, None)
    cons = dict(base.get("constraints", {}))
    if name not in cons:
        raise ValueError(
            f"snaptable: no constraint {name!r} at {path} "
            f"(have: {sorted(cons)})"
        )
    del cons[name]
    if not _try_commit(
        spark, path, base["version"] + 1, base["files"], base["schema"],
        f"constraint:drop:{name}", base["version"],
        base.get("partition_cols", ()), base.get("stats_cols", ()),
        base.get("txn", {}), cons,
    ):
        raise SnapshotConflict(
            f"snaptable: drop_constraint at {path} raced a concurrent "
            f"commit; re-run against the new head"
        )
    return base["version"] + 1



def _rel_resolver(entries: list[dict], ext_roots: list[str] | tuple = ()):
    """URI → manifest entry-key (:func:`_erel`) resolver (factored from
    the bloom builder): match by FULL relative-path suffix, not
    basename — basenames collide on partitioned tables (one Spark
    write reuses part-00000-<uuid> in every partition dir), while
    suffix matching disambiguates and survives a table root containing
    a 'data' segment plus URI %xx encoding in ``input_file_name``.
    Externally-referenced entries (shallow clones) additionally
    require their ABSOLUTE root in the suffix, so an external file can
    never be attributed to a same-named local entry (or vice versa —
    local entries lose ties to externals only when the external's full
    root matches, which a local URI cannot)."""
    from urllib.parse import unquote as _unquote

    cands: dict[str, list[tuple[str, str]]] = {}
    for e in entries:
        x = e.get("x")
        suffix = (
            "/" + e["path"]
            if x is None
            else ext_roots[x].rstrip("/") + "/" + e["path"]
        )
        cands.setdefault(e["path"].rsplit("/", 1)[-1], []).append(
            (suffix, _erel(e))
        )

    def resolve(uri: str) -> str | None:
        dec = _unquote(uri)
        # Prefer the LONGEST matching suffix, not the first in manifest
        # order (ADVICE r10): an external entry's suffix carries its
        # absolute root, so when a local and an external entry share an
        # identical rel path the longer (external) suffix wins
        # deterministically instead of depending on list order.
        best: str | None = None
        best_len = -1
        for name in {uri.rsplit("/", 1)[-1], dec.rsplit("/", 1)[-1]}:
            for suffix, key in cands.get(name, ()):
                if (uri.endswith(suffix) or dec.endswith(suffix)) and len(
                    suffix
                ) > best_len:
                    best, best_len = key, len(suffix)
        return best

    return resolve



def _touched_paths(
    spark: SparkSession,
    path: str,
    base: dict,
    candidates: list[dict],
    touch_cond,
) -> set[str]:
    """Rel paths of candidate files holding >= 1 row where
    ``touch_cond`` is TRUE — the copy-on-write write-set. One
    column-pruned scan (Catalyst reads only the condition's columns)
    ending in a distinct over the scan-materialized ``__rel`` column
    (NOT ``input_file_name()``, which is undefined after the
    deletion-vector anti-join); a rel that cannot be mapped back to a
    manifest entry is a hard error, because treating it as untouched
    would silently keep rows a rewrite was supposed to replace."""
    if not candidates:
        return set()
    rels = [
        r[0]
        for r in _df_for(spark, path, base, candidates, with_meta=True)
        .filter(touch_cond)
        .select("__rel")
        .distinct()
        .collect()
    ]
    return _attribute_rels(
        path, candidates, rels, "copy-on-write rewrite", _ext_roots(base)
    )



def _attribute_rels(
    path: str,
    candidates: list[dict],
    rels: list[str],
    what: str,
    ext_roots: list[str] | tuple = (),
) -> set[str]:
    """Map scan-side ``__rel`` values to manifest entry keys
    (:func:`_erel`): normally an exact match (the qualified-prefix
    strip round-trips the entry path — external entries arrive with
    their ``x{i}:`` prefix already attached by the scan), but
    ``_metadata.file_path`` URI-encodes the on-disk name — a
    Hive-escaped partition dir like ``p=a%3Ab`` arrives doubly escaped
    as ``p=a%253Ab`` — so a decoded exact match is tried next, then the
    suffix resolver; an unattributable rel is a HARD error — treating
    it as untouched would silently keep rows a rewrite was supposed to
    replace."""
    from urllib.parse import unquote as _unquote

    known = {_erel(e) for e in candidates}
    resolve = _rel_resolver(candidates, ext_roots)
    touched = set()
    for rel in rels:
        if rel in known:
            touched.add(rel)
            continue
        dec = _unquote(rel)
        if dec in known:
            touched.add(dec)
            continue
        got = resolve(rel)
        if got is None:
            raise IOError(
                f"snaptable: {what} at {path} could not map scanned file "
                f"{rel!r} back to a manifest entry — refusing to proceed "
                f"(an unattributed file would keep stale rows)"
            )
        touched.add(got)
    return touched



def _partial_rewrite_commit(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    carried: list[dict],
    op: str,
    base: dict,
    txn: tuple | None = None,
    cdf: str | None = None,
    append_rebase: tuple[list, dict] | None = None,
) -> int:
    """Copy-on-write tail shared by delete/merge: materialize only the
    REWRITTEN rows as new files and commit a manifest of carried
    (untouched, by reference — keeping their stats and bloom sidecars;
    the files are immutable so the metadata stays exact) + new entries.
    Same non-rebasing base+1 conflict check as :func:`_rewrite_commit`:
    the surviving-row set is only valid against ``base``. At 100 TB
    this is the difference between rewriting the 3 files a MERGE
    touches and rewriting the table."""
    files = _write_files(
        new_rows, path, tuple(base.get("partition_cols", ())),
        base.get("stats_cols", []),
    )
    all_files = sorted(carried + files, key=lambda e: e["path"])
    return _publish_rewrite(
        spark, path, all_files, op, base, txn, cdf,
        append_rebase=append_rebase,
    )



def _prune_by_key_bounds(
    entries: list[dict],
    key_cols: list[str],
    bounds: dict,
    colmap: dict | None = None,
) -> tuple[list[dict], list[dict]]:
    """Manifest-level pre-prune for MERGE: a file whose footer range
    for ANY key column is disjoint from the source batch's [min, max]
    for that column cannot contain a matching key (a full-key match
    needs every column equal), so it skips the confirming scan
    entirely. Unknown stats keep the file as a candidate — pruning is
    an optimization, never a correctness filter. Returns
    (candidates, ruled_out)."""
    colmap = colmap or {}
    cand, out = [], []
    for e in entries:
        ruled = False
        for c in key_cols:
            st = e.get("stats", {}).get(c)
            p = colmap.get(c)
            for n in [p] if isinstance(p, str) else list(p or ()):
                if st is not None:
                    break
                if n and n != c:
                    st = e.get("stats", {}).get(n)
            b = bounds.get(c)
            if st is None or b is None or b[0] is None:
                continue
            try:
                if st[1] < b[0] or st[0] > b[1]:
                    ruled = True
                    break
            except TypeError:
                continue
        (out if ruled else cand).append(e)
    return cand, out



def merge_upsert(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    txn: tuple | None = None,
    cdf: bool = False,
) -> int:
    """MERGE/upsert in ONE atomic commit: rows of the table whose
    ``key_cols`` match an incoming row are replaced by it; unmatched
    incoming rows are inserted. Equivalent to delete-matching + append,
    but as a single version — a reader can never observe the deleted-
    but-not-yet-reinserted intermediate state the two-commit form
    exposes.

    Scale shape — COPY-ON-WRITE, the Delta/Iceberg MERGE discipline:
    (1) footer min/max pre-prune rules out files whose key range is
    disjoint from the batch's (metadata only, no I/O); (2) one
    column-pruned semi-join scan of the remaining candidates against
    the (typically small, broadcastable) incoming key set finds the
    files actually holding matches; (3) ONLY those files' rows are
    rewritten (survivors via ``left_anti`` + the full batch) — every
    other file is carried into the new manifest by reference, stats
    and bloom sidecars intact. Write amplification is O(touched
    files + batch), not O(table); a pure-insert batch (no key
    matches) writes exactly the batch. Like every rewrite, conflicts
    loudly if any commit raced in after the snapshot was resolved (no
    silent lost update).

    ``txn=(app_id, epoch)`` gives the merge the same replay idempotence
    as :func:`append` — an exactly-once streaming UPSERT sink.

    Note: the ``t.``/``s.`` qualifiers in :func:`merge_into`
    expressions are reserved rewrites onto internal join aliases, so a
    table or source column literally named ``t`` or ``s`` never
    shadows them; reference such a column bare (or as ``t.\\`s\\``)."""
    key_cols = list(key_cols)
    spark = df.sparkSession
    base = _manifest(spark, path, None)
    if _txn_applied(base, txn):
        return base["version"]
    _check_schema(df, base, "merge")
    _check_constraints(df, base, "merge")
    from pyspark.sql import functions as F

    keys = df.select(*key_cols).distinct()
    row = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in key_cols],
        *[F.max(c).alias(f"mx_{c}") for c in key_cols],
    ).collect()[0]
    bounds = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in key_cols}
    cand, ruled_out = _prune_by_key_bounds(
        base["files"], key_cols, bounds, _name_chain(base)
    )
    # partition-key pruning: when a merge key IS a partition column,
    # files in partition dirs outside the batch's value set cannot
    # match — skip them before the confirming scan (capped: a batch
    # with more distinct partition values than files gains nothing)
    part_keys = [
        c for c in key_cols if c in (base.get("partition_cols") or [])
    ]
    if part_keys and len(cand) > 1:
        for c in part_keys:
            vals = keys.select(c).distinct()
            if vals.limit(len(cand) + 1).count() > len(cand):
                continue
            have = {
                None if r[0] is None else str(r[0]) for r in vals.collect()
            }
            still, out = [], []
            for e in cand:
                pv = e.get("partition", {})
                (still if c not in pv or pv[c] in have else out).append(e)
            cand, ruled_out = still, ruled_out + out
    matched = _merge_touched(spark, path, base, cand, keys, key_cols)
    touched = [e for e in cand if _erel(e) in matched]
    carried = ruled_out + [e for e in cand if _erel(e) not in matched]
    t_rows = _df_for(spark, path, base, touched)
    survivors = t_rows.join(keys, key_cols, "left_anti")
    cdf_rel = (
        _write_changes(
            spark, path,
            _tag(t_rows.join(keys, key_cols, "left_semi"), "delete")
            .unionByName(_tag(df, "insert")),
        )
        if cdf
        else None
    )
    return _partial_rewrite_commit(
        spark, path, survivors.unionByName(df), carried, "merge", base, txn,
        cdf=cdf_rel, append_rebase=(key_cols, bounds),
    )



def _key_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    how: str,
    null_safe: bool = False,
) -> DataFrame:
    """Key-equality join for the MERGE family. ``null_safe=True``
    matches NULL keys to NULL keys (``<=>``) — required when the
    source's key set legitimately contains NULL, e.g. a grouped-
    aggregate delta over a NULL-able group column (plain equality
    would never match the existing NULL-key row and every refresh
    would INSERT a duplicate). The right side's key columns are
    renamed before joining so the explicit condition is collision-free
    (semi/anti never expose them; other joins drop them)."""
    if not null_safe:
        return left.join(right, key_cols, how)
    from functools import reduce

    ren = {c: f"__snap_k_{c}" for c in key_cols}
    r = right
    for c, rc in ren.items():
        r = r.withColumnRenamed(c, rc)
    cond = reduce(
        lambda a, b: a & b,
        [left[c].eqNullSafe(r[ren[c]]) for c in key_cols],
    )
    out = left.join(r, cond, how)
    if how in ("left_semi", "left_anti"):
        return out
    return out.drop(*[ren[c] for c in key_cols])



def _merge_touched(
    spark: SparkSession,
    path: str,
    base: dict,
    candidates: list[dict],
    keys: DataFrame,
    key_cols: list[str],
    null_safe: bool = False,
) -> set[str]:
    """Files among ``candidates`` holding >= 1 row whose key appears in
    ``keys`` — the MERGE write-set, found by one column-pruned
    ``left_semi`` scan grouped by the scan-materialized ``__rel``
    (same attribution contract as :func:`_touched_paths`)."""
    if not candidates:
        return set()
    rels = [
        r[0]
        for r in _key_join(
            _df_for(spark, path, base, candidates, with_meta=True),
            keys,
            key_cols,
            "left_semi",
            null_safe,
        )
        .select("__rel")
        .distinct()
        .collect()
    ]
    return _attribute_rels(path, candidates, rels, "merge", _ext_roots(base))



def _is_row_preserving(op: str) -> bool:
    """Layout/metadata-only commits — same logical rows before and
    after. A rewrite whose base was superseded ONLY by these can
    republish (rebase) without recompute; anything else (append,
    merge, delete, overwrite, rollback, evolve) changes rows or schema
    and must conflict."""
    return (
        op == "compact"
        or op == "purge"
        or op.startswith("optimize:")
        or op.startswith("bloom:")
    )



def _publish_rewrite(
    spark: SparkSession,
    path: str,
    files: list[dict],
    op: str,
    base: dict,
    txn: tuple | None,
    cdf: str | None = None,
    tbl_meta: dict | None = None,
    append_rebase: tuple[list, dict] | None = None,
) -> int:
    """Commit ``files`` at head+1 with LOGICAL conflict detection (the
    Delta/Iceberg OCC discipline): on a version race, inspect every
    commit that landed after ``base`` — if ALL are row-preserving
    (compact / optimize / bloom), the rewrite's row set is still
    exactly right, so it republishes against the new head rather than
    failing. Republishing re-exposes this rewrite's file references,
    which is a logical revert of the raced LAYOUT op, never of rows —
    a maintenance loop (OPTIMIZE every N minutes) can no longer starve
    writers. Any interleaved row-changing commit still conflicts
    loudly: there is no window in which a rewrite computed on a stale
    snapshot can silently drop a concurrent append (the lost-update
    anomaly).

    ``append_rebase`` = ``(key_cols, source_bounds)`` narrows the
    conflict for key-equality rewrites (MERGE): an interleaved plain
    APPEND whose every added file is PROVABLY key-disjoint from the
    merge source (file footer stats vs the source batch's [min, max]
    per key column — the same evidence _prune_by_key_bounds trusts)
    cannot contain a row the merge would have matched or inserted
    over, so the merge rebases by CARRYING the appended entries into
    its manifest instead of aborting (Delta's ConcurrentAppend
    discipline). Serial equivalence is exact either way the two
    commits are ordered. Files with missing stats or overlapping
    bounds keep the loud conflict — narrowing is evidence-based, never
    assumed. The 3-writer campaign (r14) found the case this exists
    for: under sustained disjoint-append traffic a merge retried
    against a perpetually-moving head and starved (seeds 103/104).

    Vacuum interaction: a rebase re-references files the raced compact
    dropped; they are protected from vacuum as long as the base
    version is still retained — run vacuum with ``keep_last >= 2``
    when maintenance races live writers (the default)."""
    cur = base
    files = list(files)
    for _ in range(10):
        if _try_commit(
            spark, path, cur["version"] + 1, files, base["schema"], op,
            cur["version"], base.get("partition_cols", ()),
            base.get("stats_cols", ()), _txn_merged(cur, txn),
            cur.get("constraints", {}), cdf, tbl_meta=tbl_meta,
        ):
            return cur["version"] + 1
        head = _manifest(spark, path, None)
        carried_rels = {_erel(e) for e in files}
        for v in range(cur["version"] + 1, head["version"] + 1):
            mv = _manifest(spark, path, v)
            vop = mv.get("op", "")
            if _is_row_preserving(vop):
                continue
            if append_rebase is not None and vop == "append":
                key_cols, bounds = append_rebase
                prev_rels = {
                    _erel(e)
                    for e in _manifest(spark, path, v - 1)["files"]
                }
                added = [
                    e for e in mv["files"] if _erel(e) not in prev_rels
                ]
                # a zero-row file (writers emit one for an empty task
                # partition) has no footer stats but also no rows — it
                # trivially cannot overlap any key
                overlap, _ruled = _prune_by_key_bounds(
                    [e for e in added if e.get("rows") != 0],
                    key_cols, bounds, _name_chain(mv),
                )
                if not overlap:
                    # every appended file key-disjoint: carry it
                    files.extend(
                        e for e in added if _erel(e) not in carried_rels
                    )
                    carried_rels.update(_erel(e) for e in added)
                    continue
            raise SnapshotConflict(
                f"snaptable: {op} at {path} raced a concurrent "
                f"row-changing commit (version {v}) — its "
                f"surviving-row set was computed against version "
                f"{base['version']}, which is no longer the head; re-run"
            )
        cur = head
    raise SnapshotConflict(
        f"snaptable: {op} at {path} lost 10 consecutive rebase races "
        f"against maintenance commits; re-run"
    )



def _rewrite_commit(
    spark: SparkSession,
    path: str,
    kept: DataFrame,
    op: str,
    base: dict,
    txn: tuple | None = None,
) -> int:
    """Shared tail of the FULL rewrite family (compact/overwrite/full
    optimize): materialize the surviving rows as new files and commit
    a manifest listing ONLY them via :func:`_publish_rewrite` (atomic
    version create + logical conflict detection). A full rewrite
    CONVERGES the column mapping: every new file carries the logical
    names, so the new manifest's colmap clears (external parquet
    readers can export again); dropped-name tombstones stay — they
    cost nothing and keep guarding re-adds across rollbacks to
    pre-rewrite versions."""
    files = _write_files(
        kept, path, tuple(base.get("partition_cols", ())),
        base.get("stats_cols", []),
    )
    meta = dict(base.get("tbl_meta") or {})
    meta.pop("colmap", None)
    meta.pop("col_aliases", None)
    # a full rewrite also materializes every externally-referenced file
    # locally (shallow-clone provenance ends here — the clone no longer
    # depends on the source table's files surviving its vacuum)
    meta.pop("ext_roots", None)
    return _publish_rewrite(spark, path, files, op, base, txn, tbl_meta=meta)



def overwrite(df: DataFrame, path: str, txn: tuple | None = None) -> int:
    """INSERT OVERWRITE: replace the table's entire contents in ONE
    atomic commit (the full-refresh T4 shape — truncate+reload without
    the window where readers see a truncated table). Schema must match
    the table's (evolve first); like every rewrite it is non-rebasing —
    a concurrent commit makes it conflict loudly rather than silently
    discarding that commit. ``txn=(app_id, epoch)`` gives replay
    idempotence, so a scheduled refresh job can re-run safely."""
    spark = df.sparkSession
    base = _manifest(spark, path, None)
    if _txn_applied(base, txn):
        return base["version"]
    _check_schema(df, base, "overwrite")
    _check_constraints(df, base, "overwrite")
    return _rewrite_commit(spark, path, df, "overwrite", base, txn)



def _write_changes(spark: SparkSession, path: str, tagged: DataFrame) -> str:
    """Persist a DML commit's change rows (table columns +
    ``_change_type``) as a parquet sidecar under ``cdf/`` — Delta's
    Change Data Feed discipline: appends need no sidecar (their added
    files ARE the inserts), rewrites record exactly what changed so
    downstream feeds never pay an exceptAll over rewritten files.
    Returns the sidecar's table-relative ref (recorded per-commit in
    the manifest, reaped by vacuum when its version drops)."""
    rel = f"{_CDFDIR}/c-{uuid.uuid4().hex[:12]}"
    tagged.write.parquet(f"{path.rstrip('/')}/{rel}")
    return rel



def _tag(df: DataFrame, change_type: str) -> DataFrame:
    from pyspark.sql import functions as F

    return df.withColumn("_change_type", F.lit(change_type))



def _pruned_candidates(base: dict, prune: dict | None) -> list[dict]:
    """Apply scan()-style manifest hints to the touch-detection
    candidate set (see delete_where/update_where docstrings for the
    over-approximation contract)."""
    if not prune:
        return base["files"]
    unknown = set(prune) - {"partitions", "between", "point"}
    if unknown:
        raise ValueError(
            f"snaptable: unknown prune hint(s) {sorted(unknown)} "
            f"(allowed: partitions, between, point)"
        )
    return _select_entries(
        base,
        prune.get("partitions"),
        prune.get("between"),
        prune.get("point"),
    )



def delete_where(
    spark: SparkSession,
    path: str,
    condition,
    mode: str = "cow",
    prune: dict | None = None,
    cdf: bool = False,
) -> int:
    """Transactional DELETE: commit a snapshot without the rows
    matching ``condition`` (a Column or SQL string). Old versions
    keep the deleted rows until vacuumed — which is exactly the
    right-to-be-forgotten caveat: deletion is logical at commit time
    and physical at vacuum time.

    ANSI DELETE semantics: a row is deleted iff the condition is TRUE;
    NULL-condition rows SURVIVE (null-safe ``<=>`` comparison, matching
    SQL ``DELETE WHERE``).

    Two scale shapes, both O(touched), never O(table):

    - ``mode="cow"`` (copy-on-write, the default): one column-pruned
      scan finds the files holding >= 1 matching row; ONLY those are
      rewritten, everything else is carried into the new manifest by
      reference with stats and bloom sidecars intact. Best when
      deletes cluster into few files.
    - ``mode="dv"`` (merge-on-read deletion vectors — Delta's DV /
      Iceberg's position-delete analog): NO data file is rewritten at
      all; the commit writes a (file, physical row position) sidecar
      and attaches it to the touched entries, and every reader
      anti-joins it during the scan. Write cost O(deleted rows) — the
      shape for small scattered deletes over huge files; reads pay a
      (usually broadcast) anti-join until :func:`purge_deletes` or
      :func:`compact` materializes the survivors.

    A delete that matches nothing commits nothing and returns the
    current head version.

    ``prune`` (optional): scan()-style manifest hints —
    ``{"partitions": {...}, "between": (col, lo, hi) | [...],
    "point": (col, v)}`` — that confine even the TOUCH-DETECTION scan
    to the matching files (without it, detection reads the condition's
    columns across the whole table — column-pruned, but O(table) I/O).
    CONTRACT: the hints must OVER-approximate the condition — a row
    matching ``condition`` in a file the hints exclude will NOT be
    deleted. Use for the partition-confined / range-confined deletes
    that dominate at 100 TB.

    ``cdf=True`` additionally persists the deleted rows as a tagged
    change sidecar (Delta Change Data Feed): :func:`change_feed` and
    ``readChangeFeed`` streaming then serve this commit without any
    diff computation."""
    from pyspark.sql import functions as F

    if mode not in ("cow", "dv"):
        raise ValueError(f"snaptable: delete mode must be cow|dv, got {mode!r}")
    cond = F.expr(condition) if isinstance(condition, str) else condition
    is_del = cond.eqNullSafe(F.lit(True))
    base = _manifest(spark, path, None)
    candidates = _pruned_candidates(base, prune)
    matched = _touched_paths(spark, path, base, candidates, is_del)
    if not matched:
        return base["version"]
    touched = [e for e in base["files"] if _erel(e) in matched]
    carried = [e for e in base["files"] if _erel(e) not in matched]
    cdf_rel = (
        _write_changes(
            spark, path,
            _tag(_df_for(spark, path, base, touched).filter(is_del), "delete"),
        )
        if cdf
        else None
    )
    if mode == "cow":
        kept = _df_for(spark, path, base, touched).filter(~is_del)
        return _partial_rewrite_commit(
            spark, path, kept, carried, "delete", base, cdf=cdf_rel
        )
    # dv: write the deleted (rel, pos) pairs as a parquet sidecar —
    # positions are PHYSICAL row indexes, and this scan already applies
    # prior DVs, so re-deleting an already-deleted position is
    # impossible; successive DVs on one file are disjoint and stack as
    # a list of refs the reader unions
    dv_rel = f"{_DVDIR}/c-{uuid.uuid4().hex[:12]}"
    (
        _df_for(spark, path, base, touched, with_meta=True)
        .filter(is_del)
        .select(F.col("__rel").alias("path"), F.col("__pos").alias("pos"))
        .write.parquet(f"{path.rstrip('/')}/{dv_rel}")
    )
    new_touched = [
        {**e, "dv": list(e.get("dv", [])) + [dv_rel]} for e in touched
    ]
    return _publish_rewrite(
        spark, path, sorted(carried + new_touched, key=lambda e: e["path"]),
        "delete", base, None, cdf_rel,
    )



def _rewrite_ts(expr: str) -> str:
    """Rewrite the merge-expression qualifiers ``t.``/``s.`` to the
    reserved internal join aliases, skipping single- AND double-quoted
    string literals (Spark's default mode reads ``\"...\"`` as a string)
    plus backtick-quoted identifiers. The join sides are aliased
    ``__snap_t``/``__snap_s`` internally, so a table or source column
    literally named ``t`` or ``s`` can never shadow the documented
    alias forms (it previously raised AMBIGUOUS_REFERENCE); such a
    column is still addressable bare or as ``t.\\`s\\``."""
    parts = _TS_QUOTED.split(expr)
    for i in range(0, len(parts), 2):
        p = _re.sub(r"(?<![\w.`])[tT]\s*\.", "__snap_t.", parts[i])
        parts[i] = _re.sub(r"(?<![\w.`])[sS]\s*\.", "__snap_s.", p)
    return "".join(parts)



def _ts_expr(a) -> "F.Column":
    from pyspark.sql import functions as F

    return F.expr(_rewrite_ts(a)) if isinstance(a, str) else a



def _norm_matched_clauses(when_matched, schema) -> list[tuple]:
    """Normalize ``when_matched`` dict/clause-list forms to
    ``[(cond_sql_or_None, "delete" | update_dict), ...]`` and validate
    update targets against the table schema. ``"replace"`` inside a
    clause list expands to the all-columns-from-source update dict."""
    names = {f.name for f in schema.fields}
    raw = (
        [(None, when_matched)]
        if isinstance(when_matched, dict)
        else list(when_matched)
    )
    out = []
    for item in raw:
        if not isinstance(item, (tuple, list)) or len(item) != 2:
            raise ValueError(
                "snaptable: each when_matched clause must be a "
                f"(condition, action) pair, got {item!r}"
            )
        cond, act = item
        if act == "replace":
            act = {f.name: f"s.`{f.name}`" for f in schema.fields}
        if act != "delete" and not isinstance(act, dict):
            raise ValueError(
                "snaptable: clause action must be 'delete', 'replace' "
                f"or an update dict, got {act!r}"
            )
        if isinstance(act, dict):
            for c in act:
                if c not in names:
                    raise ValueError(
                        f"snaptable: merge_into updates unknown column {c!r}"
                    )
        out.append((cond, act))
    if not out:
        raise ValueError("snaptable: when_matched clause list is empty")
    return out



def _not_matched_rows(
    spark: SparkSession,
    path: str,
    base: dict,
    source: DataFrame,
    key_cols: list[str],
    when_not_matched,
    schema,
    null_safe: bool = False,
) -> DataFrame | None:
    """Rows :func:`merge_into` inserts for source keys absent from the
    TARGET (anti-join against the full key set — matches can live in
    any file, not only touched ones). ``"insert"`` takes the source row
    verbatim (full-schema guard upstream); a dict builds each table
    column from its expression over the aliased source (``s.`` or bare
    names), defaulting absent columns to the same-named source column
    when one exists, else a typed NULL. Returns None for ``"ignore"``."""
    from pyspark.sql import functions as F

    if when_not_matched == "ignore":
        return None
    unmatched = _key_join(
        source,
        _df_for(spark, path, base).select(*key_cols).distinct(),
        key_cols,
        "left_anti",
        null_safe,
    )
    if when_not_matched == "insert":
        return unmatched.select(*[f.name for f in schema.fields])
    aliased = unmatched.alias("__snap_s")
    cols = []
    for f in schema.fields:
        if f.name in when_not_matched:
            e = _ts_expr(when_not_matched[f.name])
        elif f.name in source.columns:
            e = F.col(f"__snap_s.`{f.name}`")
        else:
            e = F.lit(None)
        cols.append(e.cast(f.dataType).alias(f.name))
    return aliased.select(*cols)



def merge_into(
    source: DataFrame,
    path: str,
    key_cols: list[str],
    when_matched="replace",
    when_not_matched: str = "insert",
    txn: tuple | None = None,
    cdf: bool = False,
    unique_source: bool = False,
    null_safe_keys: bool = False,
    small_source_rows: int | None = None,
) -> int:
    """Full MERGE INTO clause semantics (Delta's WHEN MATCHED / WHEN
    NOT MATCHED), one atomic copy-on-write commit:

    - ``when_matched="replace"``: matched target rows are replaced by
      the source row (:func:`merge_upsert`'s behavior);
    - ``when_matched="delete"``: matched target rows are removed;
    - ``when_matched={col: sql_expr}``: matched rows are UPDATED —
      expressions may reference target columns as ``t.col`` and source
      columns as ``s.col`` (unqualified names resolve to the target);
    - ``when_matched=[(cond, action), ...]``: CONDITIONAL clauses
      (Delta's ``WHEN MATCHED AND cond THEN ...``), evaluated in order
      with first-match-wins per row; ``cond`` is a SQL boolean over
      ``t.``/``s.`` (``None`` = always), ``action`` is ``"delete"`` or
      an update dict. A matched row satisfying NO clause is left
      unchanged (Delta semantics) and never appears in the change feed;
    - ``when_not_matched="insert"``: source rows with no target match
      are appended; ``"ignore"``: they are dropped;
    - ``when_not_matched={col: sql_expr}``: INSERT with expressions
      (Delta's ``WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs)``) —
      expressions over the source row (``s.`` or bare names); table
      columns absent from the dict default to the same-named source
      column when one exists, else typed NULL.

    Same COW scale shape as :func:`merge_upsert`: key-bounds +
    partition pre-prune, one semi-join confirm scan, only touched
    files rewritten. Source must carry exactly the table schema for
    replace/insert (schema guard); for update/delete-only merges with
    ``when_not_matched="ignore"`` the source needs only the key and
    referenced columns. Requires unique keys on the source side (the
    Delta precondition — two source rows matching one target row is
    ambiguous): enforced with one aggregation, loud error —
    ``unique_source=True`` skips that job when uniqueness is
    STRUCTURAL (the source is a groupBy on exactly ``key_cols``, a
    primary-keyed extract, ...); passing it with a duplicated source
    silently picks arbitrary rows, so only assert what the plan
    guarantees.

    ``null_safe_keys=True`` matches keys with ``<=>`` (NULL = NULL):
    required when the source key set legitimately contains NULL —
    e.g. a grouped-aggregate delta over a NULL-able group column —
    where plain equality would never match the existing NULL-key
    target row and re-insert it on every merge. Costs nothing extra
    beyond disabling footer-bounds pruning for key columns whose
    source values include NULL (a NULL match may hide in any file)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    key_cols = list(key_cols)
    spark = source.sparkSession
    if not isinstance(when_not_matched, dict) and when_not_matched not in (
        "insert", "ignore",
    ):
        raise ValueError(
            f"snaptable: when_not_matched must be insert|ignore|{{col: "
            f"expr}}, got {when_not_matched!r}"
        )
    if when_matched == "replace" and isinstance(when_not_matched, dict):
        raise ValueError(
            "snaptable: when_matched='replace' requires a full-schema "
            "source; combine insert expressions with clause-list or "
            "dict when_matched forms instead"
        )
    base = _manifest(spark, path, None)
    if _txn_applied(base, txn):
        return base["version"]
    needs_full_source = when_matched == "replace" or when_not_matched == "insert"
    if needs_full_source:
        _check_schema(source, base, "merge")
    if not unique_source:
        dupes = (
            source.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dupes:
            raise ValueError(
                f"snaptable: merge_into source has {dupes} duplicate key "
                f"group(s) on {key_cols} — multiple source rows matching "
                f"one target row is ambiguous (dedupe the source first)"
            )
    row = source.agg(
        *[F.min(c).alias(f"mn_{c}") for c in key_cols],
        *[F.max(c).alias(f"mx_{c}") for c in key_cols],
        *[
            F.max(F.col(c).isNull()).alias(f"hn_{c}")
            for c in key_cols
        ],
        F.count(F.lit(1)).alias("__n_src"),
    ).collect()[0]
    # ``small_source_rows`` (r14): callers with an already-materialized
    # source (the matview delta) used to run a separate count() job just
    # to decide whether to collapse it to one partition so each internal
    # merge job schedules 1 task — the count now rides the bounds
    # aggregation above for free
    if small_source_rows is not None and row["__n_src"] <= small_source_rows:
        source = source.coalesce(1)
    keys = source.select(*key_cols).distinct()
    # a NULL source key is invisible to footer min/max, so under
    # null-safe matching a column whose key set contains NULL cannot
    # rule ANY file out (the matching target row may be a NULL hiding
    # in any file)
    bounds = {
        c: (
            (None, None)
            if null_safe_keys and row[f"hn_{c}"]
            else (row[f"mn_{c}"], row[f"mx_{c}"])
        )
        for c in key_cols
    }
    cand, ruled_out = _prune_by_key_bounds(
        base["files"], key_cols, bounds, _name_chain(base)
    )
    matched_paths = _merge_touched(
        spark, path, base, cand, keys, key_cols, null_safe_keys
    )
    touched = [e for e in cand if _erel(e) in matched_paths]
    carried = ruled_out + [e for e in cand if _erel(e) not in matched_paths]
    schema = StructType.fromJson(json.loads(base["schema"]))
    t_rows = _df_for(spark, path, base, touched)

    if when_matched == "replace":
        kept = _key_join(t_rows, keys, key_cols, "left_anti", null_safe_keys)
        # replace+insert == merge_upsert; replace+ignore keeps only the
        # source rows that matched a TARGET row (every match lives in a
        # touched file, so t_rows' keys are the full matched-key set —
        # NOT `keys`, which is the source's own key set and would make
        # the semi-join a no-op)
        new_rows = kept.unionByName(
            _key_join(
                source,
                t_rows.select(*key_cols).distinct(),
                key_cols,
                "left_semi",
                null_safe_keys,
            )
            if when_not_matched == "ignore"
            else source
        )
    elif when_matched == "delete":
        new_rows = _key_join(
            t_rows, keys, key_cols, "left_anti", null_safe_keys
        )
        inserts = _not_matched_rows(
            spark, path, base, source, key_cols, when_not_matched, schema,
            null_safe_keys,
        )
        if inserts is not None:
            new_rows = new_rows.unionByName(inserts)
    elif isinstance(when_matched, (dict, list)):
        clauses = _norm_matched_clauses(when_matched, schema)
        # explicit match marker: probing "any source column not null"
        # would misclassify a matched source row whose non-key values
        # are legitimately NULL
        src_aliased = source.withColumn("__m", F.lit(1)).alias("__snap_s")
        if null_safe_keys:
            from functools import reduce

            joined = t_rows.alias("__snap_t").join(
                src_aliased,
                reduce(
                    lambda a, b: a & b,
                    [
                        F.col(f"__snap_t.`{c}`").eqNullSafe(
                            F.col(f"__snap_s.`{c}`")
                        )
                        for c in key_cols
                    ],
                ),
                "left",
            )
        else:
            joined = t_rows.alias("__snap_t").join(
                src_aliased, key_cols, "left"
            )
        is_m = F.col("__snap_s.__m").isNotNull()
        # first-match-wins clause index per row: -1 = untouched (row
        # unmatched, or matched but satisfying no clause — Delta keeps
        # those verbatim). CaseWhen picks the FIRST true branch, so a
        # later clause's s.-referencing condition never fires on rows
        # an earlier clause claimed.
        idx = F.when(~is_m, F.lit(-1))
        for i, (cond, _act) in enumerate(clauses):
            c = F.lit(True) if cond is None else _ts_expr(cond)
            idx = idx.when(c, F.lit(i))
        marked = joined.withColumn("__c", idx.otherwise(F.lit(-1)))
        del_idx = [i for i, (_c, a) in enumerate(clauses) if a == "delete"]
        survivors = (
            marked.filter(~F.col("__c").isin(del_idx))
            if del_idx
            else marked
        )
        out_cols = []
        for f in schema.fields:
            expr = None
            for i, (_cond, act) in enumerate(clauses):
                if isinstance(act, dict) and f.name in act:
                    e = _ts_expr(act[f.name]).cast(f.dataType)
                    expr = (
                        F.when(F.col("__c") == i, e)
                        if expr is None
                        else expr.when(F.col("__c") == i, e)
                    )
            base_col = F.col(f"__snap_t.`{f.name}`")
            out_cols.append(
                (expr.otherwise(base_col) if expr is not None else base_col)
                .alias(f.name)
            )
        new_rows = survivors.select(*out_cols)
        inserts = _not_matched_rows(
            spark, path, base, source, key_cols, when_not_matched, schema,
            null_safe_keys,
        )
        if inserts is not None:
            new_rows = new_rows.unionByName(inserts)
    else:
        raise ValueError(
            f"snaptable: when_matched must be replace|delete|{{col: expr}}|"
            f"[(cond, action), ...], got {when_matched!r}"
        )
    _check_constraints(new_rows, base, "merge")
    cdf_rel = None
    if cdf:
        # change rows = matched target rows a clause actually CLAIMED
        # (pre-image, tagged delete) + the rows the merge adds
        # (post-image/inserts). Unmatched target rows — and, in the
        # clause form, matched rows no clause applied to — never
        # appear: no rewrite churn in the feed.
        if when_matched in ("delete", "replace"):
            pre = _tag(
                _key_join(t_rows, keys, key_cols, "left_semi", null_safe_keys),
                "delete",
            )
        else:
            pre = _tag(
                marked.filter(F.col("__c") >= 0).select(
                    *[
                        F.col(f"__snap_t.`{f.name}`").alias(f.name)
                        for f in schema.fields
                    ]
                ),
                "delete",
            )
        if when_matched == "delete":
            post_matched = pre.limit(0).drop("_change_type")
        elif when_matched == "replace":
            post_matched = _key_join(
                source,
                t_rows.select(*key_cols).distinct(),
                key_cols,
                "left_semi",
                null_safe_keys,
            )
        else:
            upd_idx = [
                i for i, (_c, a) in enumerate(clauses) if isinstance(a, dict)
            ]
            post_matched = marked.filter(F.col("__c").isin(upd_idx)).select(
                *out_cols
            )
        changes = pre.unionByName(_tag(post_matched, "insert"))
        if when_matched == "replace":
            if when_not_matched == "insert":
                not_matched = _key_join(
                    source,
                    _df_for(spark, path, base).select(*key_cols).distinct(),
                    key_cols,
                    "left_anti",
                    null_safe_keys,
                ).select(*[f.name for f in schema.fields])
                changes = changes.unionByName(_tag(not_matched, "insert"))
        elif inserts is not None:
            changes = changes.unionByName(_tag(inserts, "insert"))
        cdf_rel = _write_changes(spark, path, changes)
    return _partial_rewrite_commit(
        spark, path, new_rows, carried, "merge", base, txn, cdf=cdf_rel,
        append_rebase=(key_cols, bounds),
    )



def update_where(
    spark: SparkSession,
    path: str,
    condition,
    assignments: dict,
    prune: dict | None = None,
    cdf: bool = False,
) -> int:
    """Transactional UPDATE (the third leg of the DML triad):
    ``assignments`` maps column -> SQL expression string or Column,
    applied to rows where ``condition`` is TRUE (ANSI semantics: NULL
    condition leaves the row untouched). COPY-ON-WRITE like
    :func:`delete_where`: one column-pruned scan finds the touched
    files, only they are rewritten (matched rows with assignments
    applied, unmatched rows verbatim), everything else carried by
    reference. The change feed shows an update as delete(old) +
    insert(new) — the minimal CDF model. Updating a partition column
    is allowed (rows migrate dirs in the rewrite); assigned columns
    must already exist (evolve first), and the incoming expressions
    are cast back to the column's manifest type so a rewrite can never
    drift the schema. Validates CHECK constraints on the REWRITTEN
    rows before publishing. A no-match update commits nothing.
    ``prune`` takes the same over-approximating manifest hints as
    :func:`delete_where` to confine the touch-detection scan."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    cond = F.expr(condition) if isinstance(condition, str) else condition
    is_upd = cond.eqNullSafe(F.lit(True))
    base = _manifest(spark, path, None)
    schema = StructType.fromJson(json.loads(base["schema"]))
    types = {f.name: f.dataType for f in schema.fields}
    for c in assignments:
        if c not in types:
            raise ValueError(
                f"snaptable: update_where assigns unknown column {c!r} "
                f"(have {sorted(types)}; evolve_schema first)"
            )
    matched = _touched_paths(
        spark, path, base, _pruned_candidates(base, prune), is_upd
    )
    if not matched:
        return base["version"]
    touched = [e for e in base["files"] if _erel(e) in matched]
    carried = [e for e in base["files"] if _erel(e) not in matched]
    rows = _df_for(spark, path, base, touched)
    out_cols = []
    for f in schema.fields:
        if f.name in assignments:
            a = assignments[f.name]
            new_v = a if isinstance(a, Column) else F.expr(a)
            out_cols.append(
                F.when(is_upd, new_v.cast(f.dataType))
                .otherwise(F.col(f.name))
                .alias(f.name)
            )
        else:
            out_cols.append(F.col(f.name))
    rewritten = rows.select(*out_cols)
    _check_constraints(rewritten, base, "update")
    cdf_rel = None
    if cdf:
        # pre-image (matched rows, tagged delete) + post-image (the
        # same rows with assignments applied, tagged insert)
        pre = rows.filter(is_upd)
        post = pre.select(*out_cols)
        cdf_rel = _write_changes(
            spark, path, _tag(pre, "delete").unionByName(_tag(post, "insert"))
        )
    return _partial_rewrite_commit(
        spark, path, rewritten, carried, "update", base, cdf=cdf_rel
    )



def purge_deletes(spark: SparkSession, path: str) -> int:
    """Materialize every deletion vector: rewrite ONLY the DV-carrying
    files as their surviving rows (plain entries carried by reference)
    and commit — after which reads pay no anti-join and vacuum can
    reap the old files and sidecars. Row-preserving (same logical
    rows), so it rebases over concurrent maintenance and produces an
    EMPTY change feed — layout hygiene invisible to downstream
    consumers, like :func:`compact`. No-op (no commit) on a DV-free
    table."""
    base = _manifest(spark, path, None)
    dved = [e for e in base["files"] if e.get("dv")]
    if not dved:
        return base["version"]
    carried = [e for e in base["files"] if not e.get("dv")]
    alive = _df_for(spark, path, base, dved)
    return _partial_rewrite_commit(spark, path, alive, carried, "purge", base)
