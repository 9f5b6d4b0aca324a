"""Whole-table lifecycle: rollback, deep/shallow clone, vacuum.

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

from sec_financial_pipeline_spark.sources.snaptable.manifest import (
    SnapshotConflict,
    _CDFDIR,
    _DATADIR,
    _DVDIR,
    _PARTSSUB,
    _SNAPDIR,
    _df_for,
    _erel,
    _ext_roots,
    _manifest,
    _snap_path,
    _try_commit,
    create,
    tags,
    version_at,
    versions,
)
from sec_financial_pipeline_spark.sources.snaptable.dml import add_constraint



def rollback(spark: SparkSession, path: str, to_version: int) -> int:
    """Restore an old snapshot as a NEW head commit (history is
    append-only — the bad versions remain inspectable until vacuum).
    O(1): the new manifest references the old version's files. Like
    every rewrite, NON-rebasing: a commit racing in after the head was
    resolved makes this a SnapshotConflict rather than silently
    discarding that commit's rows. The txn watermark map carries
    forward from the HEAD, not the rollback target: the DATA rolls
    back, the applied-epoch memory must not — otherwise a replayed
    streaming epoch would double-apply after a rollback. CHECK
    constraints likewise carry from the HEAD (table policy outlives a
    data restore); note the restored data itself is NOT re-verified —
    restoring a version that predates a constraint may re-expose rows
    that would fail it today (the same caveat Delta documents for
    RESTORE on constrained tables). The column mapping (tbl_meta)
    restores WITH the target: the mapping describes the target's
    files, so reviving pre-rename files under the head's (possibly
    cleared) map would read their renamed columns as NULL."""
    target = _manifest(spark, path, to_version)
    head = _manifest(spark, path, None)
    if not _try_commit(
        spark,
        path,
        head["version"] + 1,
        target["files"],
        target["schema"],
        f"rollback:{to_version}",
        head["version"],
        target.get("partition_cols", ()),
        target.get("stats_cols", ()),
        head.get("txn", {}),
        head.get("constraints", {}),
        tbl_meta=target.get("tbl_meta") or {},
    ):
        raise SnapshotConflict(
            f"snaptable: rollback at {path} raced a concurrent commit; "
            f"re-run against the new head"
        )
    return head["version"] + 1



def shallow_clone(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    version: int | None = None,
    as_of=None,
) -> int:
    """SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW CLONE`` /
    zero-copy table branching): create a NEW independent table at
    ``dst_path`` whose version-1 manifest REFERENCES the source
    snapshot's files in place — no data copied, O(metadata) regardless
    of table size. At 100 TB this is how a dev/test branch, a
    what-if migration, or a reproducible experiment pin is created in
    seconds instead of a petabyte copy.

    The clone is a full table: appends, DELETE/UPDATE/MERGE (both COW
    and deletion-vector modes), OPTIMIZE, schema evolution, time
    travel and CDF all work, and NONE of them touch the source —
    rewrites materialize locally and drop the foreign reference; a
    full rewrite (compact/overwrite) severs the provenance entirely
    (``ext_roots`` clears with it). Entries referencing the source
    carry ``x: i`` into the manifest's ``tbl_meta.ext_roots`` list;
    their scan/DV/attribution key is the ``x{i}:``-prefixed rel path
    (:func:`_erel`), so clone-local deletion vectors and rewrite
    attribution can never collide with same-named local files.
    ``version`` / ``as_of`` clone a historical snapshot (time-travel
    clone). Cloning a clone remaps the inner references to their
    ORIGINAL roots (provenance never chains through intermediate
    clones).

    Caveats (same as Delta documents for shallow clones): the clone
    depends on the source's files surviving — ``vacuum`` on the SOURCE
    after source deletes/rewrites can reap files the clone still
    references (run ``compact`` on the clone first to materialize);
    the clone's own vacuum only ever touches its own root. REFUSED for
    snapshots carrying deletion vectors (their sidecar coordinates are
    source-relative; ``purge_deletes`` on the source first — the same
    converge contract as :func:`export_file_list`)."""
    import os

    if versions(spark, dst_path):
        raise FileExistsError(
            f"snaptable: clone target already exists at {dst_path}"
        )
    if as_of is not None:
        if version is not None:
            raise ValueError("snaptable: clone takes version OR as_of, not both")
        version = version_at(spark, src_path, as_of)
    m = _manifest(spark, src_path, version)
    if any(e.get("dv") for e in m["files"]):
        raise ValueError(
            "snaptable: clone refused — source snapshot carries deletion "
            "vectors whose sidecar coordinates are source-relative (run "
            "purge_deletes on the source first)"
        )
    src_root = src_path.rstrip("/")
    if "://" not in src_root:
        src_root = os.path.abspath(src_root)
    src_ext = _ext_roots(m)
    roots: list[str] = []

    def _idx(r: str) -> int:
        r = r.rstrip("/")
        if r not in roots:
            roots.append(r)
        return roots.index(r)

    files = []
    seen = set()
    for e in m["files"]:
        e = dict(e)
        owner = src_root if e.get("x") is None else src_ext[e["x"]]
        e["x"] = _idx(owner)
        key = (e["x"], e["path"])
        if key in seen:
            raise IOError(
                f"snaptable: clone found duplicate entry {key} in the "
                f"source manifest — refusing"
            )
        seen.add(key)
        files.append(e)
    meta = dict(m.get("tbl_meta") or {})
    if roots:
        meta["ext_roots"] = roots
    if not _try_commit(
        spark, dst_path, 1, sorted(files, key=_erel), m["schema"],
        f"clone:{src_root}@v{m['version']}", None,
        m.get("partition_cols", ()), m.get("stats_cols", ()), {},
        m.get("constraints", {}), tbl_meta=meta or None,
    ):
        raise SnapshotConflict(f"snaptable: concurrent create at {dst_path}")
    return 1



def clone(
    spark: SparkSession,
    src: str,
    dst: str,
    version: int | None = None,
    as_of=None,
    shallow: bool = False,
) -> int:
    """CLONE a snapshot of ``src`` as a NEW independent table at
    ``dst`` (Delta's CLONE semantics, both modes; deep is the default,
    like Delta's):

    - DEEP (``shallow=False``): materialize the rows as the clone's own
      files — O(data), shares nothing with the source; vacuuming
      either table never affects the other. ``version`` / ``as_of``
      time-travel; partitioning and CHECK constraints carry over;
      deletion vectors materialize away.
    - SHALLOW (``shallow=True``): O(metadata) zero-copy branching via
      :func:`shallow_clone` — the clone's manifest references the
      source files in place. See its docstring for the vacuum caveat
      and the DV refusal contract."""
    if shallow:
        return shallow_clone(spark, src, dst, version=version, as_of=as_of)
    if as_of is not None:
        if version is not None:
            raise ValueError("snaptable: pass version OR as_of, not both")
        version = version_at(spark, src, as_of)
    m = _manifest(spark, src, version)
    df = _df_for(spark, src, m)
    v = create(
        df, dst,
        partition_cols=tuple(m.get("partition_cols", ()) or ()),
        stats_cols=list(m.get("stats_cols", []) or []) or None,
    )
    for name, expr in m.get("constraints", {}).items():
        add_constraint(spark, dst, name, expr)
    return v



def vacuum(
    spark: SparkSession,
    path: str,
    keep_last: int = 2,
    min_age_sec: float = 3600.0,
    dry_run: bool = False,
) -> int:
    """Physically delete data files referenced by NO retained manifest
    (older manifests beyond ``keep_last`` are dropped first), plus
    crash-orphaned files (written by a writer that died before its
    commit). ``min_age_sec`` protects an in-flight writer: a file
    younger than it is never reaped even if unreferenced, mirroring
    Delta's retention guard. Deletion-vector and change-feed
    sidecar dirs referenced by no retained manifest are reaped whole
    under the same age guard.
    ``dry_run=True`` counts what WOULD be deleted (files + sidecar
    dirs) without touching anything — manifests included. Returns
    data files + sidecar dirs deleted (or would-be-deleted)."""
    fs, Path = _hadoop_fs(spark, path)
    vs = versions(spark, path)
    if not vs:
        return 0
    retained = set(vs[-keep_last:] if keep_last > 0 else vs[-1:])
    # tagged versions are PINNED: a named release/audit snapshot
    # survives routine maintenance regardless of keep_last. Tags are
    # re-read HERE, immediately before the deletion pass, to narrow the
    # tag/vacuum race (ADVICE r10): a tag created after this read and
    # before the manifest delete below can still lose its pin — that
    # residual window is inherent to a lockless store and is why
    # ``min_age_sec`` exists (tag a version older than the guard only
    # when no vacuum is concurrently running).
    retained |= {v for v in tags(spark, path).values() if v in vs}
    retained = sorted(retained)
    if not dry_run:
        for v in vs:
            if v not in retained:
                fs.delete(Path(_snap_path(path, v)), False)
    referenced = set()
    referenced_dv = set()
    referenced_cdf = set()
    referenced_parts = set()
    for v in retained:
        m = _manifest(spark, path, v)
        if m.get("cdf"):
            referenced_cdf.add(m["cdf"])
        referenced_parts.update(p["ref"] for p in m.get("files_parts", ()))
        for e in m["files"]:
            referenced.add(e["path"])
            referenced_dv.update(e.get("dv", ()))
    now = time.time()
    deleted = 0
    # manifest-list parts referenced by no retained version (dropped
    # snapshots, lost commit races, crashed writers) reap under the
    # same age guard; a referenced part is never touched.
    parts_root = Path(f"{path.rstrip('/')}/{_SNAPDIR}/{_PARTSSUB}")
    if fs.exists(parts_root):
        for st in fs.listStatus(parts_root):
            rel = f"{_PARTSSUB}/{st.getPath().getName()}"
            if rel in referenced_parts:
                continue
            if now - st.getModificationTime() / 1000.0 < min_age_sec:
                continue
            if dry_run:
                deleted += 1
            elif fs.delete(st.getPath(), False):
                deleted += 1
    for subdir, ref_set in ((_DVDIR, referenced_dv), (_CDFDIR, referenced_cdf)):
        sub_root = Path(f"{path.rstrip('/')}/{subdir}")
        if not fs.exists(sub_root):
            continue
        for st in fs.listStatus(sub_root):
            name = st.getPath().getName()
            rel = f"{subdir}/{name}"
            if rel in ref_set:
                continue
            if now - st.getModificationTime() / 1000.0 < min_age_sec:
                continue
            if dry_run:
                deleted += 1
            elif fs.delete(st.getPath(), True):
                deleted += 1
    data_root = Path(f"{path.rstrip('/')}/{_DATADIR}")
    if not fs.exists(data_root):
        return deleted
    # table-relative path via the QUALIFIED data root prefix, not by
    # splitting on the first '/data/': a table rooted under a 'data'
    # directory (e.g. /warehouse/data/tbl) would otherwise compute a
    # bogus-prefixed rel for every live file, match nothing in the
    # referenced set, and reap the whole table once past min_age_sec.
    # Prefix strip is exact; the rsplit fallback (LAST occurrence —
    # commit dirs never nest another bare "data/" segment, Hive
    # partition dirs are always "col=value") covers a qualification
    # mismatch; anything still unattributable is SKIPPED, never deleted.
    root_str = fs.makeQualified(data_root).toString().rstrip("/")
    # Concurrency: a CONCURRENT writer's in-flight Spark parquet write
    # creates and removes `_temporary` dirs under data/ mid-commit; a
    # recursive RemoteIterator that queued such a dir throws
    # FileNotFoundException from hasNext() when it vanishes before the
    # scan descends into it (pinned by the r12 two-writer fuzz
    # campaign, 9/200 seeds). The former fix — up to 5 back-to-back
    # FULL recursive relistings — could exhaust all attempts under a
    # writer continuously creating/removing temp dirs, and each retry
    # re-listed the entire data tree (ADVICE r12). Walk the tree
    # directory-by-directory instead, tolerating a vanished dir PER
    # LISTING: a dir that disappears mid-walk was deleted by its
    # writer, so nothing reapable was inside it — skip it and keep
    # going. No restarts, no whole-tree relists, and old crashed-writer
    # `_temporary` residue is still walked and reaped normally.
    from py4j.protocol import Py4JJavaError

    def _gone(exc) -> bool:
        # RawLocalFileSystem surfaces the vanished path as either a
        # FileNotFoundException or a RuntimeException from the
        # permission probe ("ls: cannot access ... No such file or
        # directory") — both are the same benign race
        msg = str(exc)
        return (
            "FileNotFoundException" in msg
            or "No such file or directory" in msg
        )

    listing = []
    stack = [data_root]
    while stack:
        d = stack.pop()
        try:
            children = fs.listStatus(d)
        except Py4JJavaError as e:
            if _gone(e):
                continue
            raise
        for st in children:
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                listing.append((st.getPath(), st.getModificationTime()))
    for p, mtime in listing:
        p_str = p.toString()
        if p_str.startswith(root_str + "/"):
            rel = f"{_DATADIR}/{p_str[len(root_str) + 1:]}"
        else:
            tail = p_str.rsplit(f"/{_DATADIR}/", 1)
            if len(tail) != 2:
                continue
            rel = f"{_DATADIR}/{tail[1]}"
        if rel in referenced:
            continue
        if now - mtime / 1000.0 < min_age_sec:
            continue  # possibly an in-flight writer's uncommitted files
        if dry_run:
            deleted += 1
        elif fs.delete(p, False):
            deleted += 1
    return deleted
