"""Manifest/version I/O, part files, statistics footers, commit protocol, table create, snapshot reads/scans, txn markers and tags.

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

from sec_financial_pipeline_spark.sources.snaptable.spec import (
    _bloom_rules_out,
    _derived_probe,
    _parse_spec_entry,
    _spec_exprs,
    _temporal_iso,
    _transform_expr,
    _transform_py,
    _unquote_hive,
    _validate_partition_spec,
)


_SNAPDIR = "_snapshots"

_PARTSSUB = "parts"  # manifest-list part files live in _snapshots/parts/

_DATADIR = "data"

_DVDIR = "dv"

_CDFDIR = "cdf"

_MAX_RETRIES = 20



class SnapshotConflict(IOError):
    """A concurrent commit won the version race and this operation's
    snapshot is stale. Appends rebase automatically; rewrites
    (delete/compact/rollback) surface this — re-run against the new
    head."""



def _vname(version: int) -> str:
    return f"v{version:012d}.json"



def _snap_path(path: str, version: int) -> str:
    return f"{path.rstrip('/')}/{_SNAPDIR}/{_vname(version)}"



def _read_json(spark: SparkSession, fpath: str) -> dict:
    # local fast path: a scheme-less path that exists on this
    # filesystem reads with plain open() — the py4j stream copy below
    # measures ~8x slower at manifest-list scale (489 parts / 139 MB:
    # 40s vs 5s, scripts/bench_manifest_parts.py). Object-store and
    # explicit-scheme paths go through the Hadoop FS unchanged.
    if "://" not in fpath and not fpath.startswith("file:"):
        import os as _os_mod

        if _os_mod.path.exists(fpath):
            with open(fpath, "rb") as f:
                return json.loads(f.read().decode("utf-8"))
    # Java-side copy: py4j passes a Python bytearray to
    # InputStream.read BY VALUE (the filled bytes never come back), so
    # stream through a ByteArrayOutputStream instead.
    fs, Path = _hadoop_fs(spark, fpath)
    jvm = spark.sparkContext._jvm
    stream = fs.open(Path(fpath))
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    return json.loads(bytes(baos.toByteArray()).decode("utf-8"))



def versions(spark: SparkSession, path: str) -> list[int]:
    """Retained snapshot versions, ascending."""
    fs, Path = _hadoop_fs(spark, path)
    snapdir = Path(f"{path.rstrip('/')}/{_SNAPDIR}")
    if not fs.exists(snapdir):
        return []
    out = []
    for st in fs.listStatus(snapdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)



def _manifest(
    spark: SparkSession,
    path: str,
    version: int | None,
    load_parts: bool = True,
) -> dict:
    """Resolve one version's manifest dict. A manifest either inlines
    its entries (``files``) or references manifest-list parts
    (``files_parts`` — commits past ``_SPLIT_THRESHOLD`` entries).
    With ``load_parts=True`` (every existing consumer) the parts are
    materialized into ``files`` so the dict shape is identical either
    way; ``scan`` passes ``load_parts=False`` to prune parts by their
    summaries BEFORE loading any of them."""
    vs = versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"snaptable: no snapshots at {path}")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise FileNotFoundError(
            f"snaptable: version {version} not retained at {path} "
            f"(have {vs[0]}..{vs[-1]}; vacuumed versions are gone forever)"
        )
    m = _read_json(spark, _snap_path(path, version))
    m["version"] = version
    if "files" not in m and load_parts:
        m["files"] = _load_parts(
            spark, path, [p["ref"] for p in m.get("files_parts", [])]
        )
    return m



def _load_parts(spark: SparkSession, path: str, refs: list[str]) -> list[dict]:
    out: list[dict] = []
    root = path.rstrip("/")
    for ref in refs:
        key = f"{root}/{_SNAPDIR}/{ref}"
        with _pkg()._PARTS_CACHE_LOCK:
            chunk = _pkg()._PARTS_CACHE.get(key)
            if chunk is not None:
                _pkg()._PARTS_CACHE.move_to_end(key)
        if chunk is None:
            chunk = _read_json(spark, key)["entries"]
            with _pkg()._PARTS_CACHE_LOCK:
                if key not in _pkg()._PARTS_CACHE:  # racing loader may have won
                    _pkg()._PARTS_CACHE[key] = chunk
                    _pkg()._parts_cache_total += len(chunk)
                while (
                    _pkg()._parts_cache_total > _pkg()._PARTS_CACHE_BUDGET
                    and len(_pkg()._PARTS_CACHE) > 1
                ):
                    _, dropped = _pkg()._PARTS_CACHE.popitem(last=False)
                    _pkg()._parts_cache_total -= len(dropped)
        out.extend(chunk)
    return out



def _entry_part_key(e: dict) -> tuple:
    return (json.dumps(e.get("partition", {}), sort_keys=True), e["path"])



def _part_summary(chunk: list[dict]) -> dict:
    """Per-part pruning summary (Iceberg's manifest-file stats analog):
    distinct partition values per column (omitted past _pkg()._PART_VALS_CAP
    or when any entry lacks the column — unknown means keep) and
    merged stats ranges over columns EVERY entry carries (the same
    incomplete-drop rule as _file_stats: a partial merge would record
    a range narrower than the part's truth and prune a live part)."""
    summ: dict = {"n": len(chunk)}
    pcols: set = set()
    for e in chunk:
        pcols.update(e.get("partition", {}).keys())
    partitions: dict = {}
    for col in pcols:
        vals: set = set()
        complete = True
        for e in chunk:
            if col not in e.get("partition", {}):
                complete = False
                break
            vals.add(e["partition"][col])
        if complete and len(vals) <= _pkg()._PART_VALS_CAP:
            partitions[col] = sorted(v for v in vals if v is not None) + (
                [None] if None in vals else []
            )
    if partitions:
        summ["partitions"] = partitions
    scols = None
    for e in chunk:
        es = set(e.get("stats", {}))
        scols = es if scols is None else scols & es
    stats: dict = {}
    for col in scols or ():
        try:
            stats[col] = [
                min(e["stats"][col][0] for e in chunk),
                max(e["stats"][col][1] for e in chunk),
            ]
        except TypeError:  # mixed-type stats can't order: unknown = keep
            continue
    if stats:
        summ["stats"] = stats
    return summ



def _split_entries(
    files: list[dict], part_target: int | None = None
) -> list[tuple[dict, list[dict]]]:
    """Chunk entries into manifest-list parts. Sorting by (partition,
    path) first makes parts partition-coherent, so a partition probe
    eliminates whole parts instead of finding every part mixed."""
    part_target = part_target or _pkg()._PART_TARGET
    ordered = sorted(files, key=_entry_part_key)
    return [
        (_part_summary(ordered[i : i + part_target]), ordered[i : i + part_target])
        for i in range(0, len(ordered), part_target)
    ]



def _effective_ranges(between, point: tuple | None) -> list[tuple]:
    ranges = _norm_between(between)
    if point is not None:
        pcol, pval = point
        if isinstance(pval, (int, float)) and not isinstance(pval, bool):
            ranges = ranges + [(pcol, pval, pval)]
    return ranges



def _prune_part_summaries(
    parts: list[dict], partitions: dict | None, ranges: list[tuple]
) -> list[dict]:
    """Keep a part iff no summary metadata rules it out — the same
    over-approximation contract as _select_entries, one level up. The
    per-entry pass still runs on whatever these parts contain, so part
    pruning is purely an optimization."""
    keep = []
    for p in parts:
        if partitions:
            pvals = p.get("partitions", {})
            if any(
                k in pvals
                and (None if v is None else str(v)) not in pvals[k]
                for k, v in partitions.items()
            ):
                continue
        pruned = False
        for col, lo, hi in ranges:
            st = p.get("stats", {}).get(col)
            try:
                if st is not None and (st[1] < lo or st[0] > hi):
                    pruned = True
                    break
            except TypeError:
                continue
        if not pruned:
            keep.append(p)
    return keep



def _file_stats(local_file: str, cols: list[str]) -> dict:
    return _footer_meta(local_file, cols)[0]



def _footer_meta(
    local_file: str, cols: list[str]
) -> tuple[dict, int | None, dict]:
    """Per-file ([min, max] for ``cols``, row count, null count per
    col) out of the parquet FOOTER (pyarrow; the bytes are already
    there — no data read). Null counts are independent of min/max
    availability (an all-NULL column has no min/max but an exact null
    count) and are recorded only when EVERY row group carries one —
    a partial sum would silently under-count. Local filesystems only;
    remote stores return ({}, None, {}) and simply don't skip. At
    cluster scale the same numbers come from a tiny Spark job over the
    fresh files, or from real Delta's stats collection."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(local_file).metadata
    except Exception:
        return {}, None, {}
    out: dict = {}
    # A column whose stats are missing/unusable in ANY row group must
    # be dropped from the file's entry entirely: merging only the row
    # groups that carry stats records a range NARROWER than the file's
    # true range, and _select_entries would then prune a file that
    # actually contains matching rows (parquet writers legitimately
    # drop binary stats per row group for oversized values). Unknown
    # means keep — pruning is an optimization, never a correctness
    # filter.
    incomplete: set = set()
    nulls: dict = {}
    null_incomplete: set = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if name not in cols:
                continue
            st = col.statistics
            nc = (
                st.null_count
                if st is not None and getattr(st, "has_null_count", False)
                else None
            )
            if nc is None:
                null_incomplete.add(name)
            else:
                nulls[name] = nulls.get(name, 0) + int(nc)
            if st is None or not st.has_min_max:
                incomplete.add(name)
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except Exception:
                    incomplete.add(name)
                    continue
            if not isinstance(mn, (int, float, str)):
                incomplete.add(name)
                continue
            if name in out:
                out[name] = [min(out[name][0], mn), max(out[name][1], mx)]
            else:
                out[name] = [mn, mx]
    for name in incomplete:
        out.pop(name, None)
    for name in null_incomplete:
        nulls.pop(name, None)
    return out, md.num_rows, nulls



def _default_stats_cols(df: DataFrame, partition_cols) -> list[str]:
    prim = ("byte", "short", "integer", "long", "float", "double", "string")
    return [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in prim and f.name not in partition_cols
    ]



def _write_files(
    df: DataFrame,
    path: str,
    partition_cols: tuple = (),
    stats_cols: list[str] | None = None,
    distribute: bool = False,
) -> list[dict]:
    """Materialize ``df`` as immutable parquet files under a fresh
    commit dir; returns one manifest entry per file:
    ``{"path", "base", "partition": {col: str}, "stats": {col: [mn,mx]}}``.
    Files become part of the table ONLY when a manifest referencing
    them commits. Partitioned writes use Hive layout inside the commit
    dir (``c-x/p=1/part-*.parquet``); the partition VALUES are lifted
    into the manifest so scans prune on metadata without ever listing
    directories — the 100 TB point of the format."""
    import os as _os_mod

    rel_dir = f"{_DATADIR}/c-{uuid.uuid4().hex[:12]}"
    out_dir = f"{path.rstrip('/')}/{rel_dir}"
    if stats_cols is None:
        # from the USER schema — a transform's derived dir column must
        # never leak into the recorded stats columns
        stats_cols = _default_stats_cols(df, partition_cols)
    if distribute and partition_cols:
        # optimized write (Delta's optimizeWrite): shuffle rows to
        # their partition value BEFORE partitionBy, so each dir is
        # written by ~one task instead of every task writing to every
        # dir (N_tasks x N_dirs small files — the classic partitioned-
        # write explosion at cluster scale)
        df = df.repartition(*_spec_exprs(df, partition_cols))
    phys_cols = []
    if partition_cols:
        types = {f.name: f.dataType.typeName() for f in df.schema.fields}
        for s in partition_cols:
            kind, src, param, dname = _parse_spec_entry(str(s))
            if kind == "identity":
                phys_cols.append(src)
            else:
                # hidden partitioning: derive the dir column; the data
                # files keep the SOURCE column (partitionBy extracts
                # only the derived one into the layout)
                df = df.withColumn(
                    dname, _transform_expr(kind, src, param, types[src])
                )
                phys_cols.append(dname)
    w = df.write.mode("overwrite")
    if phys_cols:
        w = w.partitionBy(*phys_cols)
    w.parquet(out_dir)
    fs, Path = _hadoop_fs(df.sparkSession, out_dir)
    entries = []
    it = fs.listFiles(Path(out_dir), True)
    while it.hasNext():
        p = it.next().getPath().toString()
        if not p.endswith(".parquet"):
            continue
        tail = p.split(f"/{rel_dir}/", 1)[1]
        partition = {}
        for seg in tail.split("/")[:-1]:
            if "=" in seg:
                k, v = seg.split("=", 1)
                # Spark %-escapes special chars (':', '#', '%', ...) in
                # Hive dir names and writes __HIVE_DEFAULT_PARTITION__
                # for nulls; lift the TRUE value into the manifest so a
                # probe for "a:b" (or None) matches instead of pruning
                # every file. unquote is the exact inverse of Spark's
                # escapePathName (literal '%' arrives as '%25').
                partition[k] = (
                    None
                    if v == "__HIVE_DEFAULT_PARTITION__"
                    else _unquote_hive(v)
                )
        rel = f"{rel_dir}/{tail}"
        local = _os_mod.path.join(path, rel)
        stats, rows, nulls = (
            _footer_meta(local, stats_cols or [])
            if _os_mod.path.exists(local)
            else ({}, None, {})
        )
        entry = {
            "path": rel, "base": rel_dir, "partition": partition,
            "stats": stats,
        }
        if rows is not None:
            # footer row count -> metadata-only COUNT(*) (count_rows)
            entry["rows"] = rows
        if nulls:
            # footer null counts -> metadata-only null_counts()
            entry["nulls"] = nulls
        entries.append(entry)
    return sorted(entries, key=lambda e: e["path"])



def _try_commit(
    spark: SparkSession,
    path: str,
    version: int,
    files: list[dict],
    schema_json: str,
    op: str,
    parent: int | None,
    partition_cols: list[str] = (),
    stats_cols: list[str] = (),
    txn: dict | None = None,
    constraints: dict | None = None,
    cdf: str | None = None,
    tbl_meta: dict | None = None,
) -> bool:
    """Publish a manifest as version ``version`` — atomic
    create(overwrite=False): exactly one writer can win a version.
    ``txn`` is the application-transaction watermark map
    (``{app_id: last_applied_epoch}``, the Delta txnAppId/txnVersion
    analog); every commit carries the map forward so idempotence
    survives compaction, rollback and vacuum. ``constraints`` is the
    table's CHECK-constraint map ({name: sql_expr}), likewise carried
    forward by every commit. ``cdf`` is THIS commit's persisted
    change-sidecar ref (per-commit, never carried forward).
    ``tbl_meta`` (column mapping + dropped-name tombstones) carries
    forward AUTOMATICALLY from the parent when not explicitly passed —
    unlike txn/constraints it predates no call site, so the carry
    lives here rather than in fifteen callers."""
    fs, Path = _hadoop_fs(spark, path)
    fs.mkdirs(Path(f"{path.rstrip('/')}/{_SNAPDIR}"))
    from sec_financial_pipeline_spark.sources.sink import atomic_create as _ac

    if tbl_meta is None and parent is not None:
        try:
            tbl_meta = _manifest(spark, path, parent, load_parts=False).get(
                "tbl_meta"
            )
        except Exception:
            tbl_meta = None
    body_dict: dict = {
        "schema": schema_json,
        "op": op,
        "parent": parent,
        "partition_cols": list(partition_cols),
        "stats_cols": list(stats_cols),
        "txn": dict(txn or {}),
        "constraints": dict(constraints or {}),
        "committed_at": int(time.time()),
    }
    if tbl_meta:
        body_dict["tbl_meta"] = tbl_meta
    if cdf is not None:
        body_dict["cdf"] = cdf
    if len(files) > _pkg()._SPLIT_THRESHOLD:
        # manifest list: entries go to part files, the version JSON
        # carries only per-part summaries. Parts are written BEFORE the
        # version file — a lost race or crash orphans them (uuid names
        # can't collide with a winner's) and vacuum reaps them later.
        parts_dir = f"{path.rstrip('/')}/{_SNAPDIR}/{_PARTSSUB}"
        fs.mkdirs(Path(parts_dir))
        parts_meta = []
        for summary, chunk in _split_entries(files):
            ref = f"{_PARTSSUB}/m-{uuid.uuid4().hex[:16]}.json"
            pbody = json.dumps({"entries": chunk}).encode("utf-8")
            if not _ac(fs, Path, f"{path.rstrip('/')}/{_SNAPDIR}/{ref}", pbody):
                raise IOError(f"snaptable: could not create manifest part {ref}")
            parts_meta.append({"ref": ref, **summary})
        body_dict["files_parts"] = parts_meta
    else:
        body_dict["files"] = files
    body = json.dumps(body_dict).encode("utf-8")
    # atomic_create, not fs.create(overwrite=false): the Hadoop call is
    # check-then-create on RawLocalFileSystem — a TOCTOU two racing
    # local committers could both win, silently LOSING one commit (the
    # exact anomaly the version protocol exists to prevent). POSIX
    # O_CREAT|O_EXCL is kernel-atomic locally; HDFS keeps fs.create.
    atomic_create = _ac
    target = _snap_path(path, version)
    if atomic_create(fs, Path, target, body):
        return True
    # Disambiguate: a LOST RACE means the version file now exists
    # (someone else won it) — report False so the caller rebases or
    # conflicts. Anything else (permissions, disk, network) is a
    # genuine IO failure and must surface, not masquerade as 20
    # "lost races" ending in a misleading SnapshotConflict.
    if fs.exists(Path(target)):
        return False
    raise IOError(f"snaptable: could not create manifest {target}")



def create(
    df: DataFrame,
    path: str,
    partition_cols: tuple = (),
    stats_cols: list[str] | None = None,
    txn: tuple | None = None,
    optimize_write: bool = False,
) -> int:
    """Create a snapshot table at ``path`` with ``df`` as version 1.
    ``partition_cols`` fixes the table's partitioning for its lifetime
    (appends inherit it); ``stats_cols`` picks the file-skipping
    columns (default: every primitive non-partition column). Fails if
    any snapshot already exists."""
    spark = df.sparkSession
    if versions(spark, path):
        raise FileExistsError(f"snaptable: table already exists at {path}")
    if partition_cols:
        _validate_partition_spec(df.schema, partition_cols)
    if stats_cols is None:
        stats_cols = _default_stats_cols(df, partition_cols)
    files = _write_files(
        df, path, partition_cols, stats_cols, distribute=optimize_write
    )
    if not _try_commit(
        spark, path, 1, files, df.schema.json(), "create", None,
        partition_cols, stats_cols, _txn_merged({}, txn), {},
    ):
        raise SnapshotConflict(f"snaptable: concurrent create at {path}")
    return 1



def _df_for(
    spark: SparkSession,
    path: str,
    m: dict,
    entries: list[dict] | None = None,
    with_meta: bool = False,
) -> DataFrame:
    """DataFrame over a manifest's (possibly pruned) file entries.
    Partitioned tables read each commit group under its own
    ``basePath`` so Spark re-derives the partition columns from the
    Hive dirs; groups = retained commits (bounded, and 1 after a
    compact), never partition count.

    Entries carrying deletion vectors (``e["dv"]``: sidecar refs of
    (path, pos) parquet written by ``delete_where(mode='dv')``) read
    MERGE-ON-READ: their rows anti-join the union of their sidecars on
    (file rel path, physical row position) — deleted rows vanish from
    every reader (read/scan/CDF) without the files ever having been
    rewritten. Plain entries never pay the join.

    ``with_meta=True`` appends ``__rel`` (table-relative file path)
    and ``__pos`` (physical row index) columns — the handles the
    write paths (touch detection, DV construction) need; they are
    selected DURING the scan, so they survive the anti-join (calling
    ``input_file_name()`` after a join is undefined)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if entries is None:
        entries = m["files"]
    schema = StructType.fromJson(json.loads(m["schema"]))
    if not entries:
        base_df = spark.createDataFrame([], schema)
        if with_meta:
            base_df = base_df.withColumn(
                "__rel", F.lit(None).cast("string")
            ).withColumn("__pos", F.lit(None).cast("long"))
        return base_df
    plain = [e for e in entries if not e.get("dv")]
    dved = [e for e in entries if e.get("dv")]
    out = None
    if plain:
        out = _files_df(spark, path, m, plain, schema, with_meta)
    if dved:
        root = path.rstrip("/")
        raw = _files_df(spark, path, m, dved, schema, True)
        refs = sorted({r for e in dved for r in e["dv"]})
        dv = spark.read.schema("path string, pos long").parquet(
            *[f"{root}/{r}" for r in refs]
        )
        alive = raw.join(
            dv,
            (raw["__rel"] == dv["path"]) & (raw["__pos"] == dv["pos"]),
            "left_anti",
        )
        if not with_meta:
            alive = alive.drop("__rel", "__pos")
        out = alive if out is None else out.unionByName(alive)
    return out



def _files_df(
    spark: SparkSession,
    path: str,
    m: dict,
    entries: list[dict],
    schema,
    with_meta: bool,
) -> DataFrame:
    """One (or few) FileScans over ``entries`` conformed to
    ``schema``; optionally carrying ``__rel``/``__pos`` from the
    parquet reader's ``_metadata`` column (physical row positions —
    the deletion-vector coordinate system, same as Delta's)."""
    from pyspark.sql import functions as F

    root = path.rstrip("/")
    # layout is a PER-ENTRY property, not a head property: under
    # partition evolution (set_partition_spec) one snapshot holds
    # files written under different specs — each entry's lifted
    # partition dict says how ITS file must be read. Hive-laid-out
    # entries read per commit group under that group's basePath so
    # Spark re-derives the dir columns; flat entries take ONE
    # pinned-schema scan (no per-commit-group union, so an
    # append-heavy unpartitioned history still plans a single
    # FileScan). Pinning the manifest schema also serves evolution:
    # files predating an added column surface it as NULL directly in
    # the parquet reader (no per-file schema inference at all).
    colmap = _name_chain(m)
    read_schema = schema
    if colmap:
        # pinned-schema reads match by NAME, so renamed columns need
        # EVERY generation name in the read schema: each file populates
        # the name its era wrote (physical, intermediate, or logical)
        # and the conform projection coalesces them
        from pyspark.sql.types import StructField, StructType

        extra = [
            StructField(p, f.dataType, True)
            for f in schema.fields
            for p in colmap.get(f.name, ())
        ]
        read_schema = StructType(list(schema.fields) + extra)
    # entries group by EXTERNAL ROOT first (x: shallow-clone references
    # live under a foreign table root — _ext_roots), then by layout:
    # flat entries take one pinned-schema scan per root; Hive-laid-out
    # entries read per (root, commit group) under that group's basePath.
    ext = _ext_roots(m)
    flat_groups: dict = {}
    hive_groups: dict = {}
    for e in entries:
        x = e.get("x")
        if e.get("partition"):
            hive_groups.setdefault((x, e["base"]), []).append(e["path"])
        else:
            flat_groups.setdefault(x, []).append(e["path"])

    def _xkey(x):
        return (x is not None, x if x is not None else -1)

    parts = []  # (df, x, group filesystem root)
    for x in sorted(flat_groups, key=_xkey):
        groot = root if x is None else ext[x].rstrip("/")
        parts.append(
            (
                spark.read.schema(read_schema).parquet(
                    *sorted(f"{groot}/{p}" for p in flat_groups[x])
                ),
                x,
                groot,
            )
        )
    for x, base in sorted(
        hive_groups, key=lambda k: (_xkey(k[0]), k[1])
    ):
        # base == "" is a converted-in-place group: its basePath is the
        # group's table root itself (original Hive dirs sit under it)
        groot = root if x is None else ext[x].rstrip("/")
        r = spark.read.option("basePath", f"{groot}/{base}".rstrip("/"))
        parts.append(
            (
                r.parquet(
                    *[f"{groot}/{p}" for p in sorted(hive_groups[(x, base)])]
                ),
                x,
                groot,
            )
        )
    fs = Path = None
    if with_meta:
        fs, Path = _hadoop_fs(spark, path)
    out = None
    for p, x, groot in parts:
        meta = []
        if with_meta:
            # rel path = qualified URI minus the qualified GROUP root:
            # the read paths are driver-constructed as groot/<entry
            # path>, and Hadoop Path rendering round-trips its own
            # output, so the stripped suffix IS the manifest entry path
            # (test-pinned, including %-escaped partition dirs and
            # 'data'-rooted tables). External groups prefix the rel
            # with their root index (_erel) so the key stays unique
            # across roots.
            qroot = fs.makeQualified(Path(groot)).toString().rstrip("/")
            rel = F.expr(f"substring(_metadata.file_path, {len(qroot) + 2})")
            if x is not None:
                rel = F.concat(F.lit(f"x{x}:"), rel)
            meta = [
                rel.alias("__rel"),
                F.col("_metadata.row_index").alias("__pos"),
            ]
        p = _conform_plus(p, schema, meta, colmap)
        out = p if out is None else out.unionByName(p)
    return out



def _colmap(m: dict) -> dict:
    """Logical -> PHYSICAL column names for renamed columns (Delta
    column-mapping analog; empty for never-renamed tables). Files
    written before a rename carry the physical name, files after it
    the logical one — the conform projection coalesces the two."""
    return dict((m.get("tbl_meta") or {}).get("colmap", {}))



def _name_chain(m: dict) -> dict:
    """Logical name -> every PRIOR name retained files may carry: the
    original physical name (``colmap``) plus each INTERMEDIATE name of
    a chained rename (``col_aliases`` — files appended between renames
    carry the logical name of their era). Readers coalesce the whole
    chain; empty dict for never-renamed tables."""
    meta = m.get("tbl_meta") or {}
    out: dict = {}
    for k, v in (meta.get("colmap") or {}).items():
        out[k] = [v]
    for k, names in (meta.get("col_aliases") or {}).items():
        cur = out.setdefault(k, [])
        cur.extend(n for n in names if n not in cur)
    return {
        k: [n for n in v if n != k]
        for k, v in out.items()
        if any(n != k for n in v)
    }



def _phys_namespace(m: dict) -> set:
    """Every physical column name live in retained files or ever
    dropped: the names ADD COLUMN must refuse, because a parquet file
    already carrying that physical column would resurface its old data
    under the new logical column. Includes chained-rename intermediate
    names — files written between two renames carry them."""
    meta = m.get("tbl_meta") or {}
    out = set(meta.get("dropped", []))
    out |= set(meta.get("colmap", {}).values())
    for names in (meta.get("col_aliases") or {}).values():
        out |= set(names)
    out |= {f["name"] for f in json.loads(m["schema"])["fields"]}
    return out



def _ext_roots(m: dict) -> list[str]:
    """Absolute table roots of externally-referenced entries (shallow
    clones, :func:`clone`): an entry carrying ``x: i`` lives under
    ``ext_roots[i]``, not this table's root. Empty for every
    non-cloned table. Append-only while any retained entry references
    an index; full rewrites (which list only fresh local files) clear
    it alongside the column mapping."""
    return list((m.get("tbl_meta") or {}).get("ext_roots", []))



def _erel(e: dict) -> str:
    """Scan-side ``__rel`` key of a manifest entry: local entries ARE
    their rel path; externally-referenced entries carry an ``x{i}:``
    prefix so keys stay unique across roots (the DV sidecar coordinate
    system and the rewrite attribution both join on this key)."""
    x = e.get("x")
    return e["path"] if x is None else f"x{x}:{e['path']}"



def _entry_root(root: str, ext_roots: list[str], e: dict) -> str:
    """Filesystem root an entry's file lives under."""
    x = e.get("x")
    return root if x is None else ext_roots[x].rstrip("/")



def _conform(df: DataFrame, schema, colmap: dict | None = None) -> DataFrame:
    """Project a file-group read onto the manifest schema: columns a
    pre-evolution file lacks become typed NULLs; column order follows
    the manifest (reads are schema-stable regardless of which files a
    version happens to reference)."""
    return _conform_plus(df, schema, [], colmap)



def _conform_plus(
    df: DataFrame, schema, extra_cols: list, colmap: dict | None = None
) -> DataFrame:
    """:func:`_conform` plus pass-through extra columns (the metadata
    handles) selected in the same projection so they materialize from
    the scan itself. ``colmap`` maps renamed logical names to their
    prior names — a single physical name (str) or the full generation
    chain (list, :func:`_name_chain`): a column present under any of
    them resolves to the logical one (per file exactly one generation
    is populated, so ``coalesce`` is exact — a genuinely NULL value
    stays NULL either way)."""
    from pyspark.sql import functions as F

    have = set(df.columns)
    colmap = colmap or {}
    cols = []
    for f in schema.fields:
        cands = [f.name]
        p = colmap.get(f.name)
        for n in [p] if isinstance(p, str) else list(p or ()):
            if n and n != f.name and n not in cands:
                cands.append(n)
        present = [c for c in cands if c in have]
        if not present:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif len(present) == 1:
            cols.append(
                F.col(f"`{present[0]}`").cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(
                F.coalesce(*[F.col(f"`{c}`") for c in present])
                .cast(f.dataType)
                .alias(f.name)
            )
    return df.select(*cols, *extra_cols)



def read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    as_of=None,
    tag: str | None = None,
) -> DataFrame:
    """Snapshot-isolated read: resolve one manifest, scan exactly its
    files. ``version=None`` reads the head; any retained version time-
    travels; ``as_of`` (epoch seconds, ISO 'YYYY-MM-DD[ HH:MM:SS]'
    string, or datetime — Delta's TIMESTAMP AS OF) resolves the latest
    version committed at or before that instant; ``tag`` resolves a
    named pin (:func:`tag` — Iceberg's VERSION AS OF a tag). An empty
    snapshot returns an empty DataFrame carrying the schema the
    manifest recorded."""
    if sum(x is not None for x in (version, as_of, tag)) > 1:
        raise ValueError(
            "snaptable: pass version OR as_of OR tag, not both"
        )
    if tag is not None:
        version = resolve_tag(spark, path, tag)
    elif as_of is not None:
        version = version_at(spark, path, as_of)
    return _df_for(spark, path, _manifest(spark, path, version))



def version_at(spark: SparkSession, path: str, as_of) -> int:
    """Latest retained version with ``committed_at <= as_of``
    (TIMESTAMP AS OF resolution; commit times are whole seconds, ties
    resolve to the highest version in that second). Raises if every
    retained commit is newer — the history before the requested
    instant has been vacuumed or never existed."""
    import datetime as _dt

    if isinstance(as_of, str):
        s = as_of.replace("T", " ")
        fmt = "%Y-%m-%d %H:%M:%S" if " " in s else "%Y-%m-%d"
        ts = _dt.datetime.strptime(s, fmt).replace(
            tzinfo=_dt.timezone.utc
        ).timestamp()
    elif isinstance(as_of, _dt.datetime):
        ts = as_of.timestamp()
    else:
        ts = float(as_of)
    best = None
    for v in versions(spark, path):
        m = _read_json(spark, _snap_path(path, v))
        if m.get("committed_at", 0) <= ts:
            best = v
    if best is None:
        raise FileNotFoundError(
            f"snaptable: no retained version at {path} committed at or "
            f"before {as_of!r} (earlier history may have been vacuumed)"
        )
    return best



def _partition_rules_out(
    part: dict, partitions: dict, real_cols: frozenset = frozenset()
) -> bool:
    """True when an entry's lifted dir values are INCOMPATIBLE with an
    equality probe. Identity dirs compare the raw value; hidden-
    partitioning dirs compare the value's TRANSFORM (computed by the
    bit-identical Python mirror), so a probe on the SOURCE column
    prunes bucket/truncate/day/month layouts without the caller
    knowing the spec. Lifted values are the TRUE (unescaped) strings,
    or None for __HIVE_DEFAULT_PARTITION__; a None probe matches only
    the null partition and vice versa. Entries with no dir for the
    probed column (other specs, unpartitioned epochs) are kept —
    pruning is never a correctness filter.

    ``real_cols``: names that are (or ever were) REAL table columns —
    a dir key in this set is an identity dir BY DEFINITION and must
    never be re-interpreted as a derived transform of some other
    column (a table with columns ``ts`` and ``ts_day``,
    identity-partitioned by ``ts_day``, would otherwise compare the
    unrelated ``ts_day`` labels against ``days(ts)`` and wrongly prune
    — ADVICE r9)."""
    for k, v in partitions.items():
        if k in part:
            if part[k] != (None if v is None else str(v)):
                return True
            continue
        for pk, pv in part.items():
            if pk in real_cols:
                continue  # identity dir of a real column, never derived
            t = _derived_probe(pk, k)
            if t is None:
                continue
            try:
                exp = _transform_py(t[0], t[1], v)
            except (TypeError, ValueError):
                continue  # untransformable probe value: keep
            if v is not None and exp is None:
                continue  # temporal mirror couldn't read the value: keep
            if pv != (None if exp is None else str(exp)):
                return True
    return False



def _temporal_dirs_rule_out(
    part: dict, col: str, lo, hi, real_cols: frozenset = frozenset()
) -> bool:
    """Day/month hidden-partition dirs prune RANGE probes on the source
    column: ISO renderings compare lexicographically, so a file whose
    calendar dir lies outside [lo, hi]'s calendar window cannot hold a
    matching row. NULL dirs and unreadable bounds are kept. A dir key
    that IS a real column (``real_cols``) is an identity dir, not a
    derived temporal — never interpreted (ADVICE r9)."""
    for suffix, width in (("_day", 10), ("_month", 7)):
        key = f"{col}{suffix}"
        if key in real_cols:
            continue  # identity dir of a real column, never derived
        pv = part.get(key)
        if pv is None:
            continue
        lo_s, hi_s = _temporal_iso(lo), _temporal_iso(hi)
        if lo_s is None or hi_s is None:
            continue
        if pv < lo_s[:width] or pv > hi_s[:width]:
            return True
    return False



def _norm_between(between) -> list[tuple]:
    """Accept one ``(col, lo, hi)`` or a list of them (compound range
    predicates — the shape z-order clustering exists to serve)."""
    if not between:
        return []
    if isinstance(between, tuple) and len(between) == 3 and isinstance(
        between[0], str
    ):
        return [between]
    return list(between)



def _select_entries(
    m: dict,
    partitions: dict | None,
    between=None,
    point: tuple | None = None,
) -> list[dict]:
    """Manifest-level pruning: keep a file iff no available metadata
    rules it out. Partition equality prunes on the lifted dir values;
    ``between=(col, lo, hi)`` — or a LIST of such triples, ANDed —
    prunes on footer min/max; ``point=(col, value)`` prunes on the
    file's Bloom sidecar (and min/max when present). A file with no
    metadata for a requested column is always kept — pruning is an
    optimization, never a correctness filter."""
    ranges = _effective_ranges(between, point)
    chain = _name_chain(m)
    # probes name LOGICAL columns; entries written before a rename key
    # their stats/dirs/blooms by the name of their era — probe the
    # whole generation chain
    probe_names = {
        c: [c] + chain.get(c, [])
        for c in set(
            list(partitions or {})
            + [r[0] for r in ranges]
            + ([point[0]] if point else [])
        )
    }
    # a dir key that IS a current-or-prior real column name is an
    # identity dir by definition — the derived-transform recovery must
    # skip it (mirrors export_file_list's check; ADVICE r9)
    real_cols = frozenset(_phys_namespace(m))
    keep = []
    for e in m["files"]:
        part = e.get("partition", {})
        if partitions and any(
            _partition_rules_out(part, {n: v}, real_cols)
            for k, v in partitions.items()
            for n in probe_names[k]
        ):
            continue
        pruned = False
        for col, lo, hi in ranges:
            st = None
            for n in probe_names[col]:
                st = e.get("stats", {}).get(n)
                if st is not None:
                    break
            try:
                if st is not None and (st[1] < lo or st[0] > hi):
                    pruned = True
                    break
            except TypeError:
                # probe/stat type mismatch (e.g. numeric probe against a
                # string column's stats): metadata can't rule the file
                # out, so keep it — pruning stays an optimization
                continue
            if any(
                _temporal_dirs_rule_out(part, n, lo, hi, real_cols)
                for n in probe_names[col]
            ):
                pruned = True
                break
        if not pruned and point is not None:
            pruned = any(
                _bloom_rules_out(e, n, point[1])
                for n in probe_names[point[0]]
            )
        if pruned:
            continue
        keep.append(e)
    return keep



def scan(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    partitions: dict | None = None,
    between=None,
    point: tuple | None = None,
    as_of=None,
) -> DataFrame:
    """Pruned snapshot scan: files are selected from MANIFEST metadata
    (partition values + footer min/max) before Spark ever lists or
    opens anything, then the exact predicates are re-applied on the
    result — pruning cuts I/O, the filters guarantee exactness. At
    100 TB this is the difference between touching the 2 probed
    partitions' files and footer-checking every file in the table.
    ``between`` takes one ``(col, lo, hi)`` or a list of them (ANDed) —
    compound ranges skip multiplicatively on a z-ordered table.
    ``point=(col, value)`` is the equality probe: prunes via the
    column's Bloom sidecars (see :func:`add_bloom_index`) plus min/max
    when the value is numeric."""
    from pyspark.sql import functions as F

    if as_of is not None:
        if version is not None:
            raise ValueError("snaptable: pass version OR as_of, not both")
        version = version_at(spark, path, as_of)
    m = _manifest(spark, path, version, load_parts=False)
    if "files" not in m:
        # manifest-list fast path: prune parts by summary BEFORE loading
        # any — a probed scan of a 100k-file table parses the probed
        # partitions' parts, not the table's whole entry set. The
        # per-entry _select_entries pass below re-checks whatever the
        # kept parts contain, so this stays an over-approximation.
        kept = _prune_part_summaries(
            m.get("files_parts", []),
            partitions,
            _effective_ranges(between, point),
        )
        m["files"] = _load_parts(spark, path, [p["ref"] for p in kept])
    df = _df_for(spark, path, m, _select_entries(m, partitions, between, point))
    if partitions:
        for k, v in partitions.items():
            if v is None:
                df = df.filter(F.col(k).isNull())
            else:
                df = df.filter(F.col(k).cast("string") == str(v))
    for col, lo, hi in _norm_between(between):
        df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
    if point is not None:
        df = df.filter(F.col(point[0]) == point[1])
    return df



def last_txn(spark: SparkSession, path: str, app_id: str) -> int | None:
    """Last applied epoch for ``app_id`` recorded at the head (None if
    the app has never committed). The restart handshake for exactly-
    once streaming: a resumed writer asks the TABLE what it has, not a
    side-channel marker file."""
    head = _manifest(spark, path, None)
    v = head.get("txn", {}).get(app_id)
    return int(v) if v is not None else None



def _txn_entries(txn: tuple | None) -> list[tuple]:
    """Normalize the ``txn`` argument: a single ``(app_id, epoch)``
    pair or a tuple OF pairs (one commit may carry several app
    cursors — e.g. a matview repin records both its replay epoch and
    the dim pin in the same atomic commit)."""
    if txn is None:
        return []
    if txn and isinstance(txn[0], (tuple, list)):
        return [tuple(t) for t in txn]
    return [tuple(txn)]



def _txn_applied(head: dict, txn: tuple | None) -> bool:
    entries = _txn_entries(txn)
    if not entries:
        return False
    # the FIRST entry is the replay cursor (the idempotence key);
    # trailing entries are metadata recorded alongside it
    app_id, epoch = entries[0]
    last = head.get("txn", {}).get(str(app_id))
    return last is not None and int(last) >= int(epoch)



def _txn_merged(head: dict, txn: tuple | None) -> dict:
    merged = dict(head.get("txn", {}))
    for app_id, epoch in _txn_entries(txn):
        merged[str(app_id)] = int(epoch)
    return merged



_TAG_NAME = _re.compile(r"^[A-Za-z0-9._-]{1,128}$")



def tag(
    spark: SparkSession, path: str, name: str, version: int | None = None
) -> int:
    """Pin a snapshot under a NAME (Iceberg's tags): a tagged version
    is resolvable by name (:func:`resolve_tag`, ``read(tag=)``) and —
    the part that matters operationally — is RETAINED BY VACUUM
    regardless of ``keep_last``, so a release/audit/experiment pin
    survives routine maintenance. Tags are immutable create-once
    markers (atomic create, one file per tag — concurrent taggers of
    the same name race safely, exactly one wins); re-pointing a name
    is an explicit :func:`delete_tag` + re-tag. Returns the pinned
    version (default: current head)."""
    if not _TAG_NAME.match(name or ""):
        raise ValueError(
            f"snaptable: tag name must match [A-Za-z0-9._-]{{1,128}}, "
            f"got {name!r}"
        )
    vs = versions(spark, path)
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(
            f"snaptable: cannot tag version {v} at {path} — not a "
            f"retained version (have {vs})"
        )
    fs, Path = _hadoop_fs(spark, path)
    from sec_financial_pipeline_spark.sources.sink import atomic_create as _ac

    body = json.dumps(
        {"name": name, "version": v, "created_at": int(time.time())}
    ).encode("utf-8")
    target = f"{path.rstrip('/')}/{_SNAPDIR}/tag-{name}.json"
    if not _ac(fs, Path, target, body):
        raise FileExistsError(
            f"snaptable: tag {name!r} already exists at {path} "
            f"(delete_tag first to re-point it)"
        )
    return v



def tags(spark: SparkSession, path: str) -> dict:
    """All tags as ``{name: version}``."""
    fs, Path = _hadoop_fs(spark, path)
    root = Path(f"{path.rstrip('/')}/{_SNAPDIR}")
    out = {}
    if not fs.exists(root):
        return out
    for st in fs.listStatus(root):
        n = st.getPath().getName()
        if n.startswith("tag-") and n.endswith(".json"):
            body = _read_json(spark, st.getPath().toString())
            out[body["name"]] = int(body["version"])
    return out



def resolve_tag(spark: SparkSession, path: str, name: str) -> int:
    """Version a tag pins; loud on unknown names."""
    got = tags(spark, path)
    if name not in got:
        raise ValueError(
            f"snaptable: no tag {name!r} at {path} (have {sorted(got)})"
        )
    return got[name]



def delete_tag(spark: SparkSession, path: str, name: str) -> int:
    """Remove a tag (its version becomes vacuumable again once outside
    ``keep_last``). Returns the version it pinned; loud on unknowns."""
    v = resolve_tag(spark, path, name)
    fs, Path = _hadoop_fs(spark, path)
    fs.delete(Path(f"{path.rstrip('/')}/{_SNAPDIR}/tag-{name}.json"), False)
    return v



_NUMERIC = ("byte", "short", "integer", "long", "float", "double")
