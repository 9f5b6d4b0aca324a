"""Snapshot-manifest parquet table — the Delta-gap closer (SURVEY §2.1;
VERDICT r7 "What's missing" #1).

``BASELINE.json`` names Parquet/Delta as the reference's storage
contract, but the Delta library is absent from this environment. The
store machinery (``sources/sink.py``) covers the gap with crash-safe
two-rename swaps; this module closes it further by providing the
essential Delta TRANSACTION semantics on plain parquet + JSON manifests,
using only Hadoop FS primitives (local, HDFS, s3a alike):

- **Atomic commits.** A version is a manifest file
  (``_snapshots/v%012d.json``) listing the snapshot's exact data files.
  Publishing is ONE atomic ``create(overwrite=False)``; data files are
  immutable once written and are never renamed (object-store friendly:
  no directory moves at all, unlike the swap machinery).
- **Snapshot isolation.** A reader resolves a manifest once and scans
  its explicit file list; a concurrent commit can neither change nor
  half-apply under it. The reader-races-writer window the swap design
  documents (and defends against) is structurally impossible here.
- **Optimistic concurrency.** Two writers publishing version N+1 race
  on the same manifest name; the filesystem's atomic create picks
  exactly one winner. A losing APPEND rebases automatically (its new
  files are disjoint from every concurrent change and simply union onto
  the new head); a losing rewrite (delete/compact/rollback) raises
  :class:`SnapshotConflict` — its surviving-row computation was made
  against a stale snapshot, so the caller must re-run it.
- **Time travel + rollback.** Any retained version is readable
  (``read(..., version=N)``); ``rollback`` is a NEW commit whose file
  list equals the old version's — history is append-only, never edited.
- **Vacuum.** Data files referenced by no retained manifest are
  deleted; crash-orphaned files (written by a writer that died before
  its commit) age out the same way, guarded by ``min_age_sec`` so an
  in-flight writer's not-yet-committed files are never reaped.
- **Schema-carrying manifests.** Each manifest records the Spark schema
  JSON, so an EMPTY snapshot (post delete-all) is first-class readable
  — the empty-dataset / mixed-layout pathology ``append_partitioned``
  works around simply does not exist in this format.

At 100 TB: commits are O(1) metadata ops regardless of table size;
readers list one JSON file instead of walking directories; appends from
N concurrent jobs serialize only on manifest creation; file-level
statistics/pruning can be added to the manifest entries without
changing the protocol (the documented one-line swap to real Delta
remains available where the library exists).
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

from sec_financial_pipeline_spark.sources.sink import _hadoop_fs

_SNAPDIR = "_snapshots"
_PARTSSUB = "parts"  # manifest-list part files live in _snapshots/parts/
_DATADIR = "data"
_DVDIR = "dv"
_CDFDIR = "cdf"
_MAX_RETRIES = 20

# Iceberg-style manifest lists: a commit whose entry count exceeds
# _SPLIT_THRESHOLD stores its entries in part files of ~_PART_TARGET
# entries each (sorted by partition, so partition pruning drops whole
# parts), and the version JSON carries only per-part summaries. The
# single-JSON manifest is measured comfortable to ~10k files (PERF.md);
# past that, head parse cost grows with the TABLE instead of the query,
# which is exactly the failure mode manifest lists remove: a pruned
# scan loads only the parts whose summary ranges survive the probe.
_SPLIT_THRESHOLD = 4096
_PART_TARGET = 2048
_PART_VALS_CAP = 32  # distinct partition values summarized per part/col


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


#: Parsed manifest parts, LRU by absolute ref. Part files are IMMUTABLE
#: once written (uuid names can't be reused; versions never change;
#: vacuum only deletes files that are no longer referenced), so a parse
#: is valid for the life of the process. This takes the driver-side
#: JSON parse off the critical path for every scan after the first
#: (VERDICT r9 item 5): at 1M entries the cold parse measures ~5.1s and
#: the warm path ~0.1s (scripts/bench_manifest_parts.py). Shipping the
#: parse to executors was measured SLOWER cold (6.9s via
#: read.text(wholetext) + rdd.flatMap + collect; 16.5s via an Arrow
#: columnar rebuild) — the cost is materializing 1M entry dicts on the
#: driver, not the parse itself, so caching beats distributing.
#: Consumers treat loaded entries as read-only (mutating paths copy
#: first, e.g. add_bloom_index); the budget is counted in ENTRIES, the
#: unit memory actually scales with.
_PARTS_CACHE: "OrderedDict[str, list[dict]]" = OrderedDict()
_PARTS_CACHE_BUDGET = 2_000_000  # entries (~500 MB at typical widths)
_PARTS_CACHE_LOCK = threading.Lock()
_parts_cache_total = 0  # entries currently cached (lock-guarded)


def _load_parts(spark: SparkSession, path: str, refs: list[str]) -> list[dict]:
    global _parts_cache_total
    out: list[dict] = []
    root = path.rstrip("/")
    for ref in refs:
        key = f"{root}/{_SNAPDIR}/{ref}"
        with _PARTS_CACHE_LOCK:
            chunk = _PARTS_CACHE.get(key)
            if chunk is not None:
                _PARTS_CACHE.move_to_end(key)
        if chunk is None:
            chunk = _read_json(spark, key)["entries"]
            with _PARTS_CACHE_LOCK:
                if key not in _PARTS_CACHE:  # racing loader may have won
                    _PARTS_CACHE[key] = chunk
                    _parts_cache_total += len(chunk)
                while (
                    _parts_cache_total > _PARTS_CACHE_BUDGET
                    and len(_PARTS_CACHE) > 1
                ):
                    _, dropped = _PARTS_CACHE.popitem(last=False)
                    _parts_cache_total -= len(dropped)
        out.extend(chunk)
    return out


def _entry_part_key(e: dict) -> tuple:
    return (json.dumps(e.get("partition", {}), sort_keys=True), e["path"])


def _part_summary(chunk: list[dict]) -> dict:
    """Per-part pruning summary (Iceberg's manifest-file stats analog):
    distinct partition values per column (omitted past _PART_VALS_CAP
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
        if complete and len(vals) <= _PART_VALS_CAP:
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
    part_target = part_target or _PART_TARGET
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


import re as _re

#: Iceberg-style HIDDEN-PARTITIONING transforms. A partition-spec entry
#: is either a plain column (identity) or a transform over one:
#: ``bucket(N, col)`` (md5-family hash mod N — the repo's engine-
#: independent hash, mirrored bit-for-bit in Python for probe-time
#: pruning), ``truncate(W, col)`` (strings: prefix; integers: floor to
#: a multiple of W), ``days(col)`` / ``months(col)`` (calendar dirs
#: from a date/timestamp). The data files keep the SOURCE column —
#: only the directory layout is derived — so queries filter on the raw
#: column and the engine prunes the transformed dirs without the user
#: ever knowing the layout (the Iceberg pitch: partitioning without
#: partition-column discipline).
_X_BUCKET_TRUNC = _re.compile(
    r"^(bucket|truncate)\(\s*(\d+)\s*,\s*(\w+)\s*\)$"
)
_X_TEMPORAL = _re.compile(r"^(days|months)\(\s*(\w+)\s*\)$")
#: derived-dir-name patterns, keyed for probe-time recovery
_X_DERIVED = _re.compile(r"^(?P<src>\w+)_(?:bucket|trunc)_(?P<n>\d+)$")


def _parse_spec_entry(s: str) -> tuple:
    """``spec string -> (kind, src_col, param, derived_dir_name)``;
    plain columns parse as ``("identity", col, None, col)``."""
    s = s.strip()
    m = _X_BUCKET_TRUNC.match(s)
    if m:
        kind, param, src = m.group(1), int(m.group(2)), m.group(3)
        if param <= 0:
            raise ValueError(f"snaptable: {kind} width must be > 0 in {s!r}")
        tag = "bucket" if kind == "bucket" else "trunc"
        return kind, src, param, f"{src}_{tag}_{param}"
    m = _X_TEMPORAL.match(s)
    if m:
        kind, src = m.group(1), m.group(2)
        return kind, src, None, f"{src}_{'day' if kind == 'days' else 'month'}"
    if not _re.match(r"^\w+$", s):
        raise ValueError(
            f"snaptable: unparseable partition-spec entry {s!r} (expected "
            f"a column, bucket(N, col), truncate(W, col), days(col) or "
            f"months(col))"
        )
    return "identity", s, None, s


def _transform_expr(kind: str, src: str, param, src_type: str):
    """The Spark column computing a transform's derived dir value."""
    from pyspark.sql import functions as F

    c = F.col(src)
    if kind == "bucket":
        return F.pmod(
            F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("long"),
            F.lit(param),
        )
    if kind == "truncate":
        if src_type == "string":
            return F.substring(c, 1, param)
        return c - F.pmod(c, F.lit(param))
    if kind == "days":
        return F.date_format(c, "yyyy-MM-dd")
    return F.date_format(c, "yyyy-MM")  # months


def _transform_py(kind: str, param, v):
    """Python mirror of :func:`_transform_expr` — identical output for
    identical input, so manifest pruning can compute the dir value a
    probe WOULD have landed in. None maps to None (the NULL dir)."""
    import hashlib as _hl

    if v is None:
        return None
    if kind == "bucket":
        return int(_hl.md5(str(v).encode()).hexdigest()[:8], 16) % param
    if kind == "truncate":
        if isinstance(v, str):
            return v[:param]
        return v - (v % param)  # Python % is non-negative for param > 0
    s = _temporal_iso(v)
    if s is None:
        return None
    return s[:10] if kind == "days" else s[:7]


def _session_tzinfo():
    """tzinfo of the active session's ``spark.sql.session.timeZone``
    (None when no session is active or the zone is unknown)."""
    try:
        from zoneinfo import ZoneInfo

        s = SparkSession.getActiveSession()
        if s is None:
            return None
        return ZoneInfo(s.conf.get("spark.sql.session.timeZone"))
    except Exception:
        return None


def _temporal_iso(v) -> str | None:
    """ISO rendering of a date/datetime/ISO-string probe value (None if
    the value can't be read temporally — pruning then just keeps).
    Writers render timestamps via ``date_format`` in the SESSION
    timezone, so a tz-AWARE probe is converted to that zone before
    rendering (ADVICE r9: dropping the offset could compute a
    different calendar day near midnight and wrongly prune); with no
    active session to ask, tz-aware probes skip temporal pruning
    entirely. Naive datetimes are taken as session-local, matching the
    writer's rendering of what the user stored."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            tz = _session_tzinfo()
            if tz is None:
                return None  # can't place it on the writer's calendar
            v = v.astimezone(tz).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, str) and _re.match(r"^\d{4}-\d{2}", v):
        return v
    return None


def _derived_probe(part_key: str, probe_col: str) -> tuple | None:
    """Recover (kind, param) when ``part_key`` is a derived dir of
    ``probe_col`` — the stateless inverse of the spec's derived names
    (works for entries written under ANY retained spec)."""
    if part_key == f"{probe_col}_day":
        return ("days", None)
    if part_key == f"{probe_col}_month":
        return ("months", None)
    m = _X_DERIVED.match(part_key)
    if m and m.group("src") == probe_col:
        kind = "bucket" if "_bucket_" in part_key else "truncate"
        return (kind, int(m.group("n")))
    return None


_BUCKETABLE = {"byte", "short", "integer", "long", "string", "date"}
_TRUNCATABLE = {"byte", "short", "integer", "long", "string"}
_TEMPORAL_T = {"date", "timestamp", "timestamp_ntz"}


def _validate_partition_spec(schema, partition_cols) -> None:
    """Shared spec validation for create/set_partition_spec: source
    columns exist, transform types make sense, derived dir names can't
    shadow real columns (a table column named ``k_bucket_16`` beside
    ``bucket(16, k)`` would make reads ambiguous)."""
    names = {f.name: f.dataType.typeName() for f in schema.fields}
    derived = set()
    for s in partition_cols:
        kind, src, param, dname = _parse_spec_entry(str(s))
        if src not in names:
            raise ValueError(
                f"snaptable: partition-spec column '{src}' is not a "
                f"table column (have {sorted(names)})"
            )
        t = names[src]
        if kind == "bucket" and t not in _BUCKETABLE:
            raise ValueError(
                f"snaptable: bucket() needs an int/string/date column, "
                f"got {src}: {t} (float renderings differ across engines)"
            )
        if kind == "truncate" and t not in _TRUNCATABLE:
            raise ValueError(
                f"snaptable: truncate() needs an int/string column, "
                f"got {src}: {t}"
            )
        if kind in ("days", "months") and t not in _TEMPORAL_T:
            raise ValueError(
                f"snaptable: {kind}() needs a date/timestamp column, "
                f"got {src}: {t}"
            )
        if kind != "identity" and (dname in names or dname in derived):
            raise ValueError(
                f"snaptable: derived partition dir '{dname}' collides "
                f"with an existing column or another spec entry"
            )
        derived.add(dname)


def _unquote_hive(v: str) -> str:
    """Invert Spark's Hive path escaping (%XX per escaped char).
    urllib's unquote decodes the same %-hex scheme; errors='strict'
    is not needed — a stray '%' not followed by hex passes through
    unchanged, matching how it would have been written ('%25')."""
    from urllib.parse import unquote

    return unquote(v)


def _default_stats_cols(df: DataFrame, partition_cols) -> list[str]:
    prim = ("byte", "short", "integer", "long", "float", "double", "string")
    return [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in prim and f.name not in partition_cols
    ]


def _spec_exprs(df: DataFrame, partition_cols) -> list:
    """Physical partitioning expressions for a spec (identity columns
    as-is, transforms derived) — what a write clusters by and what
    compact repartitions on."""
    from pyspark.sql import functions as F

    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    out = []
    for s in partition_cols:
        kind, src, param, _d = _parse_spec_entry(str(s))
        out.append(
            F.col(src) if kind == "identity"
            else _transform_expr(kind, src, param, types[src])
        )
    return out


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
    if len(files) > _SPLIT_THRESHOLD:
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


def _txn_applied(head: dict, txn: tuple | None) -> bool:
    if txn is None:
        return False
    app_id, epoch = txn
    last = head.get("txn", {}).get(str(app_id))
    return last is not None and int(last) >= int(epoch)


def _txn_merged(head: dict, txn: tuple | None) -> dict:
    merged = dict(head.get("txn", {}))
    if txn is not None:
        merged[str(txn[0])] = int(txn[1])
    return merged


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
    return _publish_rewrite(spark, path, all_files, op, base, txn, cdf)


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
        cdf=cdf_rel,
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

    Vacuum interaction: a rebase re-references files the raced compact
    dropped; they are protected from vacuum as long as the base
    version is still retained — run vacuum with ``keep_last >= 2``
    when maintenance races live writers (the default)."""
    cur = base
    for _ in range(10):
        if _try_commit(
            spark, path, cur["version"] + 1, files, base["schema"], op,
            cur["version"], base.get("partition_cols", ()),
            base.get("stats_cols", ()), _txn_merged(cur, txn),
            cur.get("constraints", {}), cdf, tbl_meta=tbl_meta,
        ):
            return cur["version"] + 1
        head = _manifest(spark, path, None)
        for v in range(cur["version"] + 1, head["version"] + 1):
            if not _is_row_preserving(_manifest(spark, path, v).get("op", "")):
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


_TS_QUOTED = _re.compile(r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"|`[^`]*`)")


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
    keys = source.select(*key_cols).distinct()
    row = source.agg(
        *[F.min(c).alias(f"mn_{c}") for c in key_cols],
        *[F.max(c).alias(f"mx_{c}") for c in key_cols],
        *[
            F.max(F.col(c).isNull()).alias(f"hn_{c}")
            for c in key_cols
        ],
    ).collect()[0]
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
        spark, path, new_rows, carried, "merge", base, txn, cdf=cdf_rel
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


def compact(spark: SparkSession, path: str, target_files: int = 1) -> int:
    """Small-file compaction as a commit: same rows, fewer files.
    Readers of older versions are untouched (their manifests still
    reference the original files until vacuum)."""
    base = _manifest(spark, path, None)
    df = _df_for(spark, path, base)
    pcols = base.get("partition_cols", ())
    kept = (
        # the spec's PHYSICAL expressions: a hidden-partitioning entry
        # like bucket(4,k) clusters by its derived value, not by a
        # (nonexistent) column of that name
        df.repartition(target_files, *_spec_exprs(df, pcols)) if pcols
        else df.coalesce(target_files)
    )
    return _rewrite_commit(spark, path, kept, "compact", base)


def auto_maintain(
    spark: SparkSession,
    path: str,
    max_files: int = 64,
    target_files: int = 8,
    rebloom: bool = True,
    reanalyze: bool = False,
    vacuum_keep_last: int | None = None,
    min_age_sec: float = 3600.0,
) -> dict:
    """One-call table health pass (the OPTIMIZE-scheduler loop every
    lakehouse runs): compact when the snapshot's file count exceeds
    ``max_files``; re-bloom every previously indexed column whose
    coverage compaction broke (fresh files carry no bitmaps); refresh
    ANALYZE statistics when they've gone stale (opt-in — NDV costs a
    scan); optionally vacuum aged unreferenced files. Each action is
    its own commit; nothing row-changing happens (compact/bloom are
    row-preserving, so concurrent writers rebase right over them).
    Returns the actions taken with before/after numbers — an empty
    ``actions`` list means the table was already healthy (and nothing
    was committed)."""
    m = _manifest(spark, path, None)
    actions = []
    bloom_cols = sorted(
        {c for e in m["files"] for c in e.get("bloom", {})}
    )
    if len(m["files"]) > max_files:
        v = compact(spark, path, target_files=target_files)
        actions.append({
            "action": "compact", "version": v,
            "files_before": len(m["files"]),
            "files_after": len(_manifest(spark, path, None)["files"]),
        })
    if rebloom and bloom_cols:
        m2 = _manifest(spark, path, None)
        for c in bloom_cols:
            uncovered = sum(
                1 for e in m2["files"] if c not in e.get("bloom", {})
            )
            if uncovered:
                v = add_bloom_index(spark, path, c)
                actions.append({
                    "action": f"bloom:{c}", "version": v,
                    "files_covered": uncovered,
                })
    if reanalyze:
        stats = table_statistics(spark, path)
        if stats is not None and stats.get("stale"):
            analyze_table(
                spark, path,
                cols=list(stats.get("columns", {})) or None,
                hll_b=stats.get("hll_b", 12),
            )
            actions.append({
                "action": "analyze",
                "at_version": _manifest(spark, path, None)["version"],
            })
    if vacuum_keep_last is not None:
        n = vacuum(
            spark, path, keep_last=vacuum_keep_last,
            min_age_sec=min_age_sec,
        )
        if n:
            actions.append({"action": "vacuum", "reaped": n})
    return {"table": path, "actions": actions}


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


def evolve_schema(
    spark: SparkSession, path: str, new_fields: list[tuple[str, str]]
) -> int:
    """ADD COLUMNS as a metadata-only commit (Delta's schema evolution,
    additive form): the new manifest references the SAME files under a
    widened schema; existing rows surface the added columns as NULL via
    the pinned read schema — zero data rewritten, O(1) regardless of
    table size. ``new_fields`` is ``[(name, spark_type_string)]``, e.g.
    ``[("score", "double")]``. Subsequent appends must carry the full
    current schema (the loud _check_schema guard now expects the added
    columns); time travel to pre-evolution versions reads the OLD
    schema — each manifest is self-describing.

    Only additive evolution is offered: renames/drops/type changes
    silently corrupt downstream consumers' assumptions and are exactly
    the operations Delta gates behind explicit overwriteSchema. New
    primitive columns join ``stats_cols`` so future files skip on them
    (pre-evolution files carry no stats for them and are simply never
    skipped — pruning stays an optimization, not a correctness
    filter)."""
    from pyspark.sql.types import StructType, _parse_datatype_string

    base = _manifest(spark, path, None)
    schema = StructType.fromJson(json.loads(base["schema"]))
    # case-INSENSITIVE collision guard: Spark resolves columns case-
    # insensitively by default, so committing 'V' beside 'v' would brick
    # every subsequent read with COLUMN_ALREADY_EXISTS
    existing = {f.name.lower() for f in schema.fields}
    # physical-namespace tombstones: a dropped (or renamed-away) name
    # may still exist as a column INSIDE retained parquet files — a new
    # logical column with that name would resurrect the dead data there
    phys = {n.lower() for n in _phys_namespace(base)}
    fields = list(schema.fields)
    stats_cols = list(base.get("stats_cols", []))
    for name, typ in new_fields:
        if name.lower() in existing:
            raise ValueError(
                f"snaptable: evolve_schema column '{name}' already exists "
                f"(column resolution is case-insensitive)"
            )
        if name.lower() in phys:
            raise ValueError(
                f"snaptable: evolve_schema column '{name}' collides with "
                f"a dropped or renamed-away physical column still present "
                f"in retained files — pick another name"
            )
        existing.add(name.lower())
        dt = _parse_datatype_string(typ)
        from pyspark.sql.types import StructField

        fields.append(StructField(name, dt, nullable=True))
        if dt.typeName() in _NUMERIC or dt.typeName() == "string":
            stats_cols.append(name)
    new_schema = StructType(fields)
    if not _try_commit(
        spark, path, base["version"] + 1, base["files"], new_schema.json(),
        f"evolve:{','.join(n for n, _ in new_fields)}", base["version"],
        base.get("partition_cols", ()), stats_cols, base.get("txn", {}),
        base.get("constraints", {}),
    ):
        raise SnapshotConflict(
            f"snaptable: evolve_schema at {path} raced a concurrent "
            f"commit; re-run against the new head"
        )
    return base["version"] + 1


def _rename_in_spec(partition_cols, old: str, new: str) -> list:
    """Rewrite a partition spec for a column rename: identity entries
    and transform SOURCE columns follow the logical name."""
    out = []
    for s in partition_cols:
        kind, src, param, _d = _parse_spec_entry(str(s))
        if src != old:
            out.append(str(s))
        elif kind == "identity":
            out.append(new)
        elif kind in ("bucket", "truncate"):
            out.append(f"{kind}({param},{new})")
        else:
            out.append(f"{kind}({new})")
    return out


def rename_column(spark: SparkSession, path: str, old: str, new: str) -> int:
    """ALTER TABLE RENAME COLUMN as a metadata-only commit (Delta
    column-mapping analog): the manifest records ``colmap[new] =
    <original physical name>`` and every reader coalesces the two —
    files written before the rename carry the physical column, files
    after it the logical one; zero bytes rewritten at any table size.
    Constraints referencing the old name are refused (their SQL would
    silently stop binding); stats_cols and the partition spec follow
    the rename. Time travel to pre-rename versions reads the old
    schema — each manifest is self-describing."""
    from pyspark.sql.types import StructField, StructType

    base = _manifest(spark, path, None)
    schema = StructType.fromJson(json.loads(base["schema"]))
    names = {f.name for f in schema.fields}
    if old not in names:
        raise ValueError(f"snaptable: rename of unknown column {old!r}")
    if not _re.match(r"^\w+$", new):
        raise ValueError(f"snaptable: invalid column name {new!r}")
    own_phys = (base.get("tbl_meta") or {}).get("colmap", {}).get(old, old)
    own_aliases = list(
        (base.get("tbl_meta") or {}).get("col_aliases", {}).get(old, [])
    )
    taken = {n.lower() for n in names} | {
        n.lower() for n in _phys_namespace(base)
    }
    # renaming BACK to any name in the column's OWN generation chain is
    # always legal — files carrying that name hold THIS column's data
    for n in [own_phys] + own_aliases:
        taken.discard(n.lower())
    if new.lower() in taken:
        raise ValueError(
            f"snaptable: rename target '{new}' collides with an existing, "
            f"dropped or renamed-away column"
        )
    for cname, expr in (base.get("constraints") or {}).items():
        if _re.search(rf"\b{_re.escape(old)}\b", expr):
            raise ValueError(
                f"snaptable: constraint {cname!r} references '{old}' — "
                f"drop it before renaming and re-add against '{new}'"
            )
    meta = dict(base.get("tbl_meta") or {})
    colmap = dict(meta.get("colmap", {}))
    # chained renames keep pointing at the ORIGINAL physical name
    colmap[new] = colmap.pop(old, old)
    if colmap.get(new) == new:
        colmap.pop(new)  # renamed back to its physical name: identity
    meta["colmap"] = colmap
    # ...but files appended BETWEEN renames carry the logical name of
    # their era, so every prior name stays on the column's alias chain
    # and readers coalesce the whole chain (ADVICE r9: the colmap alone
    # silently NULLed intermediate-generation files)
    aliases = {
        k: list(v) for k, v in (meta.get("col_aliases") or {}).items()
    }
    prior = aliases.pop(old, [])
    new_chain = []
    for n in prior + [old]:
        if n != new and n not in new_chain:
            new_chain.append(n)
    if new_chain:
        aliases[new] = new_chain
    if aliases:
        meta["col_aliases"] = aliases
    else:
        meta.pop("col_aliases", None)
    fields = [
        StructField(new if f.name == old else f.name, f.dataType, f.nullable)
        for f in schema.fields
    ]
    stats_cols = [
        new if c == old else c for c in base.get("stats_cols", [])
    ]
    pcols = _rename_in_spec(base.get("partition_cols", ()), old, new)
    if not _try_commit(
        spark, path, base["version"] + 1, base["files"],
        StructType(fields).json(), f"rename:{old}->{new}", base["version"],
        pcols, stats_cols, base.get("txn", {}),
        base.get("constraints", {}), tbl_meta=meta,
    ):
        raise SnapshotConflict(
            f"snaptable: rename_column at {path} raced a concurrent "
            f"commit; re-run against the new head"
        )
    return base["version"] + 1


def drop_column(spark: SparkSession, path: str, name: str) -> int:
    """ALTER TABLE DROP COLUMN as a metadata-only commit: the field
    leaves the schema (reads project it away — the bytes stay in the
    files until rewrites retire them) and its PHYSICAL name joins the
    tombstone list so a later ADD COLUMN can't resurrect the dead data
    hiding in retained files. Partition-spec members and
    constraint-referenced columns are refused."""
    from pyspark.sql.types import StructType

    base = _manifest(spark, path, None)
    schema = StructType.fromJson(json.loads(base["schema"]))
    if name not in {f.name for f in schema.fields}:
        raise ValueError(f"snaptable: drop of unknown column {name!r}")
    if len(schema.fields) == 1:
        raise ValueError("snaptable: cannot drop the table's only column")
    for s in base.get("partition_cols", ()) or ():
        if _parse_spec_entry(str(s))[1] == name:
            raise ValueError(
                f"snaptable: '{name}' is in the partition spec — "
                f"set_partition_spec away from it first"
            )
    for cname, expr in (base.get("constraints") or {}).items():
        if _re.search(rf"\b{_re.escape(name)}\b", expr):
            raise ValueError(
                f"snaptable: constraint {cname!r} references '{name}' — "
                f"drop the constraint first"
            )
    meta = dict(base.get("tbl_meta") or {})
    colmap = dict(meta.get("colmap", {}))
    phys = colmap.pop(name, name)
    meta["colmap"] = colmap
    aliases = {
        k: list(v) for k, v in (meta.get("col_aliases") or {}).items()
    }
    chain = aliases.pop(name, [])
    if aliases:
        meta["col_aliases"] = aliases
    else:
        meta.pop("col_aliases", None)
    # tombstone EVERY generation name — retained files may carry any:
    # the original physical, each chained-rename intermediate, and the
    # current logical name (files appended after the last rename)
    meta["dropped"] = sorted(
        set(meta.get("dropped", [])) | {phys, name} | set(chain)
    )
    fields = [f for f in schema.fields if f.name != name]
    stats_cols = [c for c in base.get("stats_cols", []) if c != name]
    if not _try_commit(
        spark, path, base["version"] + 1, base["files"],
        StructType(fields).json(), f"drop:{name}", base["version"],
        base.get("partition_cols", ()), stats_cols, base.get("txn", {}),
        base.get("constraints", {}), tbl_meta=meta,
    ):
        raise SnapshotConflict(
            f"snaptable: drop_column at {path} raced a concurrent "
            f"commit; re-run against the new head"
        )
    return base["version"] + 1


def convert_in_place(
    spark: SparkSession,
    path: str,
    partition_cols: tuple = (),
    stats_cols: list[str] | None = None,
    schema=None,
) -> int:
    """CONVERT-TO-DELTA analog: register an existing parquet directory
    as a snaptable IN PLACE — zero bytes rewritten, metadata-only. The
    version-1 manifest references the original files where they sit
    (``base=""``: one basePath group rooted at the table, so Hive dirs
    keep deriving partition columns); stats lift from the parquet
    footers, partition values lift (Hive-unescaped) from dir names.
    At 100 TB this is the on-ramp: an existing parquet lake gains
    atomic commits, time travel, DML, and pruned scans without a
    rewrite — new writes land under ``data/`` beside the originals.

    The original files are NEVER physically deleted by vacuum (it
    walks only ``data/``) — deliberately: they predate the table and
    may have outside readers. Reclaim their space by rewriting
    (``compact``/``optimize_cluster``) and then removing the original
    dirs yourself once no retained version references them
    (``files_df`` shows what each version still needs).

    Mirrors the reference's adoption path of serving from existing
    parquet snapshots without re-ingest (SURVEY.md §2.1: the parquet
    store IS the source of truth)."""
    spark_path = path.rstrip("/")
    for s in partition_cols:
        if _parse_spec_entry(str(s))[0] != "identity":
            raise ValueError(
                "snaptable: convert_in_place registers an EXISTING Hive "
                f"layout — transform spec {s!r} can't describe it; "
                "convert with the identity columns, then "
                "set_partition_spec for future writes"
            )
    if versions(spark, path):
        raise FileExistsError(f"snaptable: table already exists at {path}")
    fs, Path = _hadoop_fs(spark, path)
    if not fs.exists(Path(spark_path)):
        raise FileNotFoundError(f"snaptable: nothing to convert at {path}")
    import os as _os_mod

    reserved = (_SNAPDIR, _DATADIR, _DVDIR, _CDFDIR)
    rels = []
    it = fs.listFiles(Path(spark_path), True)
    qroot = fs.makeQualified(Path(spark_path)).toString().rstrip("/")
    while it.hasNext():
        p = it.next().getPath().toString()
        if not p.endswith(".parquet") or not p.startswith(qroot + "/"):
            continue
        rel = p[len(qroot) + 1 :]
        if rel.split("/", 1)[0] in reserved:
            raise ValueError(
                f"snaptable: convert_in_place found files under reserved "
                f"dir '{rel.split('/', 1)[0]}' at {path}"
            )
        rels.append(rel)
    if not rels:
        raise FileNotFoundError(f"snaptable: no parquet files under {path}")
    want = set(partition_cols)
    entries = []
    for rel in sorted(rels):
        partition = {}
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                k, v = seg.split("=", 1)
                partition[k] = (
                    None
                    if v == "__HIVE_DEFAULT_PARTITION__"
                    else _unquote_hive(v)
                )
        if set(partition) != want:
            hint = (
                f"pass partition_cols={sorted(set(partition))}"
                if partition
                else "the file is not Hive-partitioned"
            )
            raise ValueError(
                f"snaptable: convert_in_place file '{rel}' has partition "
                f"dirs {sorted(partition)} but partition_cols is "
                f"{sorted(want)} — {hint}"
            )
        entries.append({"path": rel, "base": "", "partition": partition})
    if schema is None:
        # mergeSchema unions heterogeneous file footers; note partition
        # column TYPES are Spark's dir-string inference (ints come back
        # INT even if the writer's column was LONG — Hive layout drops
        # the logical type). Pass ``schema`` (StructType or DDL string)
        # to pin the intended types instead.
        reader = spark.read.option("mergeSchema", "true")
        if partition_cols:
            reader = reader.option("basePath", spark_path)
        schema = reader.parquet(
            *[f"{spark_path}/{e['path']}" for e in entries]
        ).schema
    elif isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    if stats_cols is None:
        prim = ("byte", "short", "integer", "long", "float", "double", "string")
        stats_cols = [
            f.name
            for f in schema.fields
            if f.dataType.typeName() in prim and f.name not in partition_cols
        ]
    for e in entries:
        local = _os_mod.path.join(path, e["path"])
        stats, rows, nulls = (
            _footer_meta(local, stats_cols or [])
            if _os_mod.path.exists(local)
            else ({}, None, {})
        )
        e["stats"] = stats
        if rows is not None:
            e["rows"] = rows
        if nulls:
            e["nulls"] = nulls
    if not _try_commit(
        spark, path, 1, entries, schema.json(), "convert", None,
        tuple(partition_cols), stats_cols, {}, {},
    ):
        raise SnapshotConflict(f"snaptable: concurrent create at {path}")
    return 1


def set_partition_spec(
    spark: SparkSession, path: str, new_cols: tuple
) -> int:
    """Iceberg-style PARTITION EVOLUTION: change the partition spec for
    FUTURE writes as a metadata-only commit — zero files rewritten,
    O(1) regardless of table size. Existing files stay in their
    original layout; every manifest entry self-describes its own
    lifted partition values, so reads mix specs transparently
    (_files_df groups by each entry's actual layout) and
    ``scan(partitions=...)`` keeps pruning: entries written under the
    probed spec prune by dir value, entries from other specs are kept
    (unknown = keep) and the post-scan filter — the probed column is a
    DATA column in those files — guarantees exactness. A later
    ``compact``/``optimize_cluster`` rewrites everything under the
    current spec, converging the layout. ``new_cols=()`` un-partitions
    future writes.

    At 100 TB this is the operation that saves a full-table rewrite
    when the query pattern shifts (e.g. daily → hourly partitioning):
    new data lands in the new layout immediately, old data converges
    through routine compaction. Iceberg's partition-spec-evolution
    semantics; Delta requires a full overwriteSchema rewrite here."""
    from pyspark.sql.types import StructType

    base = _manifest(spark, path, None)
    schema = StructType.fromJson(json.loads(base["schema"]))
    if new_cols:
        _validate_partition_spec(schema, new_cols)
    if tuple(base.get("partition_cols", ())) == tuple(new_cols):
        return base["version"]  # already the active spec: no-op
    if not _try_commit(
        spark, path, base["version"] + 1, base["files"], base["schema"],
        f"partition-spec:{','.join(new_cols)}", base["version"],
        tuple(new_cols), base.get("stats_cols", ()), base.get("txn", {}),
        base.get("constraints", {}),
    ):
        raise SnapshotConflict(
            f"snaptable: set_partition_spec at {path} raced a concurrent "
            f"commit; re-run against the new head"
        )
    return base["version"] + 1


def _bloom_positions(value, bits: int, k: int) -> list[int]:
    """k bit positions for a value — md5-salted, identical in any
    engine/language (the repo's standard hash family)."""
    import hashlib as _hl

    return [
        int(_hl.md5(f"{i}#{value}".encode()).hexdigest()[:8], 16) % bits
        for i in range(k)
    ]


def add_bloom_index(
    spark: SparkSession,
    path: str,
    col: str,
    bits: int = 4096,
    k: int = 5,
) -> int:
    """Per-file Bloom sidecars for POINT lookups (Delta's bloom-filter
    index analog): footer min/max skip ranges, but an equality probe on
    a high-cardinality key whose values span every file (the usual
    unclustered layout) skips nothing. This commit records, per data
    file, a ``bits``-wide Bloom bitmap of the column's values in the
    MANIFEST (same files — metadata-only), and ``scan(point=)`` prunes
    files whose bitmap misses any of the probe's k positions. False
    positives only (a kept file may lack the value; the exact filter
    handles it) — never a false negative (pinned by test).

    Mechanics: one Spark pass over the snapshot computes each row's k
    bit positions JVM-side (``sketches.salted_position``, the repo's
    standard hash family); positions group by ``input_file_name`` into
    per-file position sets (bounded by ``bits``), and the driver packs
    them into hex bitmaps — metadata O(n_files * bits/8), data moved:
    none. Rewrites (compact/optimize/merge) produce new files WITHOUT
    blooms — point scans stay correct (unbloomied files are always
    kept) and re-indexing is one more metadata commit.

    Restricted to INTEGER and STRING columns: the probe side hashes
    with Python string rendering, which agrees with Spark's
    cast-to-string only for those types (doubles render '1.0E7' vs
    '10000000.0' — a silent false-negative factory).

    SIZING RULE: use ~10 bits per distinct key per file (k=5 then gives
    ~1% false-positive keep rate). An undersized bloom saturates (every
    bit set) and silently prunes NOTHING — measured: 19k keys/file
    against the 4096-bit default skipped 0/32 files, against 2^18 bits
    skipped 26/32. Cost: bits/8 bytes per file of manifest metadata."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.sketches import (
        salted_position,
    )

    if bits <= 0 or bits % 8 != 0 or k < 1:
        raise ValueError(
            f"snaptable: bloom bits must be a positive multiple of 8 and "
            f"k >= 1 (got bits={bits}, k={k})"
        )
    base = _manifest(spark, path, None)
    df = _df_for(spark, path, base)
    tname = df.schema[col].dataType.typeName()
    if tname not in ("byte", "short", "integer", "long", "string"):
        raise ValueError(
            f"snaptable: bloom index supports integer and string columns; "
            f"'{col}' is {tname} (float/boolean renderings differ between "
            f"the JVM index side and the Python probe side)"
        )
    pos_arr = F.array(
        *[salted_position(F.col(col), i, bits) for i in range(k)]
    )
    per_file = (
        df.select(
            F.input_file_name().alias("__file"),
            F.explode(pos_arr).alias("__pos"),
        )
        .groupBy("__file")
        .agg(F.collect_set("__pos").alias("__positions"))
        .collect()
    )
    # map scan URIs back to manifest entries by FULL relative path
    # suffix (shared _rel_resolver contract — see its docstring for why
    # basenames alone are not enough)
    _match = _rel_resolver(base["files"], _ext_roots(base))

    blooms: dict[str, str] = {}
    unmatched = 0
    for r in per_file:
        rel = _match(r["__file"])
        if rel is None:
            unmatched += 1
            continue
        mask = bytearray(bits // 8)
        for p in r["__positions"]:
            mask[p // 8] |= 1 << (p % 8)
        blooms[rel] = bytes(mask).hex()
    if per_file and not blooms:
        raise IOError(
            f"snaptable: bloom build could not map any scanned file back "
            f"to a manifest entry at {path} ({unmatched} unmatched) — "
            f"refusing to commit a no-op index"
        )
    files = []
    for e in base["files"]:
        e = dict(e)
        bl = dict(e.get("bloom", {}))
        if _erel(e) in blooms:
            bl[col] = {
                "bits": bits, "k": k, "mask": blooms[_erel(e)],
                "type": "int" if tname != "string" else "string",
            }
        e["bloom"] = bl
        files.append(e)
    if not _try_commit(
        spark, path, base["version"] + 1, files, base["schema"],
        f"bloom:{col}", base["version"], base.get("partition_cols", ()),
        base.get("stats_cols", ()), base.get("txn", {}),
        base.get("constraints", {}),
    ):
        raise SnapshotConflict(
            f"snaptable: add_bloom_index at {path} raced a concurrent "
            f"commit; re-run against the new head"
        )
    return base["version"] + 1


def _bloom_rules_out(e: dict, col: str, value) -> bool:
    """True iff this file's bloom PROVES the value is absent. The probe
    value is normalized to the indexed column's rendering (int columns
    hash str(int(v)) — so a float probe like 4242.0 against a long
    column matches the indexed '4242'; a non-integral float probe can
    never match an int column and rules every bloomed file out)."""
    meta = e.get("bloom", {}).get(col)
    if not meta:
        return False  # no bloom: always keep
    if meta.get("type") == "int":
        try:
            iv = int(value)
        except (TypeError, ValueError):
            return True  # non-numeric probe of an int column: absent
        if iv != value and not isinstance(value, str):
            return True  # non-integral float probe: cannot exist
        value = iv
    else:
        value = str(value)
    mask = bytes.fromhex(meta["mask"])
    for p in _bloom_positions(value, meta["bits"], meta["k"]):
        if not (mask[p // 8] >> (p % 8)) & 1:
            return True
    return False


_NUMERIC = ("byte", "short", "integer", "long", "float", "double")


def optimize_cluster(
    spark: SparkSession,
    path: str,
    cols: list[str],
    target_files: int = 16,
    bits: int | None = None,
    prune: dict | None = None,
) -> int:
    """Z-order clustering as a commit (Delta's ``OPTIMIZE ... ZORDER
    BY`` analog): rewrite the snapshot with rows ordered along a
    space-filling curve over ``cols``, so every output file covers a
    narrow min/max range on EVERY clustered column and
    ``scan(between=)`` skips files for predicates on any of them — the
    multi-dimensional version of what a plain sort buys one column.

    Mechanics, all scale-sane: per column, equi-depth bucket
    boundaries come from one ``approxQuantile`` pass (a driver-side
    list of at most ``2^bits`` scalars — skew-robust where linear
    min/max scaling is not); each row's per-column rank is computed
    JVM-side by counting boundaries <= value (a codegen'd fold over a
    literal array, no UDF); ranks bit-interleave into a z-value;
    ``repartitionByRange`` on z cuts ``target_files`` contiguous curve
    segments. No unpartitioned window anywhere. Like compact, the
    rewrite is invisible to the change feed (same rows) and old
    versions stay readable until vacuum.

    ``cols`` must be numeric and among the table's ``stats_cols``
    (skipping runs on footer stats; clustering a column without stats
    would order the data and then skip nothing).

    ``prune`` scopes the rewrite (Delta's ``OPTIMIZE ... WHERE``):
    scan()-style hints ({"partitions": ..., "between": ..., "point":
    ...}) select which FILES to re-cluster; everything else carries by
    reference, untouched. At 100 TB this is the only way OPTIMIZE is
    ever run — cluster the partition that just closed, not the table.
    The hint is a file selector, not a row filter, so the usual
    over-approximation is harmless here too: a loosely-matching hint
    rewrites a few extra files, never loses a row (rows in = rows
    out; the commit stays an ``optimize:`` row-preserving op).
    ``target_files`` then applies to the SCOPED subset. An empty
    selection is a no-op returning the current version."""
    from pyspark.sql import functions as F

    base = _manifest(spark, path, None)
    stats_cols = base.get("stats_cols", [])
    missing = [c for c in cols if c not in stats_cols]
    if missing:
        raise ValueError(
            f"snaptable: optimize_cluster cols {missing} are not in the "
            f"table's stats_cols {stats_cols} — files would be clustered "
            f"but carry no min/max to skip on"
        )
    cand = _pruned_candidates(base, prune)
    if not cand:
        return base["version"]  # nothing selected: no-op
    carried = (
        []
        if len(cand) == len(base["files"])
        else [
            e
            for e in base["files"]
            if _erel(e) not in {_erel(c) for c in cand}
        ]
    )
    df = _df_for(spark, path, base, cand)
    bad = [c for c in cols if df.schema[c].dataType.typeName() not in _NUMERIC]
    if bad:
        raise ValueError(
            f"snaptable: optimize_cluster supports numeric columns; "
            f"{bad} are not (at scale, strings cluster via a "
            f"dictionary-rank join — not needed for this surface)"
        )
    if bits is None:
        # enough curve resolution that each file maps to >= 4 curve
        # cells per dimension; capped so the rank fold stays small
        bits = max(4, min(8, (max(1, target_files - 1)).bit_length() + 2))
    # the top interleaved bit position is bits*len(cols)-1; past bit 62
    # it would shift into the long sign bit and silently invert the
    # curve order for high-rank rows
    bits = min(bits, 62 // max(1, len(cols)))
    nb = (1 << bits) - 1  # boundary count per column
    probs = [i / (nb + 1) for i in range(1, nb + 1)]
    # ONE stats pass for every clustered column (list form)
    all_bounds = df.stat.approxQuantile(list(cols), probs, 1.0 / (4 * (nb + 1)))
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        bounds = all_bounds[j]
        if not bounds:
            continue  # empty table / all-null column: nothing to order on
        # codegen'd fold: rank = #boundaries <= value (equi-depth bucket)
        rank = F.aggregate(
            F.lit(bounds),
            F.lit(0),
            lambda acc, b: acc + F.when(F.col(c) >= b, 1).otherwise(0),
        ).cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(rank, i).bitwiseAND(1), i * len(cols) + j
            )
    kept = (
        df.withColumn("__z", z)
        .repartitionByRange(target_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    op = f"optimize:{','.join(cols)}"
    if carried:
        return _partial_rewrite_commit(spark, path, kept, carried, op, base)
    return _rewrite_commit(spark, path, kept, op, base)


def _version_delta(
    spark: SparkSession, path: str, since_version: int, version: int | None
) -> tuple:
    """Entries only in the newer snapshot, entries only in the older,
    plus both manifests. The whole incremental-read family rests on
    file immutability: a path appearing in both manifests holds
    byte-identical rows in both, so the shared files NEVER need
    reading — version-to-version row change is fully determined by the
    two file-set differences (multiset arithmetic:
    rows(new) - rows(old) == rows(new-only files) - rows(old-only
    files))."""
    base = _manifest(spark, path, since_version)
    head = _manifest(spark, path, version)
    if head["version"] < base["version"]:
        raise ValueError(
            f"snaptable: incremental range is backwards "
            f"(since={base['version']} > at={head['version']})"
        )
    # entry identity = (path, deletion-vector refs): a DV commit changes
    # ROWS without changing file paths, so keying on path alone would
    # make a dv-delete invisible to the change feed. An entry whose DV
    # set changed appears as removed(old view) + added(new view); the
    # exceptAll sides then cancel everything but the dv-deleted rows —
    # still proportional to TOUCHED files.
    def _ekey(e: dict) -> tuple:
        return (e.get("x"), e["path"], tuple(e.get("dv", ())))

    base_keys = {_ekey(e) for e in base["files"]}
    head_keys = {_ekey(e) for e in head["files"]}
    added = [e for e in head["files"] if _ekey(e) not in base_keys]
    removed = [e for e in base["files"] if _ekey(e) not in head_keys]
    return base, head, added, removed


def read_increment(
    spark: SparkSession, path: str, since_version: int, version: int | None = None
) -> DataFrame:
    """Rows ADDED between ``since_version`` (exclusive) and ``version``
    (inclusive; default head) — the incremental-consumption contract a
    downstream pipeline wants: process only what is new, never rescan
    the table.

    Cost is proportional to the CHANGED files, not the table: a pure
    append range reads exactly the appended files (no diff computation
    at all — the 100 TB fast path, and why a streaming consumer over an
    ingest table is O(batch) per poll); ranges containing rewrites
    (delete/compact/merge) read only the rewritten files on both sides
    and cancel unchanged rows with one ``exceptAll``. Versions must
    both still be retained (vacuum erases history — callers poll
    faster than retention, exactly like Delta/Kafka retention)."""
    base, head, added, removed = _version_delta(spark, path, since_version, version)
    added_df = _df_for(spark, path, head, added)
    if not removed:
        return added_df
    # conform the base-side files to the HEAD schema: across a schema
    # evolution the diff compares rows under the current schema (pre-
    # evolution rows surface added columns as NULL on both sides, so an
    # untouched-but-rewritten row still cancels)
    return added_df.exceptAll(
        _df_for(spark, path, {**base, "schema": head["schema"]}, removed)
    )


def table_changes(
    spark: SparkSession, path: str, since_version: int, version: int | None = None
) -> DataFrame:
    """Row-level change feed between two retained versions: the
    snapshot delta expressed as ``_change_type`` ∈ {insert, delete}
    rows (an UPDATE is a delete of the old row plus an insert of the
    new — the minimal CDF model; Delta's pre/postimage refinement
    layers on top). A compact produces an EMPTY feed — same rows, new
    files, the two ``exceptAll`` sides cancel — so file-layout
    maintenance is invisible to downstream consumers, which is the
    property that lets OPTIMIZE run on a table others tail."""
    from pyspark.sql import functions as F

    base, head, added, removed = _version_delta(spark, path, since_version, version)
    added_df = _df_for(spark, path, head, added)
    # base-side files conform to the HEAD schema (see read_increment)
    removed_df = _df_for(spark, path, {**base, "schema": head["schema"]}, removed)
    if not removed:
        ins, dels = added_df, added_df.limit(0)
    else:
        ins = added_df.exceptAll(removed_df)
        dels = removed_df.exceptAll(added_df)
    return ins.withColumn("_change_type", F.lit("insert")).unionByName(
        dels.withColumn("_change_type", F.lit("delete"))
    )


def change_feed(
    spark: SparkSession,
    path: str,
    since_version: int,
    version: int | None = None,
) -> DataFrame:
    """Per-COMMIT change feed (Delta CDF semantics): every commit in
    ``(since_version, version]`` contributes its own changes tagged
    with ``_change_type`` and ``_commit_version`` — unlike
    :func:`table_changes`, which returns the NET multiset diff of the
    whole range (an insert-then-delete nets out there but appears
    twice here). Per version:

    - append/create: the added files' rows AS the inserts — no diff
      computation, no sidecar needed (the Delta trick);
    - row-preserving maintenance (compact/optimize/bloom/purge) and
      constraint commits: nothing;
    - DML committed with ``cdf=True``: the persisted sidecar verbatim
      (exact, zero diff cost at read time);
    - DML without a sidecar: per-version fallback through
      :func:`table_changes` (exact, pays the rewritten-file reads).

    All parts conform to the HEAD schema (pre-evolution rows surface
    added columns as NULL). ``since_version=0`` feeds from the very
    first retained commit (the create included)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    lo = (
        0
        if since_version == 0
        else _manifest(spark, path, since_version)["version"]
    )
    head = _manifest(spark, path, version)
    until = head["version"]
    if until < lo:
        raise ValueError(
            f"snaptable: change_feed range is backwards "
            f"(since={lo} > at={until})"
        )
    schema = StructType.fromJson(json.loads(head["schema"]))
    sidecar_schema = StructType(
        list(schema.fields) + [StructField("_change_type", StringType())]
    )
    root = path.rstrip("/")
    parts = []
    for v in range(lo + 1, until + 1):
        m = _manifest(spark, path, v)
        op = m.get("op", "")
        if _is_row_preserving(op) or op.startswith("constraint:") or \
                op.startswith("evolve:") or op.startswith("partition-spec:") \
                or op.startswith("rename:") or op.startswith("drop:"):
            continue
        # a shallow/deep clone's v1 is a create-shaped commit: its
        # referenced files ARE the inserts (there is no v0 to diff)
        if op in ("create", "append") or (
            v == 1 and op.startswith("clone:")
        ):
            if v == 1:
                added = m["files"]
            else:
                _, _, added, _ = _version_delta(spark, path, v - 1, v)
            part = _df_for(
                spark, path, {**m, "schema": head["schema"]}, added
            ).withColumn("_change_type", F.lit("insert"))
        elif m.get("cdf"):
            part = spark.read.schema(sidecar_schema).parquet(
                f"{root}/{m['cdf']}"
            )
        else:
            part = table_changes(spark, path, v - 1, v)
        parts.append(part.withColumn("_commit_version", F.lit(v)))
    if not parts:
        return spark.createDataFrame(
            [],
            StructType(
                list(sidecar_schema.fields)
                + [StructField("_commit_version", IntegerType())]
            ),
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


class TableTailer:
    """Incremental consumer: repeatedly ``poll()`` a table and receive
    only the rows added since the previous poll — the batch analog of a
    streaming source over the table, built on :func:`read_increment`
    (pure-append polls read exactly the new files).

    The cursor is just the last-seen version number. Persist it
    (``tailer.cursor``) beside the consumer's own output and pass it
    back on restart for exactly-once consumption — the same
    version-watermark discipline the txn map gives writers. Retention
    contract: poll at least as often as vacuum's ``keep_last`` horizon
    retains versions, or the increment raises FileNotFoundError (the
    consumer fell behind history — like falling off a Kafka retention
    window; recover by reprocessing the full snapshot and resetting the
    cursor to its version)."""

    def __init__(self, path: str, cursor: int | None = None):
        self.path = path
        self.cursor = cursor

    def poll(self, spark: SparkSession) -> DataFrame | None:
        """Rows added since the last poll, or None when nothing new
        (callers skip the no-op batch without running a job). First
        poll with no cursor returns the full current snapshot."""
        vs = versions(spark, self.path)
        if not vs:
            return None
        head = vs[-1]
        if self.cursor is None:
            self.cursor = head
            return read(spark, self.path, head)
        if head == self.cursor:
            return None
        inc = read_increment(spark, self.path, self.cursor, head)
        self.cursor = head
        return inc


def history(spark: SparkSession, path: str) -> DataFrame:
    """The commit log as a DataFrame (Delta's DESCRIBE HISTORY /
    Iceberg's snapshots metadata table): one row per retained version
    with op, parent, file count, DV count, committed_at and the txn
    map rendered as JSON. Driver-side manifest reads (bounded by
    retention), distributed nothing — metadata is small by design."""
    rows = []
    for v in versions(spark, path):
        try:
            m = _read_json(spark, _snap_path(path, v))
        except Exception:
            continue  # vacuumed mid-listing
        rows.append((
            v,
            m.get("op"),
            m.get("parent"),
            len(m["files"]),
            sum(1 for e in m["files"] if e.get("dv")),
            json.dumps(m.get("txn", {}), sort_keys=True),
            json.dumps(m.get("constraints", {}), sort_keys=True),
            m.get("committed_at"),
        ))
    return spark.createDataFrame(
        rows,
        "version bigint, op string, parent bigint, n_files int, "
        "n_dv_files int, txn string, constraints string, "
        "committed_at bigint",
    )


def files_df(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """A snapshot's manifest entries as a DataFrame (Iceberg's files
    metadata table): rel path, commit group, partition values (JSON),
    per-column stats (JSON), DV refs, bloom-indexed columns."""
    m = _manifest(spark, path, version)
    rows = [
        (
            e["path"],
            e.get("base"),
            json.dumps(e.get("partition", {}), sort_keys=True),
            json.dumps(e.get("stats", {}), sort_keys=True),
            list(e.get("dv", [])),
            sorted(e.get("bloom", {})),
        )
        for e in m["files"]
    ]
    return spark.createDataFrame(
        rows,
        "path string, base string, partition string, stats string, "
        "dv array<string>, bloom_cols array<string>",
    )


def count_rows(
    spark: SparkSession, path: str, version: int | None = None
) -> int:
    """COUNT(*) from manifest metadata where possible (Delta's
    stats-based count): entries carrying a footer ``rows`` count and no
    deletion vector sum driver-side with ZERO files opened — at 100 TB
    a table count is a metadata lookup, not a scan. Entries that can't
    be counted from metadata (DV'd files — their sidecars may hold
    positions for since-rewritten files, so sidecar row counts
    over-subtract; or entries from writers that recorded no count)
    fall back to one Spark count over JUST those entries. Always
    exact; metadata-only in the common case."""
    m = _manifest(spark, path, version)
    meta = [e for e in m["files"] if "rows" in e and not e.get("dv")]
    rest = [e for e in m["files"] if "rows" not in e or e.get("dv")]
    total = sum(e["rows"] for e in meta)
    if rest:
        total += _df_for(spark, path, m, rest).count()
    return total


def column_bounds(
    spark: SparkSession,
    path: str,
    cols: list[str],
    version: int | None = None,
) -> dict:
    """Exact per-column (min, max) from manifest metadata where
    possible — Delta's stats-based SELECT MIN/MAX optimization, the
    companion of :func:`count_rows`: a file's footer min/max IS the
    file's true range (the ``_file_stats`` incomplete-drop rule
    guarantees recorded stats are never narrower than the file), so
    folding entry stats driver-side answers with ZERO files opened.
    Two entry shapes can't be answered from metadata:

    - an entry with no recorded stats for the column (pre-evolution
      files for an added column, converted tables whose footers lacked
      stats, non-stats_cols columns);
    - an entry carrying a deletion vector — the min/max row itself may
      be among the deleted positions, so footer stats are only BOUNDS.

    Those fall back to ONE column-pruned Spark aggregation over JUST
    the unanswerable entries, folded with the metadata of the rest.
    Always exact; metadata-only in the common case. Partition columns
    also take the scan path (their lifted manifest values are strings
    — ordering them as the column's real type would need a cast layer
    the one column-pruned job makes unnecessary). SQL semantics:
    min/max ignore NULLs; an empty table (or all-NULL column) yields
    (None, None).

    Assumes the parquet writer records UNtruncated binary stats (Spark
    / parquet-mr default) — the same contract the scan pruning already
    relies on."""
    from pyspark.sql import functions as F

    m = _manifest(spark, path, version)
    want = list(cols)
    schema_names = {
        f["name"] for f in json.loads(m["schema"])["fields"]
    }
    for c in want:
        if c not in schema_names:
            raise ValueError(f"snaptable: column_bounds of unknown column {c!r}")
    cmap = _name_chain(m)
    out = {c: (None, None) for c in want}
    need_scan: dict = {c: [] for c in want}
    for e in m["files"]:
        dv = bool(e.get("dv"))
        for c in want:
            st = e.get("stats", {}).get(c)
            for n in cmap.get(c, ()):  # pre-rename generations
                if st is not None:
                    break
                st = e.get("stats", {}).get(n)
            if dv or st is None:
                # DV'd entry, or no recorded range (all-NULL and
                # never-recorded look the same) — only a scan can tell
                need_scan[c].append(e)
                continue
            lo, hi = st[0], st[1]
            mn, mx = out[c]
            out[c] = (
                lo if mn is None or lo < mn else mn,
                hi if mx is None or hi > mx else mx,
            )
    # group columns by their exact unanswerable-entry subset and run
    # ONE column-pruned aggregation per distinct subset (in practice
    # one: the same DV'd/statless entries usually block every column)
    by_subset: dict = {}
    for c in want:
        if need_scan[c]:
            key = tuple(sorted(e["path"] for e in need_scan[c]))
            by_subset.setdefault(key, (need_scan[c], []))[1].append(c)
    for ents, cs in by_subset.values():
        row = _df_for(spark, path, m, ents).agg(
            *[
                a
                for c in cs
                for a in (
                    F.min(c).alias(f"mn_{c}"),
                    F.max(c).alias(f"mx_{c}"),
                )
            ]
        ).collect()[0]
        for c in cs:
            lo, hi = row[f"mn_{c}"], row[f"mx_{c}"]
            mn, mx = out[c]
            if lo is not None:
                out[c] = (
                    lo if mn is None or lo < mn else mn,
                    hi if mx is None or hi > mx else mx,
                )
    return out


def null_counts(
    spark: SparkSession,
    path: str,
    cols: list[str],
    version: int | None = None,
) -> dict:
    """Exact per-column NULL counts, metadata-only where possible: the
    parquet footer records each column chunk's null count, and the
    writers lift the per-file sum into the manifest (``nulls`` entry
    key) — so the common case folds driver-side with zero files
    opened, the same contract as :func:`count_rows`/:func:`column_bounds`.
    Entries that can't answer (DV'd — deleted positions may be the
    NULLs; written before the key existed; footer withheld the count)
    fall back to one conditional-aggregation scan over just those
    entries. Always exact."""
    from pyspark.sql import functions as F

    m = _manifest(spark, path, version)
    schema_names = {f["name"] for f in json.loads(m["schema"])["fields"]}
    for c in cols:
        if c not in schema_names:
            raise ValueError(
                f"snaptable: null_counts of unknown column {c!r}"
            )
    cmap = _name_chain(m)
    out = {c: 0 for c in cols}
    need_scan: dict = {c: [] for c in cols}
    for e in m["files"]:
        dv = bool(e.get("dv"))
        nulls = e.get("nulls", {})
        rows = e.get("rows")
        parts = e.get("partition") or {}
        for c in cols:
            p = next(
                (n for n in [c] + cmap.get(c, []) if n in nulls), c
            )
            if not dv and p in nulls:
                out[c] += nulls[p]
            elif not dv and c in parts and rows is not None:
                # a partition column is constant per file: NULL dirs
                # (__HIVE_DEFAULT_PARTITION__) lift as None
                out[c] += rows if parts[c] is None else 0
            else:
                need_scan[c].append(e)
    by_subset: dict = {}
    for c in cols:
        if need_scan[c]:
            key = tuple(sorted(e["path"] for e in need_scan[c]))
            by_subset.setdefault(key, (need_scan[c], []))[1].append(c)
    for ents, cs in by_subset.values():
        row = _df_for(spark, path, m, ents).agg(
            *[
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"n_{c}")
                for c in cs
            ]
        ).collect()[0]
        for c in cs:
            out[c] += row[f"n_{c}"]
    return out


_ANALYZE_FILE = "analyze.json"


def analyze_table(
    spark: SparkSession,
    path: str,
    cols: list[str] | None = None,
    hll_b: int = 12,
) -> dict:
    """ANALYZE TABLE ... COMPUTE STATISTICS (FOR COLUMNS): per-column
    row count, exact null count, exact min/max, and an HLL
    distinct-count estimate (2^hll_b registers; ~1.04/sqrt(m) standard
    error — b=12 gives ~1.6%), persisted as an ``analyze.json`` sidecar
    beside the manifests (the metastore-statistics analog; versioned
    tables keep data and statistics separate exactly like Spark/Hive
    ANALYZE). Nulls and bounds ride the metadata fast paths
    (:func:`null_counts`, :func:`column_bounds`) — usually zero data
    I/O; the NDV sketch is ONE scan for ALL columns: values stack into
    (column, value) rows and the partial-aggregable HLL registers fold
    map-side, so the pass ships <= n_cols * 2^hll_b register rows
    however large the table. The sidecar records ``at_version``;
    readers compare it to the head to detect staleness (statistics are
    advisory — nothing correctness-bearing consumes them)."""
    import os

    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.sketches import (
        hll_distinct,
    )

    m = _manifest(spark, path, None)
    fields = json.loads(m["schema"])["fields"]
    names = [f["name"] for f in fields]
    if cols is None:
        prim = {"byte", "short", "integer", "long", "float", "double",
                "string", "date", "boolean"}
        cols = [
            f["name"] for f in fields
            if isinstance(f["type"], str) and f["type"] in prim
        ]
    for c in cols:
        if c not in names:
            raise ValueError(f"snaptable: analyze of unknown column {c!r}")
    total = count_rows(spark, path, version=m["version"])
    nulls = null_counts(spark, path, cols, version=m["version"])
    bounds = column_bounds(spark, path, cols, version=m["version"])
    df = _df_for(spark, path, m)
    stacked = df.selectExpr(
        "stack({}, {}) AS (col_name, col_value)".format(
            len(cols),
            ", ".join(
                f"'{c}', CAST(`{c}` AS STRING)" for c in cols
            ),
        )
    ).filter(F.col("col_value").isNotNull())
    import math

    m_regs = 1 << hll_b
    ndv = {}
    for r in hll_distinct(
        stacked, "col_value", ["col_name"], b=hll_b
    ).collect():
        est, n_zero = float(r["hll_distinct"]), int(r["n_zero"])
        if n_zero > 0 and est <= 2.5 * m_regs:
            # LinearCounting small-range correction (advisory stats —
            # the float ln the oracled sketch rows firewall away is
            # fine here)
            est = m_regs * math.log(m_regs / n_zero)
        ndv[r["col_name"]] = int(round(est))
    stats = {
        "at_version": m["version"],
        "rows": total,
        "hll_b": hll_b,
        "columns": {
            c: {
                "nulls": nulls[c],
                "min": bounds[c][0],
                "max": bounds[c][1],
                "ndv": ndv.get(c, 0),
            }
            for c in cols
        },
    }
    tmp = os.path.join(path, _ANALYZE_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True, default=str)
    os.replace(tmp, os.path.join(path, _ANALYZE_FILE))
    return stats


def export_file_list(
    spark: SparkSession, path: str, version: int | None = None
) -> dict:
    """Interop export (Delta's symlink_format_manifest analog): the
    exact parquet files one snapshot references, for engines that read
    raw parquet (DuckDB, Trino's hive connector, pandas). Writes
    ``export/manifest-v<N>.txt`` (one absolute path per line, atomic
    rename) and returns ``{"version", "files", "manifest",
    "duckdb_sql"}`` — the SQL is a ready ``read_parquet([...],
    union_by_name=true)`` (union_by_name pads pre-evolution files'
    missing columns with NULL, matching this engine's own conform).

    IDENTITY-partitioned snapshots export as a typed SELECT over
    ``read_parquet(..., hive_partitioning=true, hive_types={...})`` —
    DuckDB lifts the dir-only columns natively, pinned to the table's
    types and projected back into schema order.

    REFUSED for snapshots an external engine would read WRONG:
    deletion vectors (the deleted rows would resurrect), column
    mapping (pre-rename files answer under the physical name), and
    identity layouts hive partitioning cannot represent faithfully
    (NULL partition dirs, %-escaped values, mixed dir/data epochs).
    Purge the DVs / compact after the rename / compact under a flat
    spec respectively."""
    import os

    m = _manifest(spark, path, version)
    if any(e.get("dv") for e in m["files"]):
        raise ValueError(
            "snaptable: export_file_list refused — snapshot carries "
            "deletion vectors an external parquet reader cannot apply "
            "(run purge_deletes first)"
        )
    if _name_chain(m):
        raise ValueError(
            "snaptable: export_file_list refused — renamed columns "
            "resolve through the manifest's column mapping, which an "
            "external parquet reader cannot see (compact to converge "
            "the files first)"
        )
    # Dir keys split two ways. DERIVED (transform) names are redundant
    # — the source column stays in the data files, plain read_parquet
    # works. IDENTITY dirs hold the column's ONLY copy, which a plain
    # read silently drops — DuckDB recovers them natively with
    # hive_partitioning=true, so identity layouts export as a typed
    # SELECT over a hive-aware read (VERDICT r9 item 3) instead of
    # refusing; only layouts hive partitioning cannot represent
    # faithfully (NULL dirs, %-escaped values, entries MISSING the dir)
    # still refuse loudly.
    fields = json.loads(m["schema"])["fields"]
    schema_names = {f["name"] for f in fields}
    identity_keys: set = set()
    for e in m["files"]:
        for k in e.get("partition", {}):
            # a dir key that IS a schema column is identity by
            # definition (derived names are validated never to collide
            # with columns) — checked before the structural pattern so
            # a real column unluckily named like one can't slip through
            if k in schema_names:
                identity_keys.add(k)
                continue
            if not any(
                _derived_probe(k, c) is not None for c in schema_names
            ):
                raise ValueError(
                    f"snaptable: export_file_list refused — entry "
                    f"{e['path']!r} carries directory key {k!r} that is "
                    f"neither a table column nor a recognized transform "
                    f"of one"
                )
    hive_types = {}
    if identity_keys:
        # every entry must carry every identity dir (a mixed layout —
        # older flat files holding the column IN the data — would make
        # DuckDB's path-derived column collide with the data column),
        # with plain unescaped non-NULL values
        for e in m["files"]:
            part = e.get("partition", {})
            for k in sorted(identity_keys):
                if k not in part:
                    raise ValueError(
                        f"snaptable: export_file_list refused — entry "
                        f"{e['path']!r} predates the identity spec on "
                        f"{k!r} (mixed dir/data layouts confuse "
                        f"hive_partitioning; compact first)"
                    )
                v = part[k]
                if v is None:
                    raise ValueError(
                        f"snaptable: export_file_list refused — entry "
                        f"{e['path']!r} sits in the NULL partition of "
                        f"{k!r}, which hive_partitioning cannot lift "
                        f"(compact under a flat spec first)"
                    )
                if f"{k}={v}/" not in e["path"] + "/":
                    raise ValueError(
                        f"snaptable: export_file_list refused — "
                        f"{k}={v!r} renders escaped in {e['path']!r}; "
                        f"an external hive reader would mis-read it "
                        f"(compact under a flat spec first)"
                    )
        duck = {
            "long": "BIGINT", "integer": "INTEGER", "short": "SMALLINT",
            "byte": "TINYINT", "string": "VARCHAR", "date": "DATE",
            "boolean": "BOOLEAN", "double": "DOUBLE", "float": "FLOAT",
        }
        for f in fields:
            if f["name"] in identity_keys:
                t = duck.get(f["type"] if isinstance(f["type"], str) else "")
                if t is None:
                    raise ValueError(
                        f"snaptable: export_file_list refused — no "
                        f"DuckDB hive type mapping for partition column "
                        f"{f['name']!r} of type {f['type']!r}"
                    )
                hive_types[f["name"]] = t
    root = os.path.abspath(path.rstrip("/"))
    ext = _ext_roots(m)
    files = sorted(
        os.path.join(_entry_root(root, ext, e), e["path"])
        for e in m["files"]
    )
    os.makedirs(os.path.join(root, "export"), exist_ok=True)
    dst = os.path.join(root, "export", f"manifest-v{m['version']}.txt")
    tmp = dst + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(files) + "\n")
    os.replace(tmp, dst)
    listing = ", ".join(f"'{p}'" for p in files)
    if identity_keys:
        # typed hive read (hive_types pins each dir column to the TABLE
        # type — no value-shape autocasting), projected back to the
        # exact table schema so the lifted dir columns land in schema
        # position and no derived dir leaks in as an extra column
        ht = ", ".join(
            f"'{k}': {t}" for k, t in sorted(hive_types.items())
        )
        cols = ", ".join(f'"{f["name"]}"' for f in fields)
        sql = (
            f"(SELECT {cols} FROM read_parquet([{listing}], "
            f"union_by_name=true, hive_partitioning=true, "
            f"hive_types={{{ht}}}))"
        )
    else:
        sql = f"read_parquet([{listing}], union_by_name=true)"
    return {
        "version": m["version"],
        "files": files,
        "manifest": dst,
        "duckdb_sql": sql,
    }


def table_bytes(spark: SparkSession, path: str, version: int | None = None) -> int:
    """Total on-disk bytes of a snapshot's referenced files — driver-
    side file-status calls over the manifest's entry list (O(files),
    zero data read). The size input to join planning."""
    m = _manifest(spark, path, version)
    fs, Path = _hadoop_fs(spark, path)
    root = path.rstrip("/")
    ext = _ext_roots(m)
    total = 0
    for e in m["files"]:
        try:
            groot = _entry_root(root, ext, e)
            total += fs.getFileStatus(Path(f"{groot}/{e['path']}")).getLen()
        except Exception:
            pass  # racing vacuum: size what survives
    return int(total)


def suggest_join(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    broadcast_threshold: int = 32 << 20,
) -> dict:
    """Statistics-driven join-strategy advice (the cost-based decision
    Spark can't make well from file sizes alone once filters/DVs skew
    them): per side, rows come from ANALYZE statistics when fresh,
    else the metadata-exact :func:`count_rows`; bytes from
    :func:`table_bytes`. The smaller side broadcasts when its size
    clears the threshold — at 100 TB this is the difference between
    shipping a 10 MB dimension to every executor and shuffling the
    fact table. Returns the decision with its inputs (advisory;
    :func:`join_tables` applies it)."""
    sides = {}
    for tag, p in (("left", left_path), ("right", right_path)):
        stats = table_statistics(spark, p)
        rows = (
            stats["rows"]
            if stats and not stats.get("stale")
            else count_rows(spark, p)
        )
        sides[tag] = {
            "path": p,
            "rows": rows,
            "bytes": table_bytes(spark, p),
            "stats_fresh": bool(stats and not stats.get("stale")),
        }
    small = min(sides, key=lambda t: sides[t]["bytes"])
    strategy = (
        f"broadcast_{small}"
        if sides[small]["bytes"] <= broadcast_threshold
        else "shuffle"
    )
    return {**sides, "strategy": strategy,
            "threshold_bytes": broadcast_threshold}


def join_tables(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    on,
    how: str = "inner",
    broadcast_threshold: int = 32 << 20,
) -> DataFrame:
    """Join two snaptables with the statistics-driven strategy from
    :func:`suggest_join` applied: the under-threshold smaller side gets
    an explicit broadcast hint (authoritative even where Spark's own
    size estimate — inflated by DV'd or soon-filtered files — would
    have picked a shuffle); otherwise the join is left to the planner
    (AQE can still re-plan at runtime)."""
    from pyspark.sql import functions as F

    plan = suggest_join(spark, left_path, right_path, broadcast_threshold)
    left, right = read(spark, left_path), read(spark, right_path)
    if plan["strategy"] == "broadcast_left":
        left = F.broadcast(left)
    elif plan["strategy"] == "broadcast_right":
        right = F.broadcast(right)
    return left.join(right, on, how)


def _chain_estimates(spark: SparkSession, tables: dict) -> dict:
    """Per-table planning inputs: rows (fresh ANALYZE statistics, else
    the metadata-exact count), manifest bytes, derived row width, and
    per-column HLL NDV where analyzed (missing/stale NDV falls back to
    the row count — every key distinct, the conservative FK->PK
    assumption)."""
    est = {}
    for name, p in tables.items():
        stats = table_statistics(spark, p)
        fresh = bool(stats and not stats.get("stale"))
        rows = stats["rows"] if fresh else count_rows(spark, p)
        nbytes = table_bytes(spark, p)
        ndv = {}
        if fresh:
            for c, cs in stats.get("columns", {}).items():
                if cs.get("ndv"):
                    ndv[c] = min(int(cs["ndv"]), max(rows, 1))
        est[name] = {
            "path": p,
            "rows": max(rows, 1),
            "bytes": nbytes,
            "width": nbytes / max(rows, 1),
            "ndv": ndv,
            "stats_fresh": fresh,
            "bounds": {
                c: (cs.get("min"), cs.get("max"))
                for c, cs in (stats or {}).get("columns", {}).items()
            }
            if fresh
            else {},
        }
    return est


#: simple-predicate shapes the selectivity estimator understands
_SEL_EQ = _re.compile(
    r"^\s*`?(\w+)`?\s*=\s*('[^']*'|[-0-9.eE+]+)\s*$"
)
_SEL_CMP = _re.compile(
    r"^\s*`?(\w+)`?\s*(<=|>=|<|>)\s*('[^']*'|[-0-9.eE+]+)\s*$"
)
_SEL_BETWEEN = _re.compile(
    r"`?(\w+)`?\s+between\s+('[^']*'|[-0-9.eE+]+)"
    r"\s+and\s+('[^']*'|[-0-9.eE+]+)",
    _re.IGNORECASE,
)


def _sel_num(x) -> float | None:
    """A value on the selectivity number line: numbers as themselves,
    ISO dates/timestamps as epoch seconds (so a date filter on a date
    column computes a real fraction). None when neither."""
    import datetime as _dt

    if isinstance(x, str) and len(x) >= 2 and x[0] == "'" and x[-1] == "'":
        x = x[1:-1]
    try:
        return float(x)
    except (TypeError, ValueError):
        pass
    for parse in (_dt.datetime.fromisoformat, _dt.date.fromisoformat):
        try:
            v = parse(x)
            if isinstance(v, _dt.datetime):
                return v.timestamp()
            return _dt.datetime(v.year, v.month, v.day).timestamp()
        except (TypeError, ValueError):
            continue
    return None


def _span_fraction(side: dict, col: str, lo_q, hi_q) -> float | None:
    """Fraction of [min, max] a query range covers (numeric or
    date/timestamp bounds — ANALYZE serializes the latter as ISO
    strings)."""
    lo, hi = side["bounds"].get(col, (None, None))
    lo, hi = _sel_num(lo), _sel_num(hi)
    lo_q, hi_q = (
        _sel_num(lo_q) if not isinstance(lo_q, float) else lo_q,
        _sel_num(hi_q) if not isinstance(hi_q, float) else hi_q,
    )
    if None in (lo, hi, lo_q, hi_q) or hi <= lo:
        return None
    return min(1.0, max(0.0, (min(hi_q, hi) - max(lo_q, lo)) / (hi - lo)))


def _filter_selectivity(side: dict, pred: str) -> float:
    """Selectivity of a SIMPLE predicate from ANALYZE statistics —
    ``col = lit`` -> 1/ndv(col); ``col <op> lit`` / BETWEEN -> the
    covered fraction of the [min, max] span (numeric bounds only).
    Conjunctions (AND) multiply (independence assumption). Anything
    the parser doesn't recognize contributes 1.0 — unknown never
    shrinks an estimate. Advisory only: the EXECUTED filter is always
    the full predicate."""
    sel = 1.0
    # BETWEEN first (its own AND would confuse the conjunction split)
    for m in _SEL_BETWEEN.finditer(pred):
        lo_q, hi_q = _sel_num(m.group(2)), _sel_num(m.group(3))
        if None in (lo_q, hi_q):
            continue
        rng = _span_fraction(side, m.group(1), lo_q, hi_q)
        if rng is not None:
            sel *= rng
    pred = _SEL_BETWEEN.sub(" 1 = 1 ", pred)
    inf = float("inf")
    for clause in _re.split(r"(?i)\s+and\s+", pred):
        m = _SEL_EQ.match(clause)
        if m:
            ndv = side["ndv"].get(m.group(1))
            if ndv:
                sel *= 1.0 / ndv
            continue
        m = _SEL_CMP.match(clause)
        if m:
            col, op, lit = m.group(1), m.group(2), _sel_num(m.group(3))
            if lit is None:
                continue
            rng = (
                _span_fraction(side, col, -inf, lit)
                if op in ("<", "<=")
                else _span_fraction(side, col, lit, inf)
            )
            if rng is not None:
                sel *= rng
    return max(sel, 1e-9)


def _apply_filter_estimates(est: dict, filters: dict | None) -> None:
    """Scale each filtered table's row/byte/NDV estimates by its
    predicate's selectivity (in place). NDVs cap at the filtered row
    count; an equality-filtered column's NDV collapses to 1."""
    for name, pred in (filters or {}).items():
        side = est[name]
        sel = _filter_selectivity(side, pred)
        rows = max(1, int(side["rows"] * sel))
        side["rows"] = rows
        side["bytes"] = int(side["bytes"] * sel)
        side["ndv"] = {c: min(v, rows) for c, v in side["ndv"].items()}
        for clause in _re.split(r"(?i)\s+and\s+", pred):
            m = _SEL_EQ.match(clause)
            if m and m.group(1) in side["ndv"]:
                side["ndv"][m.group(1)] = 1
        side["selectivity"] = sel


def _key_ndv(side: dict, keys: list[str], cap: int) -> int:
    """NDV of a (possibly composite) key on one side: product of
    per-column NDVs, capped at the side's row count (a key can't have
    more distinct values than rows). Unanalyzed columns count as
    all-distinct (cap) — conservative for the FK side, exact for a PK."""
    prod = 1
    for k in keys:
        prod *= side["ndv"].get(k, cap)
        if prod >= cap:
            return cap
    return max(1, min(prod, cap))


def _edge_out_rows(a: dict, b: dict, keys: list[str]) -> int:
    """System-R containment estimate: |A join B on K| =
    |A|*|B| / max(ndv_A(K), ndv_B(K))."""
    na = _key_ndv(a, keys, a["rows"])
    nb = _key_ndv(b, keys, b["rows"])
    return max(1, (a["rows"] * b["rows"]) // max(na, nb, 1))


def _order_cost(est: dict, edges: list, order: list[str]) -> dict:
    """Estimated cost of joining ``order`` left-to-right along
    ``edges``: per-step output rows/bytes plus their totals (the
    smallest-intermediate objective). Selinger formulation: each edge
    contributes an order-independent selectivity
    ``1 / max(ndv_a(K), ndv_b(K))`` from its ORIGINAL endpoints'
    statistics, applied once when its second endpoint joins — so the
    estimated cardinality of a prefix is a pure function of its table
    SET, which is exactly what makes the subset DP in
    :func:`_best_order_dp` optimal (an order-dependent refinement like
    carrying capped intermediate NDVs breaks dominance: a cheaper
    prefix can no longer stand in for all orders of its subset —
    measured producing plans 2.6x worse than a random order before
    this was reverted). Raises if a prefix of the order has no edge
    into the next table (disconnected at that point)."""
    steps = []
    total_rows = total_bytes = 0
    in_s = {order[0]}
    rows = float(est[order[0]]["rows"])
    width = est[order[0]]["width"]
    for name in order[1:]:
        # ALL edges from the placed set into `name` apply (a cyclic
        # graph contributes every condition; the executor merges the
        # key columns as one composite USING key — dropping one would
        # silently widen the result)
        conn = [
            (a, b, k)
            for a, b, k in edges
            if (a in in_s and b == name) or (b in in_s and a == name)
        ]
        if not conn:
            raise ValueError(
                f"snaptable: join graph is disconnected — no edge joins "
                f"{name!r} to {sorted(in_s)}"
            )
        keys = sorted({kc for _, _, k in conn for kc in k})
        nxt = est[name]
        rows *= nxt["rows"]
        for a, b, k in conn:
            rows /= max(
                _key_ndv(est[a], k, est[a]["rows"]),
                _key_ndv(est[b], k, est[b]["rows"]),
                1,
            )
        out_rows = max(1, int(rows))
        rows = float(out_rows)
        width += nxt["width"]
        out_bytes = int(out_rows * width)
        steps.append(
            {"table": name, "on": keys, "est_rows": out_rows,
             "est_bytes": out_bytes}
        )
        total_rows += out_rows
        total_bytes += out_bytes
        in_s.add(name)
    return {"order": list(order), "steps": steps,
            "total_intermediate_rows": total_rows,
            "total_intermediate_bytes": total_bytes}


#: past this many tables the exact left-deep DP (2^n states) yields to
#: the greedy — far beyond any real analytics chain either way
_DP_MAX_TABLES = 10


def _best_order_greedy(est: dict, norm: list, tables) -> list[str]:
    """Greedy smallest-intermediate-first left-deep order: seed with
    the edge whose estimated output bytes are lowest (larger side
    first — the smaller is the broadcast candidate), then repeatedly
    attach the connected table minimizing the next intermediate."""
    best = None
    for a, b, keys in norm:
        rows = _edge_out_rows(est[a], est[b], keys)
        nbytes = int(rows * (est[a]["width"] + est[b]["width"]))
        if best is None or nbytes < best[0]:
            big, small = (a, b) if est[a]["bytes"] >= est[b]["bytes"] else (b, a)
            best = (nbytes, [big, small])
    order = best[1]
    placed = set(order)
    while len(placed) < len(tables):
        cand = None
        for a, b, keys in norm:
            nxt = b if a in placed and b not in placed else (
                a if b in placed and a not in placed else None
            )
            if nxt is None:
                continue
            cost = _order_cost(est, norm, order + [nxt])
            lb = cost["steps"][-1]["est_bytes"]
            if cand is None or lb < cand[0]:
                cand = (lb, nxt)
        if cand is None:
            raise ValueError(
                "snaptable: join graph is disconnected — "
                f"nothing joins {sorted(set(tables) - placed)} to {order}"
            )
        order.append(cand[1])
        placed.add(cand[1])
    return order


def _best_order_dp(est: dict, norm: list, names: list[str]) -> list[str]:
    """Selinger-style DP over LEFT-DEEP connected orders:
    ``dp[frozenset] = (total_intermediate_bytes, order)``, expanding
    each subset by every edge-connected table. 2^n states with n <= 10
    is trivial compute; optimal whenever cardinalities are subset-
    determined (the NDV caps make them mildly order-dependent, so
    :func:`suggest_join_chain` evaluates the DP order AGAINST the
    greedy one and keeps the cheaper — never worse than greedy by
    construction). The greedy's failure mode this removes: seeding
    with a locally tiny pair that forces a huge intermediate later.
    Ties break on the order tuple for determinism."""
    adj: dict = {}
    for a, b, keys in norm:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dp: dict = {}
    for a, b, _ in norm:
        # the first join's cost is direction-symmetric, so seed only
        # the big-side-first orientation: the ATTACHED (second) table
        # is the broadcast candidate, and that should be the small one
        big, small = (
            (a, b)
            if (est[a]["bytes"], a) >= (est[b]["bytes"], b)
            else (b, a)
        )
        order = [big, small]
        cost = _order_cost(est, norm, order)["total_intermediate_bytes"]
        key = frozenset(order)
        if key not in dp or (cost, order) < dp[key]:
            dp[key] = (cost, order)
    for size in range(2, len(names)):
        nxt_dp: dict = {}
        for key, (cost, order) in dp.items():
            if len(key) != size:
                continue
            reachable = set().union(*(adj.get(t, set()) for t in key)) - key
            for t in reachable:
                new_order = order + [t]
                new_cost = _order_cost(est, norm, new_order)[
                    "total_intermediate_bytes"
                ]
                nk = frozenset(new_order)
                if nk not in nxt_dp or (new_cost, new_order) < nxt_dp[nk]:
                    nxt_dp[nk] = (new_cost, new_order)
        dp.update(nxt_dp)
    full = dp.get(frozenset(names))
    if full is None:
        placed = max((k for k in dp), key=len, default=frozenset())
        raise ValueError(
            "snaptable: join graph is disconnected — nothing joins "
            f"{sorted(set(names) - placed)} to {sorted(placed)}"
        )
    return full[1]


def suggest_join_chain(
    spark: SparkSession,
    tables: dict,
    edges: list,
    broadcast_threshold: int = 32 << 20,
    filters: dict | None = None,
) -> dict:
    """Statistics-driven ORDER + strategy for a 3+-table join chain
    (the facts-alias-dim shape; VERDICT r9 item 6). ``tables`` maps
    name -> snaptable path; ``edges`` lists (name_a, name_b, key_cols)
    equi-joins on same-named columns. Order search: up to
    ``_DP_MAX_TABLES`` tables, a Selinger-style left-deep DP over
    connected subsets, checked against (and never worse than) the
    greedy smallest-intermediate-first order; past that, greedy only —
    cardinalities from the System-R containment estimate over ANALYZE
    HLL NDVs (manifest row counts + file bytes when unanalyzed). Each step carries a broadcast decision for the
    attached table (manifest bytes vs threshold — authoritative where
    Spark's scan estimate is inflated by DVs or pre-filter widths).
    ``filters`` maps table name -> a SQL predicate applied to that
    table's read: simple clauses (``col = lit``, comparisons, BETWEEN,
    AND-conjunctions) scale the table's row/byte/NDV estimates via
    ANALYZE statistics — an equality on a 1000-NDV column shrinks the
    side 1000x, often flipping it to the broadcast/seed position
    (Spark's own scan estimate cannot see this before the scan);
    unrecognized clause shapes contribute selectivity 1.0, never
    shrinking an estimate. Returns the plan with its inputs plus the
    NAIVE (given-order) cost for comparison; advisory —
    :func:`join_chain` applies it."""
    if len(tables) < 2:
        raise ValueError("snaptable: join chain needs >= 2 tables")
    if not edges:
        raise ValueError("snaptable: join chain needs >= 1 edge")
    for name in filters or ():
        if name not in tables:
            raise ValueError(
                f"snaptable: filter names unknown table {name!r}"
            )
    norm = []
    for a, b, keys in edges:
        if a not in tables or b not in tables:
            raise ValueError(f"snaptable: edge ({a}, {b}) names unknown table")
        norm.append((a, b, [keys] if isinstance(keys, str) else list(keys)))
    est = _chain_estimates(spark, tables)
    _apply_filter_estimates(est, filters)
    order, planner = _best_order_greedy(est, norm, tables), "greedy"
    if len(tables) <= _DP_MAX_TABLES:
        # the DP dominates in practice, but its subset-dominance is
        # only exact when cardinalities are subset-determined (the NDV
        # caps make them mildly order-dependent) — evaluating both and
        # keeping the cheaper makes "never worse than greedy" a
        # construction, not a hope
        dp_order = _best_order_dp(est, norm, list(tables))
        key = "total_intermediate_bytes"
        if (
            _order_cost(est, norm, dp_order)[key]
            <= _order_cost(est, norm, order)[key]
        ):
            order, planner = dp_order, "dp"
    plan = _order_cost(est, norm, order)
    plan["planner"] = planner
    for s in plan["steps"]:
        s["broadcast"] = est[s["table"]]["bytes"] <= broadcast_threshold
    naive = None
    given = list(tables)
    if given != order:
        try:
            naive = _order_cost(est, norm, given)
        except ValueError:
            pass  # the given order isn't even connected
    return {
        **plan,
        "tables": {
            n: {k: v for k, v in e.items() if k not in ("ndv", "bounds")}
            for n, e in est.items()
        },
        "threshold_bytes": broadcast_threshold,
        "naive_order_cost": naive,
    }


def join_chain(
    spark: SparkSession,
    tables: dict,
    edges: list,
    how: str = "inner",
    broadcast_threshold: int = 32 << 20,
    filters: dict | None = None,
) -> DataFrame:
    """Join 3+ snaptables in the statistics-chosen order from
    :func:`suggest_join_chain`, with broadcast hints applied per step.
    Equi-joins on same-named key columns (one surviving copy per key,
    Spark USING semantics), so downstream edges can join on a key
    either original side carried. ``filters`` predicates are applied
    to their tables' reads in FULL (the estimator only ever uses them
    to plan — an unparseable clause costs estimate quality, never
    correctness)."""
    from pyspark.sql import functions as F

    plan = suggest_join_chain(
        spark, tables, edges, broadcast_threshold, filters=filters
    )

    def _side(name: str) -> DataFrame:
        df = read(spark, tables[name])
        pred = (filters or {}).get(name)
        return df.filter(pred) if pred else df

    df = _side(plan["order"][0])
    for s in plan["steps"]:
        right = _side(s["table"])
        if s["broadcast"]:
            right = F.broadcast(right)
        df = df.join(right, s["on"], how)
    return df


def table_statistics(spark: SparkSession, path: str) -> dict | None:
    """The last :func:`analyze_table` snapshot (None if never analyzed),
    with ``stale`` set when commits landed since."""
    import os

    p = os.path.join(path, _ANALYZE_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        stats = json.load(f)
    head = _manifest(spark, path, None)["version"]
    stats["stale"] = head > stats.get("at_version", 0)
    return stats


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
    it = fs.listFiles(data_root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
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
        if now - st.getModificationTime() / 1000.0 < min_age_sec:
            continue  # possibly an in-flight writer's uncommitted files
        if dry_run:
            deleted += 1
        elif fs.delete(p, False):
            deleted += 1
    return deleted
