"""Spark 4 Python DataSource over the snapshot-manifest table: the
standard `spark.read.format("snaptable")` / `spark.readStream.format
("snaptable")` surface, so ANY Spark consumer — including one that
knows nothing about this repo — can batch-read a snapshot or tail the
table as a Structured Streaming source with exactly-once,
version-based offsets (the Delta streaming-source analog, built on
the public `pyspark.sql.datasource` API, SPARK-44076).

Positioning vs the native reader: `snaptable.read()/scan()` remain
the FAST path — they plan a JVM FileScan (whole-stage codegen,
vectorized parquet, pushdown). This source funnels bytes through
Python/Arrow per partition, which is the documented cost of the
interop surface; its real value is the STREAMING contract, where each
micro-batch moves only the appended files of a version range:

- offsets are manifest versions (``{"version": N}``); a restart
  resumes from the checkpointed version — exactly-once consumption of
  every appended row, no rescans;
- per micro-batch, ``partitions(start, end)`` walks versions
  ``(start, end]``: append/create commits contribute one
  InputPartition per ADDED file (O(batch), never O(table));
  row-preserving maintenance (compact / optimize / bloom / purge)
  contributes nothing — layout hygiene is invisible to the stream;
- a row-CHANGING rewrite in the range (delete/merge/overwrite/
  rollback) fails the stream loudly by default, exactly like Delta's
  streaming source; ``skipChangeCommits=true`` opts into skipping
  those commits entirely (Delta's semantics for the same flag).

Everything here is session-free on the driver (plain JSON manifest
reads) and pyarrow-based on executors (local filesystem in this
sandbox; at cluster scale the same code runs over any
pyarrow-supported filesystem).

Reference behaviors mirrored: the reference's incremental fetch +
background refresh loop (its scheduler re-reads only new data per
poll) — re-expressed as a first-class Spark streaming source instead
of an application-level cursor.
"""

from __future__ import annotations

import json
import os
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_SNAPDIR = "_snapshots"
# commits the STREAM skips because they change no rows: layout
# maintenance plus metadata-only constraint and partition-spec
# commits (schema evolution deliberately NOT here — a schema change
# must fail a running stream, Delta semantics; a partition-spec change
# alters neither rows nor schema, only future write layout)
_ROW_PRESERVING_PREFIXES = (
    "optimize:", "bloom:", "constraint:", "partition-spec:"
)
_ROW_PRESERVING = ("compact", "purge")


# ---------------------------------------------------------------------------
# Session-free manifest access (driver side; plain file IO — the
# datasource API gives no SparkSession on the driver).
# ---------------------------------------------------------------------------


def _versions(path: str) -> list[int]:
    snapdir = os.path.join(path, _SNAPDIR)
    if not os.path.isdir(snapdir):
        return []
    out = []
    for name in os.listdir(snapdir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _raw_manifest(path: str, version: int) -> dict:
    """Version JSON as-is: parts NOT materialized (the manifest-list
    head is tiny; loading parts is the expensive half a pruned read
    can skip)."""
    fpath = os.path.join(path, _SNAPDIR, f"v{version:012d}.json")
    with open(fpath, "r", encoding="utf-8") as f:
        m = json.load(f)
    m["version"] = version
    return m


#: Parsed parts, LRU by absolute ref — the session-free mirror of
#: snaptable._PARTS_CACHE (parts are immutable uuid-named files, so a
#: parse is valid for the life of this planning worker; consumers
#: treat entries as read-only). Budget counted in entries.
_PARTS_CACHE: "OrderedDict[str, list[dict]]" = OrderedDict()
_PARTS_CACHE_BUDGET = 2_000_000
_parts_cache_total = 0


def _load_parts(path: str, refs) -> list[dict]:
    global _parts_cache_total
    files: list[dict] = []
    for ref in refs:
        key = os.path.join(path, _SNAPDIR, ref)
        chunk = _PARTS_CACHE.get(key)
        if chunk is not None:
            _PARTS_CACHE.move_to_end(key)
        else:
            with open(key, "r", encoding="utf-8") as pf:
                chunk = json.load(pf)["entries"]
            _PARTS_CACHE[key] = chunk
            _parts_cache_total += len(chunk)
            while (
                _parts_cache_total > _PARTS_CACHE_BUDGET
                and len(_PARTS_CACHE) > 1
            ):
                _, dropped = _PARTS_CACHE.popitem(last=False)
                _parts_cache_total -= len(dropped)
        files.extend(chunk)
    return files


def _manifest(path: str, version: int) -> dict:
    m = _raw_manifest(path, version)
    if "files" not in m:
        # manifest-list form (snaptable._SPLIT_THRESHOLD exceeded):
        # materialize the referenced parts — session-free local reads,
        # same dict shape as the inline form afterwards.
        m["files"] = _load_parts(
            path, [p["ref"] for p in m.get("files_parts", [])]
        )
    return m


def _head_version(path: str) -> int:
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"snaptable source: no snapshots at {path}")
    return vs[-1]


def _ekey(e: dict) -> tuple:
    return (e.get("x"), e["path"], tuple(e.get("dv", ())))


def _entry_ext(m: dict, e: dict) -> tuple:
    """(external root, prefixed DV key) for a shallow-clone entry
    (``x`` index into ``tbl_meta.ext_roots`` — snaptable._erel's
    contract); (None, None) for local entries."""
    x = e.get("x")
    if x is None:
        return None, None
    roots = (m.get("tbl_meta") or {}).get("ext_roots", [])
    return roots[x].rstrip("/"), f"x{x}:{e['path']}"


# ---------------------------------------------------------------------------
# Executor-side file read: one parquet file -> arrow batches conformed
# to the table schema (partition constants attached, deletion vectors
# applied by physical row position).
# ---------------------------------------------------------------------------


@dataclass
class SnapFilePartition(InputPartition):
    rel: str
    partition: dict = field(default_factory=dict)
    dv: tuple = ()
    # shallow-clone external reference: the file lives under `root`
    # (not the table root) and its DV-sidecar coordinate is `dvkey`
    # (the x{i}:-prefixed rel) instead of the bare rel
    root: str | None = None
    dvkey: str | None = None
    # change-feed streaming: tag every row of this partition
    change_type: str | None = None
    commit_version: int | None = None
    # when set, `rel` is a cdf sidecar DIR (rows already tagged)
    is_cdf_sidecar: bool = False


def _dv_positions(root: str, rel: str, dv_refs) -> set[int]:
    """Deleted physical positions for one file: union of its sidecars'
    rows filtered to this file's scan-rendered rel path (the sidecar
    stores the URI-encoded rendering; compare both forms)."""
    import pyarrow.parquet as pq
    from urllib.parse import unquote

    out: set[int] = set()
    for ref in dv_refs:
        t = pq.read_table(os.path.join(root, ref), columns=["path", "pos"])
        for p, pos in zip(
            t.column("path").to_pylist(), t.column("pos").to_pylist()
        ):
            if p == rel or unquote(p) == rel or p == rel.replace("%", "%25"):
                out.add(pos)
    return out


def _cmap_cands(colmap: dict, name: str) -> list:
    """Candidate file-side names for a logical column: itself plus its
    prior generation names (``colmap`` values are a single physical
    name or the full chain list from ``_name_chain``)."""
    v = colmap.get(name)
    return [name] + ([v] if isinstance(v, str) else list(v or ()))


def _conform_table(tbl, target, consts: dict, colmap: dict | None = None):
    """Project an arrow table onto ``target``: present columns cast
    (renamed columns resolve through ``colmap`` — pre-rename files
    carry the name of their era), ``consts`` (partition values,
    change-feed tags) become constant arrays, anything else typed
    NULLs."""
    import pyarrow as pa

    colmap = colmap or {}
    rows = tbl.num_rows
    cols = []
    for f in target:
        src = next(
            (
                c
                for c in _cmap_cands(colmap, f.name)
                if c in tbl.column_names
            ),
            None,
        )
        if src is not None:
            cols.append(tbl.column(src).cast(f.type))
        elif f.name in consts and consts[f.name] is not None:
            v = consts[f.name]
            src_type = pa.string() if isinstance(v, str) else None
            arr = pa.array([v] * rows, type=src_type)
            cols.append(arr.cast(f.type))
        else:
            cols.append(pa.nulls(rows, type=f.type))
    return pa.Table.from_arrays(cols, schema=target)


def _read_entry(
    root: str,
    part: SnapFilePartition,
    schema: StructType,
    colmap: dict | None = None,
) -> Iterator:
    """Arrow batches for one manifest entry, conformed to ``schema``:
    missing columns (pre-evolution files, Hive partition columns,
    change-feed tags) surface as typed constants/NULLs; deletion
    vectors drop rows by physical position (running row index over
    the file's batches — the same coordinate `_metadata.row_index`
    uses). A ``is_cdf_sidecar`` partition reads a whole change-sidecar
    dir whose rows already carry ``_change_type``."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    colmap = colmap or {}
    consts: dict = dict(part.partition)
    consts["_change_type"] = part.change_type
    consts["_commit_version"] = part.commit_version
    if part.is_cdf_sidecar:
        tbl = pq.read_table(os.path.join(root, part.rel))
        yield from _conform_table(tbl, target, consts, colmap).to_batches()
        return
    # DV sidecars always live under the TABLE root; the data file may
    # live under a shallow-clone external root, keyed by its prefixed
    # rel in the sidecar coordinates
    dead = (
        _dv_positions(root, part.dvkey or part.rel, part.dv)
        if part.dv
        else set()
    )
    pf = pq.ParquetFile(os.path.join(part.root or root, part.rel))
    offset = 0
    have = set(pf.schema_arrow.names)
    read_cols = sorted(
        {
            next(c for c in _cmap_cands(colmap, f.name) if c in have)
            for f in target
            if any(c in have for c in _cmap_cands(colmap, f.name))
        }
    )
    for batch in pf.iter_batches(columns=read_cols):
        n = batch.num_rows
        tbl = pa.Table.from_batches([batch])
        if dead:
            alive = [i for i in range(n) if (offset + i) not in dead]
            tbl = tbl.take(pa.array(alive, type=pa.int64()))
        offset += n
        yield from _conform_table(tbl, target, consts, colmap).to_batches()


# ---------------------------------------------------------------------------
# The DataSource.
# ---------------------------------------------------------------------------


class SnaptableDataSource(DataSource):
    """``format("snaptable")``: batch reads a snapshot (``version``
    option time-travels), streaming tails appends with version
    offsets. ``path`` is the table root (``.load(path)`` or
    ``option("path", ...)``).

    File pruning is driven by LOAD OPTIONS (``filter.eq``,
    ``filter.between`` — see
    :meth:`SnapBatchReader._parse_filter_options`), NOT by a
    ``pushFilters`` implementation: Spark 4.1.2 caches the planned
    partitions per relation and reuses them for later filter-free
    queries on the same DataFrame, so pushFilters-based pruning
    silently drops rows there. Options are part of the relation's
    identity, so option-pruned reads are cache-safe AND exact (the
    predicates are re-applied per row at read time)."""

    @classmethod
    def name(cls) -> str:
        return "snaptable"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError(
                "snaptable source: a table path is required "
                "(.load(path) or .option('path', ...))"
            )
        return p.rstrip("/")

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readChangeFeed", "false")).lower() == "true"
        )

    def schema(self) -> StructType:
        from pyspark.sql.types import IntegerType, StringType, StructField

        path = self._path()
        v = self.options.get("version")
        ts = self.options.get("timestampAsOf")
        if v is not None:
            ver = int(v)
        elif ts is not None:
            # time travel must also pin the SCHEMA of that instant —
            # reading a pre-evolution version under the head schema
            # would invent NULL columns the snapshot never had
            ver = _version_at(path, ts)
        else:
            ver = _head_version(path)
        m = _manifest(path, ver)
        schema = StructType.fromJson(json.loads(m["schema"]))
        if self._cdf():
            schema = StructType(
                list(schema.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", IntegerType()),
                ]
            )
        return schema

    def reader(self, schema: StructType) -> "SnapBatchReader":
        return SnapBatchReader(self._path(), self.options, schema)

    def streamReader(self, schema: StructType) -> "SnapStreamReader":
        return SnapStreamReader(self._path(), self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "SnapBatchWriter":
        return SnapBatchWriter(self._path(), self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "SnapStreamWriter":
        return SnapStreamWriter(self._path(), self.options, schema)


def _version_at(path: str, as_of, before: bool = False) -> int:
    """Session-free TIMESTAMP AS OF resolution: latest version with
    ``committed_at <= as_of`` (same semantics as snaptable.version_at
    — whole-second commit times, ties to the highest version).
    ``before=True`` uses a strict ``<`` instead — the base for Delta's
    startingTimestamp, where a commit AT the instant must stream."""
    import datetime as _dt

    try:
        ts = float(as_of)  # options arrive as strings: epoch seconds
    except (TypeError, ValueError):
        s = str(as_of).replace("T", " ")
        fmt = "%Y-%m-%d %H:%M:%S" if " " in s else "%Y-%m-%d"
        ts = (
            _dt.datetime.strptime(s, fmt)
            .replace(tzinfo=_dt.timezone.utc)
            .timestamp()
        )
    best = None
    for v in _versions(path):
        fpath = os.path.join(path, _SNAPDIR, f"v{v:012d}.json")
        try:
            with open(fpath, "r", encoding="utf-8") as f:
                m = json.load(f)
        except FileNotFoundError:
            continue  # a concurrent vacuum dropped it between list/open
        c = m.get("committed_at", 0)
        if (c < ts) if before else (c <= ts):
            best = v
    if best is None:
        raise FileNotFoundError(
            f"snaptable source: no retained version at {path} committed "
            f"at or before {as_of!r}"
        )
    return best


class SnapBatchReader(DataSourceReader):
    def __init__(self, path: str, options, schema: StructType):
        self.path = path
        self.schema = schema
        v = options.get("version")
        ts = options.get("timestampAsOf")
        if v is not None and ts is not None:
            raise ValueError(
                "snaptable source: pass option 'version' OR "
                "'timestampAsOf', not both"
            )
        if v is not None:
            self.version = int(v)
        elif ts is not None:
            self.version = _version_at(path, ts)
        else:
            # pin the head ONCE: every later planner call must see the
            # same snapshot, or a commit landing between two calls
            # skews the probe against a different file set
            self.version = _head_version(path)
        self._parse_filter_options(options)
        from sec_financial_pipeline_spark.sources.snaptable import (
            _name_chain,
        )

        # logical -> prior generation names for renamed columns (rides
        # the pickled reader to the executors; read() consults it per
        # file — the full chain, so files appended between chained
        # renames resolve too)
        self._cmap = _name_chain(_raw_manifest(self.path, self.version))

    def _parse_filter_options(self, options) -> None:
        """Load-time predicate options — the CACHE-SAFE replacement for
        ``pushFilters`` pruning.

        Spark 4.1.2's Python DataSource bridge caches the planned
        (partitions, read function) per relation on the JVM side
        (``PythonDataSourceV2.readInfo``: ``getOrCreateReadInfo``
        returns any cached value; only the filtered ``pushFilters``
        path overwrites it via ``setReadInfo``). A ``pushFilters``
        implementation that prunes files therefore poisons the cache:
        a LATER filter-free query on the same loaded DataFrame reuses
        the previous query's pruned partition list and silently drops
        rows (observed: ``df.filter(..).count()`` then ``df.agg(sum)``
        lost every file outside the first query's probe). No
        reader-side discipline can fix that — the filter-free query
        never re-enters Python — so this source does NOT implement
        ``pushFilters`` at all. Predicates that should prune belong in
        the LOAD OPTIONS, which are part of the relation's identity
        (each ``load()`` builds its own relation and cache entry):

        - ``filter.eq``: JSON object ``{col: value}`` — equality,
          ANDed; prunes via partition dirs / stats / Bloom sidecars
          and is applied EXACTLY per row at read time;
        - ``filter.between``: JSON list of ``[col, lo, hi]`` triples
          (``null`` bound = unbounded), ANDed; prunes via footer
          min/max and is applied exactly per row.

        Semantics: the relation IS the filtered table (rows satisfying
        every option predicate; NULL never satisfies), same as the
        native ``snaptable.scan()``, so reusing the DataFrame across
        filtered and unfiltered downstream queries is always correct.
        """
        eq = json.loads(options.get("filter.eq", "{}") or "{}")
        bt = json.loads(options.get("filter.between", "[]") or "[]")
        if not isinstance(eq, dict) or not isinstance(bt, list):
            raise ValueError(
                "snaptable source: filter.eq must be a JSON object and "
                "filter.between a JSON list of [col, lo, hi] triples"
            )
        self._eq: dict = dict(eq)
        self._between: list = []
        for t in bt:
            if not (isinstance(t, list) and len(t) == 3):
                raise ValueError(
                    "snaptable source: filter.between entries must be "
                    "[col, lo, hi] (null bound = unbounded)"
                )
            self._between.append((str(t[0]), t[1], t[2]))
        # manifest-prune shapes (None bounds -> infinities); equality
        # probes double as point probes for the Bloom sidecars and as
        # degenerate ranges for numeric stats. Partition-DIR pruning
        # compares str(probe) against the lifted dir string, so only
        # values whose Python str() matches Spark's dir rendering may
        # participate: str/int pass through, booleans map to Spark's
        # lowercase dirs, floats are EXCLUDED (str(42.0)='42.0' never
        # equals a bigint dir '42' — pruning on it would silently drop
        # matching files; the stats range + exact per-row re-check
        # still apply to them).
        self._part_probe = {}
        for c, v in self._eq.items():
            if isinstance(v, bool):
                self._part_probe[c] = "true" if v else "false"
            elif isinstance(v, (str, int)):
                self._part_probe[c] = v
        self._ranges = [
            (c, float("-inf") if lo is None else lo,
             float("inf") if hi is None else hi)
            for c, lo, hi in self._between
        ]
        self._ranges += [
            (c, v, v)
            for c, v in self._eq.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        ]
        self._points = list(self._eq.items())

    def _ver(self) -> int:
        return (
            self.version
            if self.version is not None
            else _head_version(self.path)
        )

    def _m(self) -> dict:
        return _manifest(self.path, self._ver())

    def partitions(self) -> Sequence[InputPartition]:
        from sec_financial_pipeline_spark.sources.snaptable import (
            _bloom_rules_out,
            _prune_part_summaries,
            _select_entries,
        )

        m = _raw_manifest(self.path, self._ver())
        if "files" not in m:
            # manifest-list fast path, mirrored from the native scan:
            # prune parts by summary with the option predicates BEFORE
            # loading any; _select_entries then re-checks per entry
            kept = _prune_part_summaries(
                m.get("files_parts", []),
                self._part_probe or None,
                self._ranges or [],
            )
            m["files"] = _load_parts(self.path, [p["ref"] for p in kept])
        entries = _select_entries(
            m,
            self._part_probe or None,
            self._ranges or None,
        )
        for col, v in self._points:
            entries = [e for e in entries if not _bloom_rules_out(e, col, v)]
        out = []
        for e in entries:
            xroot, dvkey = _entry_ext(m, e)
            out.append(
                SnapFilePartition(
                    rel=e["path"],
                    partition=e.get("partition", {}),
                    dv=tuple(e.get("dv", ())),
                    root=xroot,
                    dvkey=dvkey,
                )
            )
        return out

    def read(self, partition: SnapFilePartition) -> Iterator:
        # option predicates are EXACT relation semantics, not best-
        # effort pruning: re-check them per row so a file kept only
        # because it lacked stats still returns exactly matching rows
        eq = getattr(self, "_eq", {}) or {}
        bt = getattr(self, "_between", []) or []
        for batch in _read_entry(
            self.path, partition, self.schema, getattr(self, "_cmap", None)
        ):
            if eq or bt:
                out = _row_filter(batch, eq, bt)
                if out.num_rows:
                    yield from out.combine_chunks().to_batches()
            else:
                yield batch


def _row_filter(batch, eq: dict, between: list):
    """Apply the load-option predicates exactly: AND of equalities and
    [lo, hi] ranges (``None`` bound = unbounded); a NULL value never
    satisfies a predicate (SQL semantics — the null mask positions are
    dropped)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tbl = pa.Table.from_batches([batch])
    mask = None
    for col, v in eq.items():
        m = pc.equal(tbl.column(col), pa.scalar(v).cast(tbl.column(col).type))
        mask = m if mask is None else pc.and_kleene(mask, m)
    for col, lo, hi in between:
        c = tbl.column(col)
        if lo is not None:
            m = pc.greater_equal(c, pa.scalar(lo).cast(c.type))
            mask = m if mask is None else pc.and_kleene(mask, m)
        if hi is not None:
            m = pc.less_equal(c, pa.scalar(hi).cast(c.type))
            mask = m if mask is None else pc.and_kleene(mask, m)
    if mask is None:
        return tbl
    return tbl.filter(mask)  # null mask positions drop (SQL semantics)


class SnapStreamReader(DataSourceStreamReader):
    """Micro-batch source: offset = last fully-consumed manifest
    version. Each batch ships the files ADDED by the append/create
    commits in ``(start, end]``; maintenance commits contribute
    nothing; row-changing rewrites fail the stream unless
    ``skipChangeCommits=true`` (Delta's flag, Delta's semantics)."""

    def __init__(self, path: str, options, schema: StructType):
        self.path = path
        self.schema = schema
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.read_cdf = (
            str(options.get("readChangeFeed", "false")).lower() == "true"
        )
        mv = options.get("maxVersionsPerTrigger")
        self.max_versions = int(mv) if mv is not None else None
        self._committed: int | None = None
        sv = options.get("startingVersion")
        st = options.get("startingTimestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "snaptable source: pass option 'startingVersion' OR "
                "'startingTimestamp', not both"
            )
        # startingVersion=latest: consume only commits AFTER stream
        # start; an integer N: start from version N (inclusive);
        # startingTimestamp: start from the first commit strictly
        # AFTER the version current at that instant (Delta semantics)
        if st is not None:
            try:
                self._start = _version_at(path, st, before=True)
            except FileNotFoundError:
                self._start = 0  # instant predates all history: all of it
        elif sv is None:
            self._start = 0
        elif str(sv).lower() == "latest":
            self._start = _head_version(path)
        else:
            self._start = max(0, int(sv) - 1)

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        """Head version, optionally capped to ``maxVersionsPerTrigger``
        versions past the last committed offset (Delta's
        maxFilesPerTrigger discipline, at version granularity) so a
        backfill over a long history proceeds in bounded micro-batches
        instead of one giant batch. The first trigger after a RESTART
        is uncapped (the reader only learns its position from commit()
        calls); every subsequent trigger is bounded."""
        head = _head_version(self.path)
        if self.max_versions is None or self._committed is None:
            # first trigger (incl. after restart): the reader does not
            # know the checkpointed position, and capping relative to
            # startingVersion could place latest BELOW the restart
            # offset — a permanent stall. Uncapped once; bounded after.
            return {"version": head}
        return {"version": min(head, self._committed + self.max_versions)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[InputPartition] = []
        prev_keys: set | None = None
        for v in range(lo + 1, hi + 1):
            m = _manifest(self.path, v)
            op = m.get("op", "")
            if (
                op in _ROW_PRESERVING
                or op.startswith(_ROW_PRESERVING_PREFIXES)
            ):
                prev_keys = {_ekey(e) for e in m["files"]}
                continue
            if op not in ("create", "append") and not (
                v == 1 and op.startswith("clone:")
            ):
                if op.startswith("evolve:"):
                    raise ValueError(
                        f"snaptable source: version {v} at {self.path} "
                        f"evolved the table schema ({op!r}); restart the "
                        f"stream to pick up the new schema (schema changes "
                        f"fail a running stream by design — Delta "
                        f"semantics; skipChangeCommits does not apply)"
                    )
                if self.read_cdf and m.get("cdf"):
                    # change-feed mode: the DML's persisted sidecar IS
                    # the batch (rows already tagged _change_type)
                    parts.append(
                        SnapFilePartition(
                            rel=m["cdf"],
                            commit_version=v,
                            is_cdf_sidecar=True,
                        )
                    )
                    prev_keys = {_ekey(e) for e in m["files"]}
                    continue
                if self.skip_change:
                    prev_keys = {_ekey(e) for e in m["files"]}
                    continue
                raise ValueError(
                    f"snaptable source: version {v} at {self.path} is a "
                    f"row-changing rewrite ({op!r}) "
                    + (
                        "committed WITHOUT a change sidecar; re-run the DML "
                        "with cdf=True for streaming change feeds, or use "
                        "snaptable.change_feed/table_changes for batch "
                        "diffs"
                        if self.read_cdf
                        else "; a streaming read tails APPENDS only — set "
                        "skipChangeCommits=true to skip such commits "
                        "(Delta semantics), set readChangeFeed=true to "
                        "stream persisted change sidecars, or consume "
                        "the change feed via snaptable.table_changes "
                        "instead"
                    )
                )
            if prev_keys is None:
                prev_keys = (
                    {_ekey(e) for e in _manifest(self.path, v - 1)["files"]}
                    if v > 1
                    else set()
                )
            for e in m["files"]:
                if _ekey(e) not in prev_keys:
                    xroot, dvkey = _entry_ext(m, e)
                    parts.append(
                        SnapFilePartition(
                            rel=e["path"],
                            partition=e.get("partition", {}),
                            dv=tuple(e.get("dv", ())),
                            root=xroot,
                            dvkey=dvkey,
                            change_type="insert" if self.read_cdf else None,
                            commit_version=v if self.read_cdf else None,
                        )
                    )
            prev_keys = {_ekey(e) for e in m["files"]}
        return parts

    def read(self, partition: SnapFilePartition) -> Iterator:
        yield from _read_entry(self.path, partition, self.schema)

    def commit(self, end: dict) -> None:
        # offsets are durable in the query checkpoint; remembering the
        # committed position here only drives the rate-limit cap
        self._committed = int(end["version"])


# ---------------------------------------------------------------------------
# Writers: df.write.format("snaptable") and writeStream.format
# ("snaptable") with exactly-once epoch transactions. Everything is
# session-free — the datasource driver-side hooks (commit/abort) run in
# a Python worker with no JVM session, so the manifest commit protocol
# is replicated over plain file IO (POSIX O_CREAT|O_EXCL gives the same
# kernel-atomic version-create the JVM path uses on local filesystems).
# The JVM-backed SnaptableSink (streaming/sinks.py) remains the fast
# path and the one that enforces CHECK constraints; this writer REFUSES
# constrained tables loudly rather than skipping enforcement.
# ---------------------------------------------------------------------------


@dataclass
class SnapWriteMessage(WriterCommitMessage):
    rel: str | None
    base: str | None
    rows: int
    stats: dict


def _arrow_stats(tbl) -> dict:
    """min/max per primitive column from the in-memory batch — the
    manifest skip-stats the JVM path gets from parquet footers. A
    column that is all-null (or non-primitive) records nothing
    (unknown = keep)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = {}
    for i, f in enumerate(tbl.schema):
        if not (
            pa.types.is_integer(f.type)
            or pa.types.is_floating(f.type)
            or pa.types.is_string(f.type)
            or pa.types.is_large_string(f.type)
        ):
            continue
        col = tbl.column(i)
        if col.null_count == len(col):
            continue
        mm = pc.min_max(col)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if mn is not None:
            out[f.name] = [mn, mx]
    return out


def _write_task(path: str, schema: StructType, iterator) -> SnapWriteMessage:
    """Executor half: drain this partition's rows into one parquet
    file inside its own fresh commit dir, FLUSHING A ROW GROUP every
    64k rows so a large partition never sits whole in Python lists.
    Files become table data ONLY if the driver commit publishes a
    manifest referencing them — uncommitted files are crash orphans
    that vacuum reaps."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    n_cols = len(schema.fields)
    base = f"data/c-{_uuid.uuid4().hex[:12]}"
    rel = f"{base}/part-0.parquet"
    chunk = 65536
    writer = None
    stats: dict = {}
    cols: list[list] = [[] for _ in range(n_cols)]
    n = buffered = 0

    def _flush():
        nonlocal writer, buffered, stats
        if not buffered:
            return
        tbl = pa.Table.from_arrays(
            [
                pa.array(cols[i], type=target.field(i).type)
                for i in range(n_cols)
            ],
            schema=target,
        )
        if writer is None:
            os.makedirs(os.path.join(path, base), exist_ok=True)
            writer = pq.ParquetWriter(os.path.join(path, rel), target)
        writer.write_table(tbl)
        for name, (mn, mx) in _arrow_stats(tbl).items():
            if name in stats:
                stats[name] = [min(stats[name][0], mn), max(stats[name][1], mx)]
            else:
                stats[name] = [mn, mx]
        for c in cols:
            c.clear()
        buffered = 0

    for row in iterator:
        for i in range(n_cols):
            cols[i].append(row[i])
        n += 1
        buffered += 1
        if buffered >= chunk:
            _flush()
    _flush()
    if writer is None:
        return SnapWriteMessage(rel=None, base=None, rows=0, stats={})
    writer.close()
    return SnapWriteMessage(rel=rel, base=base, rows=n, stats=stats)


def _schema_guard(head: dict, schema: StructType, op: str) -> None:
    have = {
        (f["name"], json.dumps(f["type"], sort_keys=True))
        for f in json.loads(head["schema"])["fields"]
    }
    want = {
        (f["name"], json.dumps(f["type"], sort_keys=True))
        for f in json.loads(schema.json())["fields"]
    }
    if have != want:
        raise ValueError(
            f"snaptable writer: {op} schema mismatch — table has "
            f"{sorted(n for n, _ in have)}, incoming "
            f"{sorted(n for n, _ in want)} (or a type differs)"
        )


def _commit_files(
    path: str,
    schema: StructType,
    messages,
    op: str,
    txn: tuple | None,
    overwrite: bool = False,
    retries: int = 20,
    split_threshold: int | None = None,
) -> int:
    """Driver half, session-free: publish the tasks' files as one
    atomic version — bootstrap-create on an empty path, append (or
    full replace for overwrite) otherwise; ``txn=(app_id, epoch)``
    makes replays no-ops (the staged files orphan; vacuum reaps). The
    version file is created with O_CREAT|O_EXCL, the same
    kernel-atomic race the JVM path uses locally."""
    new_files = sorted(
        (
            {"path": m.rel, "base": m.base, "partition": {},
             "stats": m.stats, "rows": m.rows}
            for m in messages
            if m is not None and m.rel is not None
        ),
        key=lambda e: e["path"],
    )
    os.makedirs(os.path.join(path, _SNAPDIR), exist_ok=True)
    for _ in range(retries):
        vs = _versions(path)
        if not vs:
            head = None
            version, files, parent = 1, new_files, None
            txn_map = {}
        else:
            head = _manifest(path, vs[-1])
            if head.get("constraints"):
                raise ValueError(
                    f"snaptable writer: table at {path} has CHECK "
                    f"constraints {sorted(head['constraints'])} — the "
                    f"session-free datasource writer cannot evaluate SQL "
                    f"constraints; write through snaptable.append / "
                    f"SnaptableSink instead"
                )
            if head.get("partition_cols"):
                raise ValueError(
                    f"snaptable writer: partitioned tables are not "
                    f"supported by the datasource writer (use "
                    f"snaptable.append, which plans a Hive-layout write)"
                )
            _schema_guard(head, schema, op)
            txn_map = dict(head.get("txn", {}))
            if txn is not None:
                last = txn_map.get(str(txn[0]))
                if last is not None and int(last) >= int(txn[1]):
                    return head["version"]  # replay: already applied
            version = head["version"] + 1
            parent = head["version"]
            files = new_files if overwrite else head["files"] + new_files
        if txn is not None:
            txn_map[str(txn[0])] = int(txn[1])
        from sec_financial_pipeline_spark.sources.snaptable import (
            _PARTSSUB,
            _SPLIT_THRESHOLD,
            _split_entries,
        )

        thr = _SPLIT_THRESHOLD if split_threshold is None else split_threshold
        if len(files) > thr:
            # same manifest-list form the JVM path writes: parts first
            # (uuid names, orphaned on a lost race, vacuum reaps), then
            # the version JSON carrying only summaries.
            import uuid as _uuid

            parts_dir = os.path.join(path, _SNAPDIR, _PARTSSUB)
            os.makedirs(parts_dir, exist_ok=True)
            parts_meta = []
            for summary, chunk in _split_entries(files):
                ref = f"{_PARTSSUB}/m-{_uuid.uuid4().hex[:16]}.json"
                with open(
                    os.path.join(path, _SNAPDIR, ref), "w", encoding="utf-8"
                ) as pf:
                    json.dump({"entries": chunk}, pf)
                parts_meta.append({"ref": ref, **summary})
            files_body: dict = {"files_parts": parts_meta}
        else:
            files_body = {"files": files}
        body = json.dumps(
            {
                **files_body,
                "schema": schema.json() if head is None else head["schema"],
                "op": op if head is not None else "create",
                "parent": parent,
                "partition_cols": [],
                "stats_cols": (
                    head.get("stats_cols", []) if head is not None
                    else [f.name for f in schema.fields]
                ),
                "txn": txn_map,
                "constraints": {},
                "committed_at": int(time.time()),
            }
        ).encode("utf-8")
        target = os.path.join(path, _SNAPDIR, f"v{version:012d}.json")
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except OSError:
            continue  # lost the version race: re-resolve the head
        with os.fdopen(fd, "wb") as f:
            f.write(body)
        return version
    raise IOError(
        f"snaptable writer: lost {retries} version races at {path}"
    )


class SnapStreamWriter(DataSourceStreamWriter):
    """Exactly-once streaming sink: each epoch's files commit as ONE
    version carrying txn=(app_id, batchId); a replayed epoch is a
    no-op (its files orphan for vacuum). app_id defaults to
    'snapds-write' — set option('txnAppId', ...) when several queries
    feed one table."""

    def __init__(self, path: str, options, schema: StructType):
        self.path = path
        self.schema = schema
        self.app_id = options.get("txnAppId", "snapds-write")
        st = options.get("splitThreshold")
        self.split_threshold = int(st) if st is not None else None

    def write(self, iterator) -> SnapWriteMessage:
        return _write_task(self.path, self.schema, iterator)

    def commit(self, messages, batchId: int) -> None:
        _commit_files(
            self.path, self.schema, messages, "append",
            (self.app_id, batchId),
            split_threshold=self.split_threshold,
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.rel is not None:
                try:
                    os.remove(os.path.join(self.path, m.rel))
                except OSError:
                    pass


class SnapBatchWriter(DataSourceWriter):
    """df.write.format("snaptable").mode("append"|"overwrite"): one
    atomic version per save; overwrite replaces the whole snapshot
    (INSERT OVERWRITE semantics, old versions retained)."""

    def __init__(self, path: str, options, schema: StructType, overwrite: bool):
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        st = options.get("splitThreshold")
        self.split_threshold = int(st) if st is not None else None

    def write(self, iterator) -> SnapWriteMessage:
        return _write_task(self.path, self.schema, iterator)

    def commit(self, messages) -> None:
        _commit_files(
            self.path, self.schema, messages,
            "overwrite" if self.overwrite else "append",
            None, overwrite=self.overwrite,
            split_threshold=self.split_threshold,
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.rel is not None:
                try:
                    os.remove(os.path.join(self.path, m.rel))
                except OSError:
                    pass


def register_snaptable_source(spark) -> None:
    """Idempotently register ``format("snaptable")`` on this session.
    (No pushdown conf needed: predicate pruning rides load options —
    see :class:`SnaptableDataSource` — because Spark 4.1.2's per-
    relation plan cache makes pushFilters-based pruning unsafe.)"""
    spark.dataSource.register(SnaptableDataSource)
