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
from dataclasses import dataclass, field
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_SNAPDIR = "_snapshots"
_ROW_PRESERVING_PREFIXES = ("optimize:", "bloom:")
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


def _manifest(path: str, version: int) -> dict:
    fpath = os.path.join(path, _SNAPDIR, f"v{version:012d}.json")
    with open(fpath, "r", encoding="utf-8") as f:
        m = json.load(f)
    m["version"] = version
    return m


def _head_version(path: str) -> int:
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"snaptable source: no snapshots at {path}")
    return vs[-1]


def _ekey(e: dict) -> tuple:
    return (e["path"], tuple(e.get("dv", ())))


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


def _read_entry(
    root: str, part: SnapFilePartition, schema: StructType
) -> Iterator:
    """Arrow batches for one manifest entry, conformed to ``schema``:
    missing columns (pre-evolution files, Hive partition columns)
    surface as typed constants/NULLs; deletion vectors drop rows by
    physical position (running row index over the file's batches —
    the same coordinate `_metadata.row_index` uses)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    dead = _dv_positions(root, part.rel, part.dv) if part.dv else set()
    pf = pq.ParquetFile(os.path.join(root, part.rel))
    offset = 0
    want = [f.name for f in target]
    have = set(pf.schema_arrow.names)
    read_cols = [c for c in want if c in have]
    for batch in pf.iter_batches(columns=read_cols):
        n = batch.num_rows
        tbl = pa.Table.from_batches([batch])
        if dead:
            alive = [i for i in range(n) if (offset + i) not in dead]
            tbl = tbl.take(pa.array(alive, type=pa.int64()))
        offset += n
        rows = tbl.num_rows
        cols = []
        for f in target:
            if f.name in tbl.column_names:
                cols.append(tbl.column(f.name).cast(f.type))
            elif f.name in part.partition:
                v = part.partition[f.name]
                if v is None:
                    cols.append(pa.nulls(rows, type=f.type))
                else:
                    cols.append(
                        pa.array([v] * rows, type=pa.string()).cast(f.type)
                    )
            else:
                cols.append(pa.nulls(rows, type=f.type))
        out = pa.Table.from_arrays(cols, schema=target)
        yield from out.to_batches()


# ---------------------------------------------------------------------------
# The DataSource.
# ---------------------------------------------------------------------------


class SnaptableDataSource(DataSource):
    """``format("snaptable")``: batch reads a snapshot (``version``
    option time-travels), streaming tails appends with version
    offsets. ``path`` is the table root (``.load(path)`` or
    ``option("path", ...)``)."""

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

    def schema(self) -> StructType:
        path = self._path()
        v = self.options.get("version")
        m = _manifest(path, int(v) if v is not None else _head_version(path))
        return StructType.fromJson(json.loads(m["schema"]))

    def reader(self, schema: StructType) -> "SnapBatchReader":
        return SnapBatchReader(self._path(), self.options, schema)

    def streamReader(self, schema: StructType) -> "SnapStreamReader":
        return SnapStreamReader(self._path(), self.options, schema)


class SnapBatchReader(DataSourceReader):
    def __init__(self, path: str, options, schema: StructType):
        self.path = path
        self.schema = schema
        v = options.get("version")
        self.version = int(v) if v is not None else None

    def partitions(self) -> Sequence[InputPartition]:
        m = _manifest(
            self.path,
            self.version if self.version is not None else _head_version(self.path),
        )
        return [
            SnapFilePartition(
                rel=e["path"],
                partition=e.get("partition", {}),
                dv=tuple(e.get("dv", ())),
            )
            for e in m["files"]
        ]

    def read(self, partition: SnapFilePartition) -> Iterator:
        yield from _read_entry(self.path, partition, self.schema)


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
        sv = options.get("startingVersion")
        # startingVersion=latest: consume only commits AFTER stream
        # start; an integer N: start from version N (inclusive)
        if sv is None:
            self._start = 0
        elif str(sv).lower() == "latest":
            self._start = _head_version(path)
        else:
            self._start = max(0, int(sv) - 1)

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": _head_version(self.path)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[InputPartition] = []
        prev_keys: set | None = None
        for v in range(lo + 1, hi + 1):
            m = _manifest(self.path, v)
            op = m.get("op", "")
            if op in _ROW_PRESERVING or op.startswith(
                _ROW_PRESERVING_PREFIXES
            ):
                prev_keys = {_ekey(e) for e in m["files"]}
                continue
            if op not in ("create", "append"):
                if self.skip_change:
                    prev_keys = {_ekey(e) for e in m["files"]}
                    continue
                raise ValueError(
                    f"snaptable source: version {v} at {self.path} is a "
                    f"row-changing rewrite ({op!r}); a streaming read "
                    f"tails APPENDS only — set skipChangeCommits=true to "
                    f"skip such commits (Delta semantics), or consume the "
                    f"change feed via snaptable.table_changes instead"
                )
            if prev_keys is None:
                prev_keys = (
                    {_ekey(e) for e in _manifest(self.path, v - 1)["files"]}
                    if v > 1
                    else set()
                )
            for e in m["files"]:
                if _ekey(e) not in prev_keys:
                    parts.append(
                        SnapFilePartition(
                            rel=e["path"],
                            partition=e.get("partition", {}),
                            dv=tuple(e.get("dv", ())),
                        )
                    )
            prev_keys = {_ekey(e) for e in m["files"]}
        return parts

    def read(self, partition: SnapFilePartition) -> Iterator:
        yield from _read_entry(self.path, partition, self.schema)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the query checkpoint, not here


def register_snaptable_source(spark) -> None:
    """Idempotently register ``format("snaptable")`` on this session."""
    spark.dataSource.register(SnaptableDataSource)
