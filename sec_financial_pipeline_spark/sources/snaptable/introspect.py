"""Read-only introspection: change feeds, history, file/stat/row inspection, ANALYZE, exports.

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

from sec_financial_pipeline_spark.sources.snaptable.spec import _derived_probe
from sec_financial_pipeline_spark.sources.snaptable.manifest import (
    _df_for,
    _entry_root,
    _ext_roots,
    _manifest,
    _name_chain,
    _read_json,
    _snap_path,
    read,
    versions,
)
from sec_financial_pipeline_spark.sources.snaptable.dml import (
    _is_row_preserving,
)



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
