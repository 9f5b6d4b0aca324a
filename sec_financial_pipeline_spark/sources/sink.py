"""Sinks (SURVEY §2.1 S4/S7/S8/S9).

The reference writes one parquet file per (ticker, year[, quarter]) —
thousands of tiny files by design (``src/etl/data_manager.py:192-302``).
At 100 TB that layout is fatal (NameNode/object-store metadata pressure,
footer-read amplification). The Spark-first sink:

- partitions by the *pruning* columns only (``ticker`` would explode the
  namespace at 10k+ tickers; ``fiscal_year`` alone gives bounded
  cardinality and serves the dominant year-range predicates);
- repartitions before write so each partition directory holds a few
  well-sized files instead of one per input task;
- snappy parquet (same codec the reference uses).

Serving-edge sinks (CSV string / parquet bytes / JSON docs —
``data_service.py:188-299``) collect a *bounded, already-aggregated*
result — never raw data — mirroring the reference's API downloads.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame


def write_facts(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: tuple[str, ...] = ("fiscal_year",),
    files_per_partition: int = 4,
) -> None:
    """Partitioned snappy-parquet sink (S4) without the small-file trap."""
    (
        df.repartition(files_per_partition, *partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .option("compression", "snappy")
        .parquet(path)
    )


def overwrite_partitions(df: DataFrame, path: str, partition_cols: tuple[str, ...]) -> None:
    """Full-refresh of just the partitions present in ``df`` (T4 analog —
    reference deletes per-ticker files then rewrites,
    ``data_manager.py:393-424``). Uses dynamic partition overwrite so
    untouched partitions survive."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path-class) for ``path``'s scheme via the Hadoop FS
    API — the same calls work on file://, hdfs://, s3a://, etc., where
    ``os.rename``/``shutil.rmtree`` silently only handle local paths."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def staged_write_text(spark, path: str, text: str) -> None:
    """Two-step small-file write so no crash point leaves the file
    unreadable: (1) stage the COMPLETE new content at the ``.tmp``
    sibling, (2) overwrite the main file. A crash during (1) leaves
    the old main intact; during (2) a reader can fall back to the
    fully-staged tmp. Plain fs.create both times — no reliance on
    rename-onto-existing semantics, which differ across HDFS/local/
    object stores. What a torn state MEANS is protocol-specific, so
    readers stay at their call sites (the bm25 compact marker treats
    main-absent as "no compaction yet" because the marker precedes the
    swap; the planner feedback store adopts a healthy staged copy) —
    only the write discipline is shared."""
    fs, Path = _hadoop_fs(spark, path)

    def _write(p: str) -> None:
        out = fs.create(Path(p), True)
        out.write(bytearray(text.encode("utf-8")))
        out.close()

    _write(path + ".tmp")
    _write(path)


def _count_parquet_files(spark, path: str) -> int:
    fs, Path = _hadoop_fs(spark, path)
    it = fs.listFiles(Path(path), True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n += 1
    return n


# ---------------------------------------------------------------------------
# Single-writer lease. The swap machinery documents a single-writer
# contract; the lease makes a violation LOUD instead of silently
# interleaving renames. A lease is a marker file beside the dataset
# (``path__lock``) created atomically via the Hadoop FS API
# (create(overwrite=false) — atomic on local, HDFS, and S3A with
# conditional writes), carrying the writer pid; its mtime is the
# heartbeat. A holder that crashed stops heartbeating, so a lease older
# than ``ttl`` seconds may be broken by the next writer. Re-entrant
# within a process (compact -> swap_rewrite nests), tracked in _HELD.
# ---------------------------------------------------------------------------

import contextlib
import os as _os
import threading as _threading
import time as _time

#: lease paths currently held by THIS thread (re-entrancy guard —
#: per-THREAD, not per-process: nesting like compact -> swap_rewrite is
#: always same-thread, while two threads of one driver are two writers
#: and must contend like two processes do). Maps lock path -> the
#: acquisition token written into the marker, so release can verify
#: ownership (see writer_lease).
_HELD_LOCAL = _threading.local()


def _held() -> dict[str, str]:
    if not hasattr(_HELD_LOCAL, "paths"):
        _HELD_LOCAL.paths = {}
    return _HELD_LOCAL.paths

#: a lease whose heartbeat is older than this is presumed crashed
LEASE_TTL_SEC = 600


class WriterContention(IOError):
    """Another writer holds the dataset's lease — the single-writer
    contract the swap/append/compact machinery documents is being
    violated; back off and retry rather than interleave renames."""


def _lease_path(path: str) -> str:
    return path.rstrip("/") + "__lock"


def _local_path(p: str) -> str:
    if p.startswith("file://"):
        return p[7:]
    if p.startswith("file:"):
        return p[5:]
    return p


def atomic_create(fs, Path, target: str, body: bytes) -> bool:
    """Create-if-absent with REAL atomicity on every scheme; False when
    the target already exists. The subtlety this wraps:
    ``FileSystem.create(path, overwrite=false)`` is atomic on HDFS but
    CHECK-then-create on ``RawLocalFileSystem`` — a TOCTOU window two
    racing local writers can both slip through (caught by the
    multi-writer storm test: both 'won' a lease and one compact's
    _temporary dir was clobbered mid-write). Local paths therefore go
    through POSIX ``O_CREAT|O_EXCL``, which the kernel makes atomic;
    remote schemes keep the Hadoop call."""
    try:
        scheme = fs.getScheme()
    except Exception:
        scheme = "file"
    if scheme == "file":
        try:
            fd = _os.open(
                _local_path(target), _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY
            )
        except OSError:
            return False
        with _os.fdopen(fd, "wb") as f:
            f.write(body)
        return True
    try:
        out = fs.create(Path(target), False)
        out.write(body)
        out.close()
        return True
    except Exception:
        return False


def _try_create_lease(fs, Path, lock: str, token: str) -> bool:
    """Atomically create the lease marker; False if it already exists."""
    return atomic_create(
        fs,
        Path,
        lock,
        f"pid={_os.getpid()} token={token} t={int(_time.time())}".encode(),
    )


def _lease_token(spark, fs, Path, lock: str) -> str | None:
    """The token recorded in the current lease marker (None if absent
    or unreadable)."""
    try:
        jvm = spark.sparkContext._jvm
        stream = fs.open(Path(lock))
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
        body = bytes(baos.toByteArray()).decode("utf-8")
        for part in body.split():
            if part.startswith("token="):
                return part[6:]
    except Exception:
        pass
    return None


@contextlib.contextmanager
def writer_lease(spark, path: str, ttl: float = LEASE_TTL_SEC):
    """Hold the single-writer lease for ``path`` for the block's
    duration. Raises :class:`WriterContention` (with the holder's
    recorded pid) when a live writer already holds it; a lease whose
    heartbeat mtime is older than ``ttl`` seconds is presumed crashed
    and broken. Re-entrant within a process, so compact's inner
    swap_rewrite shares the outer lease instead of deadlocking."""
    import uuid as _uuid

    lock = _lease_path(path)
    if lock in _held():  # re-entrant: this thread's outer frame owns it
        yield
        return
    token = _uuid.uuid4().hex
    fs, Path = _hadoop_fs(spark, path)
    if not _try_create_lease(fs, Path, lock, token):
        # contention — live holder, or a crashed writer's stale lease
        try:
            age = _time.time() - fs.getFileStatus(
                Path(lock)
            ).getModificationTime() / 1000.0
        except Exception:
            age = 0.0  # holder released between our create and stat: retry
        if age <= ttl and not _try_create_lease(fs, Path, lock, token):
            raise WriterContention(
                f"writer_lease: {path} is locked by another writer "
                f"(lease {lock}, age {age:.0f}s <= ttl {ttl:.0f}s); "
                f"the store's single-writer contract forbids concurrent "
                f"swap/append/compact — retry after the holder finishes"
            )
        if age > ttl:
            fs.delete(Path(lock), False)  # break the crashed writer's lease
            if not _try_create_lease(fs, Path, lock, token):
                raise WriterContention(
                    f"writer_lease: lost the race re-claiming a stale "
                    f"lease on {path}"
                )
    _held()[lock] = token
    try:
        yield
    finally:
        _held().pop(lock, None)
        # Ownership-checked release: an operation that outlived the TTL
        # may have had its lease broken and re-claimed by another
        # writer — deleting THE NEW HOLDER'S marker would let a third
        # writer in concurrently. Only delete a marker still carrying
        # our token; a lost lease is left for its new owner.
        if _lease_token(spark, fs, Path, lock) == token:
            fs.delete(Path(lock), False)


def swap_rewrite(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ()
) -> None:
    """Crash-safe full rewrite of the parquet dataset at ``path`` with
    ``df``'s contents: write to a sibling temp dir, move the original
    aside, move the temp into place, drop the original — a crash
    mid-swap leaves the dataset readable at either ``path`` or
    ``path__old``, never gone. The single swap implementation behind
    :func:`compact` and the store/index deletion paths.

    Two hardenings over the hand-rolled version this replaces:

    - All filesystem ops go through the Hadoop FS API, so the swap
      works on any FileSystem scheme (``os.rename`` on an ``s3a://``
      store raised FileNotFoundError AFTER writing a full temp copy —
      the deletion never completed and the "deleted" rows lived on in
      the orphaned temp dir).
    - A partitioned write of an EMPTY DataFrame emits no data files
      (partition dirs exist only per value seen), leaving an
      unreadable dir that fails schema inference on the next load; the
      empty result is rewritten non-partitioned, which emits one
      zero-row file carrying the full schema (partition columns become
      regular columns — pruning is moot on an empty dataset).
    """
    spark = df.sparkSession
    tmp = path.rstrip("/") + "__swap_tmp"
    old = path.rstrip("/") + "__old"
    with writer_lease(spark, path):
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(tmp)
        if partition_cols and _count_parquet_files(spark, tmp) == 0:
            df.write.mode("overwrite").parquet(tmp)
        fs, Path = _hadoop_fs(spark, path)
        if fs.exists(Path(old)):
            fs.delete(Path(old), True)
        # Hadoop rename reports failure as False, not an exception — check
        # both, or a failed swap would silently leave the old contents live.
        if not fs.rename(Path(path), Path(old)):
            raise IOError(f"swap_rewrite: rename {path} -> {old} failed")
        # The second rename can fail as False OR throw (FS-dependent:
        # RawLocalFileSystem throws FileNotFoundException on a missing
        # source) — normalize both into `ok`.
        try:
            ok = fs.rename(Path(tmp), Path(path))
        except Exception:
            ok = False
        if not ok:
            # Idempotent finish: a reader's recover_swap racing this
            # writer inside the between-renames window can roll the
            # completed tmp forward itself (path absent, tmp had its
            # _SUCCESS marker). The dataset then already holds exactly
            # the contents this rename was about to install — success,
            # not an error. Only when path is still absent (or tmp
            # still exists unrenamed) did the swap genuinely fail.
            if not (fs.exists(Path(path)) and not fs.exists(Path(tmp))):
                raise IOError(f"swap_rewrite: rename {tmp} -> {path} failed")
        fs.delete(Path(old), True)


def recover_swap(spark, path: str, missing_ok: bool = False) -> str:
    """Finish or roll back a :func:`swap_rewrite` interrupted by a
    crash, restoring an always-readable dataset at ``path``. Returns
    what was done: ``"clean"`` (path exists — nothing to do),
    ``"forward"`` (the new contents were fully written — ``__swap_tmp``
    has its ``_SUCCESS`` marker — and are moved into place),
    ``"rollback"`` (the write never finished; the original at
    ``__old`` is moved back), or — with ``missing_ok=True`` —
    ``"absent"`` (neither ``path`` nor any sibling exists: the dataset
    was simply never created, which is a normal state for bootstrap
    callers like the ingest loop). Without ``missing_ok``, the
    never-created case raises ``FileNotFoundError`` naming the path —
    NOT a crash-recovery error, since there was no crash.

    CONCURRENCY: reads must not race a live writer's swap. A reader
    calling this inside a writer's between-renames window sees ``path``
    absent and may roll the completed ``__swap_tmp`` forward itself;
    data stays correct (``swap_rewrite`` treats that as an idempotent
    finish), but the "strict no-op on a healthy store" property only
    holds while ``path`` exists.

    Decision table over which sibling dirs exist after a crash:

    - ``path`` present: the live dir is authoritative — STRICT no-op.
      Stray ``__swap_tmp``/``__old`` dirs are deliberately left alone:
      a concurrent in-flight swap_rewrite owns them (readers deleting
      a writer's temp mid-swap would lose the rewrite and strand the
      dataset at ``__old``); the next successful swap replaces both.
    - ``path`` missing, tmp has ``_SUCCESS``: crashed between the two
      renames with a complete new copy — roll FORWARD (the rewrite's
      effect, e.g. a deletion, is preserved).
    - ``path`` missing, tmp incomplete: the only good copy is
      ``__old`` — roll BACK.

    Called by the store-open paths and by every swap writer before it
    reads (so retrying a crashed delete/compact self-heals). Recovery
    renames only ever run when ``path`` is absent — mid-crash — so
    the single-writer contract all the persisted stores already
    assume is the only coordination needed.
    """
    tmp = path.rstrip("/") + "__swap_tmp"
    old = path.rstrip("/") + "__old"
    fs, Path = _hadoop_fs(spark, path)
    if fs.exists(Path(path)):
        return "clean"
    if fs.exists(Path(tmp)) and fs.exists(Path(tmp + "/_SUCCESS")):
        if not fs.rename(Path(tmp), Path(path)):
            raise IOError(f"recover_swap: rename {tmp} -> {path} failed")
        if fs.exists(Path(old)):
            fs.delete(Path(old), True)
        return "forward"
    if fs.exists(Path(old)):
        if not fs.rename(Path(old), Path(path)):
            raise IOError(f"recover_swap: rename {old} -> {path} failed")
        if fs.exists(Path(tmp)):
            fs.delete(Path(tmp), True)
        return "rollback"
    if missing_ok:
        return "absent"
    raise FileNotFoundError(
        f"recover_swap: no dataset at {path} and no crashed-swap "
        f"siblings ({tmp}, {old}) — the store was never created"
    )


def append_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...]
) -> None:
    """Partitioned append that heals the one layout a swap can leave
    behind: after a delete-all, :func:`swap_rewrite` stores the empty
    result as a single non-partitioned zero-row file (the only
    readable representation — a partitioned empty write emits no data
    files). A plain ``mode(append).partitionBy(...)`` beside that root
    file creates a mixed layout Spark refuses to read ("conflicting
    directory structures"), bricking the store; so when the existing
    dataset is empty, this overwrites it with the properly-partitioned
    batch instead — restoring delete-all-then-append (= UPDATE)."""
    spark = df.sparkSession
    with writer_lease(spark, path):
        fs, Path = _hadoop_fs(spark, path)
        if fs.exists(Path(path)) and spark.read.parquet(path).isEmpty():
            # go through the tmp-dir swap rather than mode(overwrite):
            # ivfpq's append plan READS path (duplicate guard), and Spark
            # rejects overwriting a path its own plan reads from
            swap_rewrite(df, path, partition_cols)
        else:
            df.write.mode("append").partitionBy(*partition_cols).parquet(path)


def compact(spark, path: str, target_files_per_partition: int = 1,
            partition_cols: tuple[str, ...] = ()) -> int:
    """Small-file compaction (the OPTIMIZE analog; SURVEY §4 "small-file
    problem"). Rewrites a parquet dataset into ``target_files_per_partition``
    files per partition directory, swapped in via :func:`swap_rewrite`.
    Returns the file count after compaction."""
    with writer_lease(spark, path):
        recover_swap(spark, path)
        df = spark.read.parquet(path)
        writer = df.repartition(
            target_files_per_partition, *partition_cols
        ) if partition_cols else df.coalesce(target_files_per_partition)
        swap_rewrite(writer, path, partition_cols)
        return _count_parquet_files(spark, path)


def to_csv_bytes(df: DataFrame, limit: int = 1_000_000) -> bytes:
    """S7 — serving-edge CSV download of a bounded result."""
    pdf = df.limit(limit).toPandas()
    return pdf.to_csv(index=False).encode("utf-8")


def to_parquet_bytes(df: DataFrame, limit: int = 1_000_000) -> bytes:
    """S8 — serving-edge in-memory parquet blob (reference
    ``data_service.py:228-271``)."""
    buf = io.BytesIO()
    df.limit(limit).toPandas().to_parquet(buf, compression="snappy")
    return buf.getvalue()


def to_json_records(df: DataFrame, limit: int = 100_000) -> list[dict]:
    """S9 — serving-edge JSON documents."""
    return [row.asDict(recursive=True) for row in df.limit(limit).collect()]
