"""Streaming near-dedup ingest (SURVEY §2.7 x §2.9 north star).

The batch ingest loop (probe the persisted signature store -> emit
candidate pairs -> append the batch's bands) lifted onto Structured
Streaming: each micro-batch of documents is banded, probed against the
store as of the previous batch, and committed. The invariant the test
pins: over ANY micro-batching of a corpus, every candidate pair is
emitted EXACTLY once — in the micro-batch where its later member
arrives (earlier members are found via the store, same-batch members
via the self-join, and a pair is never re-emitted because processed
docs are not re-banded).

Scale shape: identical joins to the batch path (equi-join on
(band_no, band_hash); planner-chosen broadcast for small batches);
state lives in the parquet store, not in Spark streaming state — so
there is no unbounded stateful operator and no watermark needed.

Exactly-once: pairs are written to per-epoch directories behind commit
markers (the ``EpochParquetSink`` protocol from ``streaming/sinks.py``),
so a re-delivered micro-batch overwrites its own epoch instead of
double-appending. The store append is at-least-once on a crash inside
the commit window, which is SAFE: every store consumer deduplicates
(candidate pairs are ``distinct``, doc counts are ``distinct id``), so
a re-appended band row costs join work, never correctness. Commit
markers are driver-local files, like ``EpochParquetSink`` — a remote
checkpoint story would move them onto the store filesystem.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sec_financial_pipeline_spark.operators import similarity as S


def store_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API, so remote
    store URIs (hdfs://, s3a://) resolve correctly — a driver-local
    ``os.path.exists`` would be always-False there and silently turn
    every ingest into a store-less bootstrap."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def read_document_stream(
    spark: SparkSession, path: str, max_files: int = 1
) -> DataFrame:
    """File-source stream of (doc_id, text) parquet — bounded
    files-per-trigger sizes the micro-batches."""
    return (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def ingest_batch(
    batch_df: DataFrame,
    store_path: str,
    pairs_out: str,
    overwrite: bool = False,
) -> dict:
    """ONE ingest transaction — the single implementation behind both
    the streaming loop and the CLI `dedup ingest` command: band the
    batch, probe the store (or self-join-only bootstrap when no store
    exists yet), write the emitted pairs to ``pairs_out``, commit the
    batch's bands. Returns ``batch_docs`` (documents actually banded —
    docs with < k tokens have no shingles and are dropped, matching
    every other MinHash path) and ``pairs_emitted`` (THIS batch's
    pairs, not a cumulative rescan)."""
    from sec_financial_pipeline_spark.sources.sink import (
        recover_swap,
        writer_lease,
    )

    spark = batch_df.sparkSession
    sigs = S.minhash_signatures(batch_df, "doc_id", "text").persist()
    try:
        n_banded = sigs.count()
        # the store-root writer lease serializes this probe+append
        # transaction against a concurrent compaction (the auto-compact
        # daemon of ANOTHER lineage on the same store) — without it a
        # compact's swap could move the store aside mid-append and
        # strand this batch's band files in the swapped-out tree. Same
        # lease sink.compact takes; a raced second lineage contends
        # loudly and its micro-batch retries.
        #
        # recover_swap FIRST, not a bare existence check: after a crashed
        # delete/compact (path absent, data stranded at __old/__swap_tmp)
        # a bare store_exists would silently bootstrap a brand-new store
        # and permanently orphan every pre-crash band — previously
        # ingested duplicates would never be detected again. Recovery
        # heals the store when a crashed swap left one; only a genuinely
        # never-created path ("absent") takes the bootstrap branch.
        with writer_lease(spark, store_path):
            if recover_swap(spark, store_path, missing_ok=True) != "absent":
                store = S.load_signature_store(spark, store_path)
                pairs = S.incremental_candidate_pairs(sigs, "doc_id", store)
            else:
                pairs = S.lsh_candidate_pairs(sigs, "doc_id")
            pairs = pairs.persist()
            try:
                n_pairs = pairs.count()
                pairs.write.mode(
                    "overwrite" if overwrite else "append"
                ).parquet(pairs_out)
                S.append_to_signature_store(sigs, "doc_id", store_path)
            finally:
                pairs.unpersist()
    finally:
        sigs.unpersist()
    return {"batch_docs": n_banded, "pairs_emitted": n_pairs}


def run_streaming_near_dedup(
    doc_stream: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_path: str,
    auto_compact_files: int | None = None,
) -> None:
    """Drain a bounded document stream through the ingest loop
    synchronously (availableNow). Per micro-batch: skip if this epoch
    already committed (re-delivery), else run :func:`ingest_batch`
    into ``pairs_path/epoch=<id>`` (overwrite — idempotent on retry)
    and write the commit marker last.

    ``auto_compact_files`` (VERDICT r13 item 3) closes the small-file
    loop: every micro-batch appends one file set per band partition,
    so a long-running ingest accretes debt until an operator runs
    ``dedup compact``. With a threshold set, the daemon itself checks
    the store's parquet file count after each committed batch and
    folds to one file per band when it crosses — safely, because the
    compact runs INSIDE the foreachBatch body, serialized with the
    stream's own writes (the single-writer rule holds by
    construction; a concurrent external writer is excluded by the
    writer lease either way). A crash mid-compact heals through
    recover_swap on the next batch's ingest, exactly like a crashed
    manual compact."""

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(pairs_path, f"_committed_{epoch_id}")
        if os.path.exists(marker):
            return  # re-delivered epoch: already durable (idempotence)
        ingest_batch(
            batch_df,
            store_path,
            os.path.join(pairs_path, f"epoch={epoch_id}"),
            overwrite=True,
        )
        with open(marker, "w") as f:
            f.write("ok")
        if auto_compact_files is not None:
            from sec_financial_pipeline_spark.sources.sink import (
                WriterContention,
                _count_parquet_files,
                compact,
            )

            spark = batch_df.sparkSession
            try:
                if (
                    store_exists(spark, store_path)
                    and _count_parquet_files(spark, store_path)
                    >= auto_compact_files
                ):
                    compact(
                        spark,
                        store_path,
                        target_files_per_partition=1,
                        partition_cols=("band_no",),
                    )
            except WriterContention:
                # another lineage holds the store lease — debt remains,
                # a later batch (or the other lineage's own policy)
                # retries; compaction is an optimization, never worth
                # failing a committed batch over
                pass

    q = (
        doc_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


# ---------------------------------------------------------------------------
# Streaming BM25 index ingest (r12): the retrieval store's streaming
# half, joining the MinHash signature store's loop above. EXACTLY-ONCE
# with a different mechanism, because the BM25 derived tables are NOT
# replay-tolerant (df counts would double where candidate pairs merely
# deduplicate): each micro-batch's postings land in an EPOCH-KEYED
# subdirectory with mode=overwrite — a re-delivered epoch replaces
# itself, never double-appends — and the derived df/idf/stats then
# REBUILD from the postings store (operators/bm25.rebuild_bm25_derived,
# idempotent by construction). Any crash/replay therefore converges to
# the exact from-scratch index; no commit markers needed.
# ---------------------------------------------------------------------------


def ingest_bm25_epoch(
    batch_df: DataFrame,
    store_path: str,
    ns: str,
    epoch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    legacy_ns: str | None = None,
) -> bool:
    """Store-lease-guarded entry (see :func:`_ingest_bm25_epoch_impl`
    for the transaction itself): the root lease serializes this
    epoch's multi-file postings write + derived rebuild against any
    concurrent compaction or second streaming lineage on the same
    store — a raced writer contends loudly (WriterContention → the
    micro-batch retries) instead of a compact folding this epoch's
    PARTIAL files."""
    from sec_financial_pipeline_spark.operators.bm25 import _store_lease

    with _store_lease(batch_df.sparkSession, store_path):
        return _ingest_bm25_epoch_impl(
            batch_df, store_path, ns, epoch_id, id_col, text_col,
            legacy_ns=legacy_ns,
        )


def _ingest_bm25_epoch_impl(
    batch_df: DataFrame,
    store_path: str,
    ns: str,
    epoch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    legacy_ns: str | None = None,
) -> bool:
    """ONE streaming micro-batch's ingest transaction (the body of
    :func:`run_streaming_bm25_ingest`'s foreachBatch, callable directly
    for tests and manual replay). Returns False when the epoch was
    SKIPPED by the replay fence: an epoch of this lineage at or below
    the compaction marker was folded into the flat postings files —
    re-overwriting its (now-deleted) epoch dir would DOUBLE-count those
    docs. The marker is written before the compaction swap, so in every
    crash state "epoch <= fence is already durable" holds (see
    operators/bm25.compact_bm25_store)."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.bm25 import (
        _fs_delete,
        _fs_exists,
        _stats_max_gen,
        _write_compact_marker,
        bm25_batch_tables,
        compaction_fences,
        rebuild_bm25_derived,
    )
    from sec_financial_pipeline_spark.sources.sink import recover_swap

    spark = batch_df.sparkSession
    fences = compaction_fences(spark, store_path)
    # legacy-fence migration (ADVICE r13, medium): a compaction that
    # folded PRE-namespace `epoch-<id>` dirs fenced them under ns "".
    # Pre-upgrade stores hold exactly one streaming lineage by
    # construction, so the first namespaced ingest IS that lineage
    # restarted post-upgrade: adopt the legacy fence into this
    # namespace (else a crashed pre-upgrade stream whose last epoch's
    # commit was lost would re-deliver it, see fences[ns] == -1, and
    # re-ingest docs the compaction already folded — double count).
    # Residual edge, documented: a brand-new SECOND lineage created
    # post-upgrade that ingests before the original restarts would
    # adopt the fence instead and skip its own first epochs — the
    # upgrade note says restart the original lineage first.
    migrated = False
    if "" in fences:
        fences[ns] = max(fences.get(ns, -1), fences[""])
        del fences[""]
        migrated = True
    # same migration for a URI checkpoint's PRE-r14 abspath-derived
    # namespace (cwd-dependent hash): on a same-cwd restart the old
    # namespace is computable — adopt its fence so a re-delivered
    # pre-upgrade epoch is skipped, not double-counted. Different-cwd
    # restarts are unattributable (documented on
    # operators/bm25.legacy_epoch_namespace).
    if legacy_ns and legacy_ns != ns and legacy_ns in fences:
        fences[ns] = max(fences.get(ns, -1), fences[legacy_ns])
        del fences[legacy_ns]
        migrated = True
    if migrated:
        _write_compact_marker(spark, store_path, fences)
    if epoch_id <= fences.get(ns, -1):
        return False
    # heal any half-done swap a crashed maintenance op left, like the
    # batch ingest does — without this, a stats dir sitting mid-swap
    # (path absent, contents at __old) would read as "bootstrap" and
    # silently RESET the generation to 1, below existing tombstone
    # cutoffs: a re-added previously-deleted doc would be permanently
    # masked. missing_ok=True throughout: a genuinely absent store is
    # the normal streaming bootstrap (and then no tombstones exist, so
    # gen=1 is safe).
    for sub in ("postings", "tombstones", "df", "stats", "idf"):
        recover_swap(spark, os.path.join(store_path, sub), missing_ok=True)
    postings_b, _, _ = bm25_batch_tables(batch_df, id_col, text_col)
    gen = (
        _stats_max_gen(spark, store_path) + 1
        if _fs_exists(spark, os.path.join(store_path, "stats"))
        else 1
    )
    # migration: a store written by the pre-namespace code may hold
    # this epoch's output under the legacy global name — a replayed
    # epoch must REPLACE it, not coexist with it (pre-upgrade stores
    # have exactly one lineage by construction, so the legacy dir for
    # this epoch id can only be this lineage's earlier delivery)
    _fs_delete(
        spark, os.path.join(store_path, "postings", f"epoch-{epoch_id}")
    )
    if legacy_ns and legacy_ns != ns:
        _fs_delete(
            spark,
            os.path.join(
                store_path, "postings", f"epoch-{legacy_ns}-{epoch_id}"
            ),
        )
    # doc-clustered like the batch paths (bm25_batch_tables already
    # normalizes the id column to doc_id)
    postings_b.withColumn("gen", F.lit(gen).cast("bigint")).repartition(
        "doc_id"
    ).write.mode("overwrite").parquet(
        os.path.join(store_path, "postings", f"epoch-{ns}-{epoch_id}")
    )
    # the batch's gen IS the store's new top generation (stats max_gen
    # is maintained monotone by every completed maintenance op) — pass
    # it through so the rebuild skips a per-micro-batch raw scan
    rebuild_bm25_derived(spark, store_path, max_gen=gen)
    return True


def run_streaming_bm25_ingest(
    doc_stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    auto_compact_epochs: int | None = None,
) -> None:
    """Drain a bounded document stream into a BM25 store synchronously
    (availableNow). The store may start absent (bootstrap) or be an
    existing batch-built store (its flat postings files and the
    streaming epoch dirs read as one union).

    ``auto_compact_epochs`` (VERDICT r13 item 3): with a threshold
    set, the daemon checks :func:`~sec_financial_pipeline_spark.
    operators.bm25.bm25_epoch_debt` after each INGESTED epoch (fenced
    replays don't re-trigger) and runs ``compact_bm25_store`` when the
    accreted epoch-dir count crosses it — the quiesced-single-writer
    rule compaction requires holds by construction, because the
    compact runs inside the foreachBatch body between micro-batches.
    The compaction's replay fence then covers every folded epoch: a
    crash right after the fold whose checkpoint commit was lost
    re-delivers the last epoch, and the fence skips it instead of
    double-counting (pinned in tests/test_streaming_ingest.py)."""
    from sec_financial_pipeline_spark.operators.bm25 import (
        bm25_epoch_debt,
        compact_bm25_store,
        epoch_namespace,
        legacy_epoch_namespace,
    )

    # epoch dirs are NAMESPACED by the streaming lineage (a stable tag
    # of the checkpoint location): a restart of this query overwrites
    # its own epoch dirs (exactly-once), while a DIFFERENT lineage
    # ingesting new documents into the same store can never collide —
    # a global epoch namespace let a second lineage's epoch-0 silently
    # OVERWRITE the first's postings (r13). The Delta-sink
    # (queryId, epochId) idempotence key, re-expressed on dir names.
    ns = epoch_namespace(checkpoint_path)
    legacy_ns = legacy_epoch_namespace(checkpoint_path)

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        did_ingest = ingest_bm25_epoch(
            batch_df, store_path, ns, epoch_id,
            id_col=id_col, text_col=text_col, legacy_ns=legacy_ns,
        )
        if (
            did_ingest
            and auto_compact_epochs is not None
            and bm25_epoch_debt(batch_df.sparkSession, store_path)
            >= auto_compact_epochs
        ):
            from sec_financial_pipeline_spark.sources.sink import (
                WriterContention,
            )

            try:
                compact_bm25_store(batch_df.sparkSession, store_path)
            except WriterContention:
                # another lineage holds the store lease — keep the
                # debt, retry on a later batch; never fail a committed
                # batch for an optimization
                pass

    q = (
        doc_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
