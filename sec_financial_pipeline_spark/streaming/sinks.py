"""Streaming sinks (SURVEY §2.7 north-star): exactly-once batch sink via
``foreachBatch`` with epoch-keyed idempotent writes.

Structured Streaming guarantees each epoch id is presented at least
once; writing every micro-batch to an epoch-addressed directory and
skipping epochs that already committed makes the sink idempotent —
re-delivered epochs are no-ops, so end-to-end semantics are
exactly-once (same mechanism Delta's txn log provides, reduced to
plain parquet + marker files for this environment).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class EpochParquetSink:
    """foreachBatch target: parquet per epoch + commit markers."""

    def __init__(self, base_path: str):
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)

    def _marker(self, epoch_id: int) -> str:
        return os.path.join(self.base_path, f"_committed_{epoch_id}")

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if os.path.exists(self._marker(epoch_id)):
            return  # re-delivered epoch: already durable, skip (idempotence)
        out = os.path.join(self.base_path, f"epoch={epoch_id}")
        batch_df.write.mode("overwrite").parquet(out)
        with open(self._marker(epoch_id), "w") as f:
            f.write("ok")

    def committed_epochs(self) -> list[int]:
        return sorted(
            int(name.rsplit("_", 1)[1])
            for name in os.listdir(self.base_path)
            if name.startswith("_committed_")
        )


class SnaptableSink:
    """foreachBatch target writing each micro-batch into a snapshot-
    manifest table (``sources/snaptable.py``) with the epoch id as a
    per-app transaction watermark — the Delta txnAppId/txnVersion
    pattern in full: idempotence lives IN the table's commit log, not
    in side-channel marker files.

    Advantages over :class:`EpochParquetSink` (which it supersedes for
    table-shaped output): the result is ONE queryable table (not an
    epoch-dir forest), readers get snapshot isolation while the stream
    runs, compaction/vacuum run concurrently without breaking the
    epoch memory (every commit carries the txn map forward), and a
    restarted query can ask the table itself what was applied
    (``snaptable.last_txn``) instead of trusting a marker directory
    to have survived the crash.

    ``key_cols`` switches appends to MERGE upserts — an exactly-once
    streaming CDC apply."""

    def __init__(self, path: str, app_id: str, key_cols: list[str] | None = None):
        self.path = path
        self.app_id = app_id
        self.key_cols = list(key_cols) if key_cols else None

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from sec_financial_pipeline_spark.sources import snaptable as T

        spark = batch_df.sparkSession
        txn = (self.app_id, int(epoch_id))
        if not T.versions(spark, self.path):
            # Bootstrap: the first epoch creates the table, seeding the
            # txn map so a replay of epoch 0 is a no-op like any other.
            try:
                T.create(batch_df, self.path, txn=txn)
                return
            except (FileExistsError, T.SnapshotConflict):
                pass  # racing bootstrap lost; fall through (the txn
                # check inside append/merge makes the retry safe)
        if self.key_cols:
            # merge is a REWRITE: unlike append it cannot rebase, so a
            # maintenance commit (compact/optimize) racing in between
            # head resolution and publish conflicts. Retry — the merge
            # recomputes against the new head each time, and the txn
            # check turns an already-applied retry into a no-op —
            # instead of letting SnapshotConflict kill the whole
            # streaming query.
            import time as _time

            for attempt in range(20):
                try:
                    T.merge_upsert(batch_df, self.path, self.key_cols, txn=txn)
                    return
                except T.SnapshotConflict:
                    # linear backoff: a merge recomputes a full rewrite
                    # per attempt, so without yielding it can starve
                    # against back-to-back maintenance commits
                    _time.sleep(0.05 * (attempt + 1))
                    continue
            raise T.SnapshotConflict(
                f"snaptable sink: merge epoch {epoch_id} lost 20 head "
                f"races at {self.path}"
            )
        else:
            T.append(batch_df, self.path, txn=txn)

    def committed_epochs(self, spark) -> list[int]:
        """Epochs applied per the head manifest (at most one watermark
        per app — returned as [last] to mirror EpochParquetSink,
        including [] before the table is bootstrapped)."""
        from sec_financial_pipeline_spark.sources import snaptable as T

        try:
            last = T.last_txn(spark, self.path, self.app_id)
        except FileNotFoundError:
            return []  # cold start: no table yet, nothing committed
        return [] if last is None else [last]


def write_stream_exactly_once(stream_df: DataFrame, sink):
    """Attach an idempotent foreachBatch sink (:class:`EpochParquetSink`
    or :class:`SnaptableSink`); returns the started query."""
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
