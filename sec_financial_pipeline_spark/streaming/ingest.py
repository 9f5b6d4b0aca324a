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

Exactly-once caveat: ``foreachBatch`` re-runs a micro-batch after a
failure, which would double-append its bands and re-emit its pairs.
Production hardening is the epoch-commit protocol already in
``streaming/sinks.py`` (write under epoch id, commit atomically);
wired here as append-only for clarity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sec_financial_pipeline_spark.operators import similarity as S


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


def run_streaming_near_dedup(
    doc_stream: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_path: str,
) -> None:
    """Drain a bounded document stream through the ingest loop
    synchronously (availableNow): per micro-batch, probe + emit pairs
    to ``pairs_path`` (parquet append) + commit bands to the store.
    First batch bootstraps the store (self-join only)."""

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        # cache the batch's signatures: they feed both the pair
        # emission and the store commit (two actions), and the
        # micro-batch source would otherwise be re-read per action
        sigs = S.minhash_signatures(batch_df, "doc_id", "text").persist()
        try:
            if os.path.exists(store_path):
                store = S.load_signature_store(
                    batch_df.sparkSession, store_path
                )
                pairs = S.incremental_candidate_pairs(sigs, "doc_id", store)
            else:
                pairs = S.lsh_candidate_pairs(sigs, "doc_id")
            pairs.write.mode("append").parquet(pairs_path)
            S.append_to_signature_store(sigs, "doc_id", store_path)
        finally:
            sigs.unpersist()

    q = (
        doc_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
