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


def write_stream_exactly_once(stream_df: DataFrame, sink: EpochParquetSink):
    """Attach the idempotent sink; returns the started query."""
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
