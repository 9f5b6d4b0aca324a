"""Receipt for the r14 OCC narrowing: merge latency/retries under
sustained key-disjoint append traffic, WITH the append-rebase vs with
it disabled (conservative any-row-changing conflict, simulated by
forcing the disjointness check to fail).

Run:  python scripts/sweep_merge_rebase.py
Emits one JSON line per mode: appends committed during the window,
merges attempted, total merge retries, starved merges (exhausted
budget), wall seconds.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import sec_financial_pipeline_spark.sources.snaptable as T
import sec_financial_pipeline_spark.sources.snaptable.dml as D

N_APPEND_THREADS = 2
MERGES = 4
RETRY_BUDGET = 6


def run(mode: str) -> dict:
    spark = SparkSession.getActiveSession()
    path = tempfile.mkdtemp(prefix=f"mrb_{mode}_") + "/t"
    T.create(
        spark.range(0, 5_000).select(
            "id", (F.col("id") * 2).alias("v")
        ).repartition(8),
        path,
    )
    orig = D._prune_by_key_bounds
    if mode == "conservative":
        # every appended file reads as possibly-overlapping -> the
        # pre-r14 conflict behavior
        D._prune_by_key_bounds = lambda entries, *a, **k: (list(entries), [])
    stop = threading.Event()
    appended = [0]

    def appender(tid: int):
        i = 0
        while not stop.is_set() and i < 60:
            lo = 10_000_000 * (tid + 1) + i * 100
            try:
                T.append(
                    spark.range(lo, lo + 100).select(
                        "id", (F.col("id") * 3).alias("v")
                    ),
                    path,
                )
                appended[0] += 1
            except T.SnapshotConflict:
                pass
            i += 1
            time.sleep(0.05)

    threads = [
        threading.Thread(target=appender, args=(t,))
        for t in range(N_APPEND_THREADS)
    ]
    for th in threads:
        th.start()
    t0 = time.time()
    retries = starved = done = 0
    try:
        for m in range(MERGES):
            patch = spark.createDataFrame(
                [(k, -m) for k in range(m * 5, m * 5 + 5)],
                "id bigint, v bigint",
            )
            for attempt in range(RETRY_BUDGET):
                try:
                    T.merge_upsert(patch, path, ["id"])
                    done += 1
                    break
                except T.SnapshotConflict:
                    retries += 1
            else:
                starved += 1
    finally:
        stop.set()
        for th in threads:
            th.join()
        D._prune_by_key_bounds = orig
    return {
        "mode": mode,
        "appends_committed": appended[0],
        "merges_done": done,
        "merges_starved": starved,
        "merge_retries": retries,
        "wall_sec": round(time.time() - t0, 2),
    }


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sweep-merge-rebase")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for mode in ("rebase", "conservative"):
        print(json.dumps(run(mode)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
