#!/usr/bin/env python
"""Scale receipts for the snapshot-manifest table (sources/snaptable.py).

Three claims measured, not asserted:

1. **Incremental consumption is O(batch), not O(table).** Build a
   snaptable over the sf documents corpus, append a ~10% batch, then
   time `read_increment(since)` vs a full-table rescan of the head.
   The increment touches only the appended files.
2. **Read latency is flat in commit count** (the single-FileScan read
   path). Same rows split across 4 vs 40 append commits; the 40-commit
   read must not cost more than ~1.5x the 4-commit read (it plans the
   same single scan over more files of the same total bytes).
3. **Z-order clustering turns range scans into file-skipping scans.**
   lineitem clustered on (l_partkey, l_extendedprice); a narrow range
   scan on EITHER column after optimize reads a fraction of the files
   and runs measurably faster than the same scan pre-optimize.

Usage: python scripts/sweep_snaptable.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from sec_financial_pipeline_spark.session import get_spark  # noqa: E402
from sec_financial_pipeline_spark.sources import snaptable as T  # noqa: E402
from sec_financial_pipeline_spark.sources.testdata import load_table  # noqa: E402


def _t(fn, reps=3):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return min(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="snaptable-sweep")
    work = tempfile.mkdtemp(prefix="snap_sweep_")
    try:
        # ---- 1. incremental vs rescan -------------------------------
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n = docs.count()
        path = f"{work}/docs"
        T.create(docs.filter(F.col("doc_id") % 10 != 0), path)
        T.append(docs.filter(F.col("doc_id") % 10 == 0), path)  # ~10% batch
        inc = _t(lambda: T.read_increment(spark, path, 1).count())
        full = _t(lambda: T.read(spark, path).count())
        print(
            f"incremental_vs_rescan: docs={n} batch~10% "
            f"read_increment={inc:.3f}s full_rescan={full:.3f}s "
            f"ratio={full / inc:.2f}x"
        )

        # ---- 2. flat in commit count --------------------------------
        base = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        p4, p40 = f"{work}/c4", f"{work}/c40"
        T.create(base.filter("o_orderkey % 4 = 0"), p4)
        for k in range(1, 4):
            T.append(base.filter(f"o_orderkey % 4 = {k}"), p4)
        T.create(base.filter("o_orderkey % 40 = 0"), p40)
        for k in range(1, 40):
            T.append(base.filter(f"o_orderkey % 40 = {k}"), p40)
        t4 = _t(lambda: T.read(spark, p4).agg(F.sum("o_totalprice")).collect())
        t40 = _t(lambda: T.read(spark, p40).agg(F.sum("o_totalprice")).collect())
        print(
            f"flat_in_commits: rows={base.count()} 4_commits={t4:.3f}s "
            f"40_commits={t40:.3f}s ratio={t40 / t4:.2f}x"
        )

        # ---- 3. z-order skipping ------------------------------------
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_extendedprice"
        )
        pz = f"{work}/li"
        T.create(li.repartition(32), pz)
        qlo, qhi = li.stat.approxQuantile("l_extendedprice", [0.45, 0.55], 0.01)
        pre = _t(
            lambda: T.scan(spark, pz, between=("l_extendedprice", qlo, qhi))
            .agg(F.count(F.lit(1))).collect()
        )
        m = T._manifest(spark, pz, None)
        pre_files = len(T._select_entries(m, None, ("l_extendedprice", qlo, qhi)))
        T.optimize_cluster(spark, pz, ["l_partkey", "l_extendedprice"], 32)
        post = _t(
            lambda: T.scan(spark, pz, between=("l_extendedprice", qlo, qhi))
            .agg(F.count(F.lit(1))).collect()
        )
        m = T._manifest(spark, pz, None)
        post_files = len(T._select_entries(m, None, ("l_extendedprice", qlo, qhi)))
        pk_lo, pk_hi = li.stat.approxQuantile("l_partkey", [0.45, 0.55], 0.01)
        pk_files = len(T._select_entries(m, None, ("l_partkey", pk_lo, pk_hi)))
        print(
            f"zorder_skipping: rows={li.count()} files=32 "
            f"pre: {pre_files}/32 files {pre:.3f}s -> "
            f"post: {post_files}/32 files {post:.3f}s "
            f"(2nd clustered col probes {pk_files}/32 files)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
