#!/usr/bin/env python
"""Scale receipts for the snapshot-manifest table (sources/snaptable.py).

Three claims measured, not asserted:

1. **Incremental consumption is O(batch), not O(table).** Build a
   snaptable over sf lineitem, append a ~10% batch, then time an
   aggregation over `read_increment(since)` vs the same aggregation
   over the full head. The increment touches only the appended files
   (sum, not count — parquet count() is metadata-cheap and would
   flatter both sides).
2. **The manifest adds no read overhead.** A 40-append-commit table's
   head read vs `spark.read.parquet` handed the SAME 40 files
   directly: identical single-FileScan plan, ~identical latency.
   (Reading 40 small files costs more than 4 large ones of the same
   bytes on EITHER path — that is the small-files tax compact exists
   for, not a property of the manifest.)
3. **Z-order clustering turns range scans into file-skipping scans.**
   lineitem clustered on (l_partkey, l_extendedprice); a ~10%-wide
   range on either column after optimize probes a fraction of the 32
   files. 2-D geometry bounds the win: each of 32 files owns roughly
   an 18% x 18% curve tile, so a 10% slab intersects ~30-60% of tiles
   — versus 100% unclustered, and ~3% would need a 1-D sort that then
   skips NOTHING on the other column.

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
        # replicate the corpus 8x (established sweep pattern) so the
        # scan costs real time; at sf0.1 raw, a 600k-row sum hits the
        # ~0.18s job-scheduling floor and both sides measure overhead
        li0 = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_extendedprice")
            .crossJoin(spark.range(8).select(F.col("id").alias("rep")))
            .withColumn(
                "l_orderkey", F.col("l_orderkey") + F.col("rep") * 10_000_000
            )
            .drop("rep")
        )
        n = li0.count()
        path = f"{work}/li_inc"
        T.create(li0.filter("l_orderkey % 10 != 0").repartition(16), path)
        T.append(li0.filter("l_orderkey % 10 = 0").repartition(2), path)
        inc = _t(
            lambda: T.read_increment(spark, path, 1)
            .agg(F.sum("l_extendedprice")).collect()
        )
        full = _t(
            lambda: T.read(spark, path)
            .agg(F.sum("l_extendedprice")).collect()
        )
        # the receipt that scales is BYTES TOUCHED: the increment's plan
        # reads only the appended files (local[32] scans ~30M rows/s so
        # wall-clock converges to the scheduling floor at this size —
        # at cluster scale the byte ratio IS the latency ratio)
        import os as _os

        _, head, added, _removed = T._version_delta(spark, path, 1, None)
        b_added = sum(
            _os.path.getsize(f"{path}/{e['path']}") for e in added
        )
        b_all = sum(
            _os.path.getsize(f"{path}/{e['path']}") for e in head["files"]
        )
        print(
            f"incremental_vs_rescan: rows={n} batch~10% "
            f"read_increment={inc:.3f}s full_rescan={full:.3f}s | "
            f"files {len(added)}/{len(head['files'])}, "
            f"bytes {b_added / 1e6:.1f}MB/{b_all / 1e6:.1f}MB "
            f"({b_all / max(b_added, 1):.1f}x less I/O)"
        )

        # ---- 2. manifest adds no read overhead ----------------------
        base = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        p40 = f"{work}/c40"
        T.create(base.filter("o_orderkey % 40 = 0"), p40)
        for k in range(1, 40):
            T.append(base.filter(f"o_orderkey % 40 = {k}"), p40)
        m = T._manifest(spark, p40, None)
        raw_paths = [f"{p40}/{e['path']}" for e in m["files"]]
        t_tab = _t(lambda: T.read(spark, p40).agg(F.sum("o_totalprice")).collect())
        t_raw = _t(
            lambda: spark.read.parquet(*raw_paths)
            .agg(F.sum("o_totalprice")).collect()
        )
        print(
            f"manifest_overhead: files={len(raw_paths)} commits=40 "
            f"snaptable={t_tab:.3f}s direct_parquet={t_raw:.3f}s "
            f"ratio={t_tab / t_raw:.2f}x"
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
        # ---- 4. bloom point-lookup skipping -------------------------
        pb = f"{work}/bl"
        T.create(
            li.select("l_orderkey", "l_extendedprice").repartition(32), pb
        )
        m = T._manifest(spark, pb, None)
        # a real key from the middle of the range: min/max can't skip it
        # (every round-robin file spans the full key range)
        probe = int(
            li.filter("l_orderkey % 1000 = 1")
            .agg(F.max("l_orderkey")).collect()[0][0]
        )
        pre_files = len(T._select_entries(m, None, None, ("l_orderkey", probe)))
        pre = _t(lambda: T.scan(spark, pb, point=("l_orderkey", probe)).count())
        # sizing: ~19k distinct keys/file x k=5 saturates the 4096-bit
        # default (every bit set -> no pruning); ~10 bits/key keeps the
        # all-k-bits-set false-positive rate ~1%%
        T.add_bloom_index(spark, pb, "l_orderkey", bits=1 << 18)
        m = T._manifest(spark, pb, None)
        post_files = len(T._select_entries(m, None, None, ("l_orderkey", probe)))
        post = _t(lambda: T.scan(spark, pb, point=("l_orderkey", probe)).count())
        print(
            f"bloom_point_lookup: rows=600000 files=32 "
            f"pre: {pre_files}/32 files {pre:.3f}s -> "
            f"post: {post_files}/32 files {post:.3f}s"
        )
        # ---- 5. convert_in_place: on-ramp cost is metadata, not data -
        import time as _time

        lake = f"{work}/lake"
        li.repartition(16).write.parquet(lake)
        sizes_before = {
            e: _os.path.getsize(f"{lake}/{e}")
            for e in _os.listdir(lake) if e.endswith(".parquet")
        }
        t0 = _time.perf_counter()
        T.convert_in_place(spark, lake)
        t_conv = _time.perf_counter() - t0
        sizes_after = {
            e: _os.path.getsize(f"{lake}/{e}")
            for e in _os.listdir(lake) if e.endswith(".parquet")
        }
        assert sizes_before == sizes_after  # zero bytes moved
        t0 = _time.perf_counter()
        full_create = f"{work}/lake_copy"
        T.create(spark.read.parquet(lake), full_create)
        t_create = _time.perf_counter() - t0
        print(
            f"convert_in_place: rows={li.count()} files=16 "
            f"convert={t_conv:.3f}s (0 bytes rewritten) vs "
            f"create-by-copy={t_create:.3f}s "
            f"({t_create / max(t_conv, 1e-9):.1f}x)"
        )
        # ---- 6. scoped OPTIMIZE: rewrite cost O(selected), not O(table)
        ps = f"{work}/sopt"
        T.create(
            li.withColumn("bucket", F.col("l_orderkey") % 8)
            .repartition(4),  # 4 tasks x 8 Hive dirs -> ~32 files
            ps, partition_cols=("bucket",),
        )
        m = T._manifest(spark, ps, None)
        n_files_total = len(m["files"])
        t0 = _time.perf_counter()
        T.optimize_cluster(
            spark, ps, ["l_extendedprice"], target_files=4,
            prune={"partitions": {"bucket": 3}},
        )
        t_scoped = _time.perf_counter() - t0
        m2 = T._manifest(spark, ps, None)
        carried = len(
            {e["path"] for e in m["files"]} & {e["path"] for e in m2["files"]}
        )
        t0 = _time.perf_counter()
        T.optimize_cluster(spark, ps, ["l_extendedprice"], target_files=32)
        t_full = _time.perf_counter() - t0
        print(
            f"scoped_optimize: files={n_files_total} "
            f"scoped(bucket=3)={t_scoped:.3f}s carried_untouched="
            f"{carried}/{n_files_total} vs full_rewrite={t_full:.3f}s "
            f"({t_full / max(t_scoped, 1e-9):.1f}x)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
