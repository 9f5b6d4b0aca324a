#!/usr/bin/env python
"""Scale receipt for incrementally-maintained materialized views
(sources/matview.py).

The claim: **refresh cost tracks the DELTA, not the source table.**
A view without a change feed must re-aggregate the whole source on
every refresh; the matview folds only the changed rows. Locally a
single whole-source aggregation over a few hundred thousand rows costs
about one Spark job, so the interesting quantity is not one ratio but
the SHAPE: run the same ~3k-row batch against a 1x source and an 8x
source and watch the naive path grow with the table while the
incremental path stays flat. At 100 TB the naive term is the table.

Both paths end in the identical view state (asserted exactly).

Usage: python scripts/sweep_matview.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from sec_financial_pipeline_spark.session import get_spark  # noqa: E402
from sec_financial_pipeline_spark.sources import matview as MV  # noqa: E402
from sec_financial_pipeline_spark.sources import snaptable as T  # noqa: E402
from sec_financial_pipeline_spark.sources.testdata import load_table  # noqa: E402


def one_scale(spark, li, copies: int, tmp: str) -> dict:
    # replicate with shifted keys so groups stay distinct per copy
    parts = [
        li.withColumn("grp", (F.col("grp") + F.lit(i * 100_000)))
        for i in range(copies)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    # a REALISTIC delta is localized (the partition that's still open,
    # the entities that moved) — confine it to a narrow group range so
    # the refresh's footer-bounds prune has something to prune; a
    # delta that touches every group necessarily rewrites every view
    # file, COW or not
    cond = (F.col("grp") < 2_000) & (F.col("l_orderkey") % 7 == 0)
    batch = big.filter(cond)
    base = big.filter(~cond)
    src, view = f"{tmp}/src{copies}", f"{tmp}/view{copies}"
    T.create(base.repartitionByRange(16 * copies, "grp"), src)
    MV.create_matview(
        spark, src, view, ["grp"],
        [("count", None, "n_items"), ("sum", "l_extendedprice", "revenue")],
        range_files=16 * copies,
    )
    T.append(batch, src)

    naive = f"{tmp}/naive{copies}"
    shutil.copytree(view, naive)
    t0 = time.perf_counter()
    full = MV._full_aggregate(T.read(spark, src), MV._load_spec(naive))
    T.overwrite(full, naive)
    t_naive = time.perf_counter() - t0

    t0 = time.perf_counter()
    MV.refresh_matview(spark, view)
    t_refresh = time.perf_counter() - t0

    a, b = MV.read_matview(spark, view), MV.read_matview(spark, naive)
    assert a.exceptAll(b).unionAll(b.exceptAll(a)).count() == 0
    return {
        "rows": base.count() + batch.count(),
        "batch": batch.count(),
        "naive": t_naive,
        "refresh": t_refresh,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="sweep-matview", cpus=32)
    tmp = tempfile.mkdtemp(prefix="sfp_sweep_mv_")
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ).withColumn("grp", F.col("l_orderkey") % 100_000)
        rows = [one_scale(spark, li, c, tmp) for c in (1, 8)]
        print(f"loadavg_1m={os.getloadavg()[0]:.2f}")
        for c, r in zip((1, 8), rows):
            print(
                f"source x{c}: {r['rows']:,} rows, batch {r['batch']:,} | "
                f"naive full-reagg refresh {r['naive']:.2f}s | "
                f"incremental refresh {r['refresh']:.2f}s"
            )
        growth_n = rows[1]["naive"] / rows[0]["naive"]
        growth_r = rows[1]["refresh"] / rows[0]["refresh"]
        print(
            f"8x source: naive grew {growth_n:.1f}x, "
            f"incremental grew {growth_r:.1f}x (flat = 1.0)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
