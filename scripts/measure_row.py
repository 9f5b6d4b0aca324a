#!/usr/bin/env python
"""Per-row measurement harness for the optimization rounds (guide §1).

Times one or more bench/headline rows with the NOOP SINK (full plan
execution, zero driver materialization — guide §1.4), labels jobs
(§1.5), reports min/median of N reps plus the in-JVM plan metrics
(jobs/stages/tasks, shuffle read/write bytes), and optionally writes
``.explain("formatted")`` to plans/r14/<row>_<tag>.txt.

Usage:
    python scripts/measure_row.py ROW [ROW...] [--reps N] [--explain TAG]
                                  [--sf DIR] [--fetch]

``--fetch`` additionally times the bench's real action (Arrow
toPandas) for like-for-like comparison with BENCH_FULL.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("rows", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--fetch", action="store_true")
    args = ap.parse_args()

    import bench
    from sec_financial_pipeline_spark.plans.metrics import measure_query
    from sec_financial_pipeline_spark.registry.similarity import release_caches
    from sec_financial_pipeline_spark.session import get_spark

    spark = get_spark(app_name="sfp-measure", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    fns = bench._headline_fns()

    out: dict[str, dict] = {}
    for name in args.rows:
        fn = fns[name]
        sc = spark.sparkContext
        # warmup: plan + codegen + build-once artifact caches
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        if args.explain is not None:
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            dest = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", "r15", f"{name}_{args.explain}.txt",
            )
            with open(dest, "w") as f:
                f.write(plan)
            print(f"[plan] {dest}", file=sys.stderr)
        reps = []
        for i in range(args.reps):
            sc.setJobDescription(f"measure:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        m = measure_query(spark, name, fn, args.sf, warm=False)
        rec = {
            "noop_min": round(min(reps), 3),
            "noop_med": round(sorted(reps)[len(reps) // 2], 3),
            "spread": round(max(reps) / min(reps), 2),
            "jobs": m["jobs"],
            "stages": m.get("stages"),
            "tasks": m.get("tasks"),
            "shuffle_read_mb": round(m["shuffle_read_bytes"] / 1e6, 2),
            "shuffle_write_mb": round(m.get("shuffle_write_bytes", 0) / 1e6, 2),
        }
        if args.fetch:
            fr = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn(spark, args.sf).toPandas()
                fr.append(time.perf_counter() - t0)
            rec["fetch_min"] = round(min(fr), 3)
        out[name] = rec
        release_caches()
        print(f"{name}: {json.dumps(rec)}", flush=True)
    print(json.dumps({"loadavg_1m": round(os.getloadavg()[0], 2), "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
