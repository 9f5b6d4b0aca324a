#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": <sf>}``.

Each query is timed end-to-end (plan + execute + fetch); session startup
and the first warm-up action are excluded so the numbers measure the
engine, not JVM spin-up.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: Headline set: one per major operator family (serving plan, dedup
#: window, grouped rollup, snowflake join, time-series window, session
#: window, text near-dup, vector search). Several are no longer
#: standalone registry names (consolidated into section-tagged unions to
#: fit the driver's 50-row correctness window) — the bench keeps timing
#: the CONSTITUENT plans under their historical names so round-over-round
#: comparisons stay like-for-like.
HEADLINE = [
    "sec_metric_series",
    "sec_full_statements",
    "sec_ratios_join",
    "sec_trends",
    "rel_pricing_summary",
    "rel_region_rollup",
    "rel_dedup_policies",
    "rel_growth",
    "evt_sessionize",
    "evt_range_join",
    "doc_signatures",
    "doc_near_dedup_end2end",
    "doc_dup_clusters",
    "emb_cosine_topk",
    "emb_ivf_ann",
    # round-8 (VERDICT r07 item 1): the PQ and SQ rows are now SERVE
    # rows — codebooks / code tables are built once by the warm-up call
    # (the batch-train job) and the timed reps load + search only, so
    # the whole quantized-ANN family reports serving latency.
    # emb_ivf_ann stays a train-in-query row for train-cost visibility.
    # r7 figures for the retrain-per-query rows they replace:
    # emb_pq_topk 3.12s, emb_sq_topk 1.15s (driver, sf0.1).
    "emb_pq_serve",
    "emb_sq_serve",
    "doc_curation_pipeline",
    "pipe_incremental",
    # round-5 widening: sequence packing + chunk assembly + multimodal
    # byte stats become regression-visible. (emb_candidate_recall is
    # deliberately excluded: its exact all-pairs ground truth is a
    # measurement harness, O(N^2) by design.)
    "doc_pack_chunks",
    "doc_chunk_assembly",
    "mm_media_stats",
    # round-6 widening: PII redaction and the single-scan document
    # profile (now carrying the Gopher repetition signal) become
    # regression-visible.
    "doc_redact",
    "doc_profile",
    # round-7 widening: the build-once/query-many ANN serving path —
    # the warm-up call trains + persists the IVF-PQ index (the batch
    # job); timed reps load it from parquet and run search only, so
    # this row is pure query latency (VERDICT r06 item 2).
    "emb_ivfpq_serve",
    # ...and the ingest twin: probe an incoming batch against the
    # persisted corpus signature store (no corpus re-banding) — the
    # incremental near-dedup latency an ingest pipeline pays per batch.
    "doc_incr_dedup_serve",
    # round-7 widening 2: the train/eval n-gram contamination audit
    # (two shingle explodes + a semi join) becomes regression-visible.
    "doc_contamination",
    # round-8 widening: corpus-level boilerplate removal (CCNet/Gopher
    # line dedup: segment explode -> per-line distinct-doc counts ->
    # anti-join drop -> ordered reassembly) becomes regression-visible.
    "doc_boilerplate",
    # round-11: unigram-LM tokenizer training (Kudo 2018 Viterbi-EM,
    # the `unigram` section of doc_pack_chunks) as its own constituent
    # row so in-query training cost stays regression-visible — the
    # doc_pack_chunks bench row keeps timing the pure offsets plan
    # like-for-like. NEW row: shared-row totals vs r10 exclude it.
    "unigram_train",
    # round-8 widening 2: the snapshot-table change feed — manifest
    # resolution + file-set diff + exceptAll cancellation + aggregation
    # over a 3-version table (the warm-up call builds it once under the
    # artifact cache, like the ANN serve rows).
    "snap_cdf",
    # round-9 widening: the merge-on-read read path — a scan over a
    # table whose head carries live deletion vectors pays the per-file
    # sidecar anti-join; this row keeps that tax regression-visible
    # (build-once dv'd table under the artifact cache).
    "snap_dv_read",
    # round-10 widening (VERDICT r9 item 4): one incremental matview
    # refresh CYCLE — append a fixed ~5% orders delta to a bench-local
    # source snaptable and fold it into the grouped view through the
    # change feed. Per-call work is constant, so PERF.md's O(delta)
    # refresh claim is now regression-visible; the untimed warm-up
    # call pays the initial full build.
    "matview_refresh",
    # round-12: the unigram APPLY path over the persisted trained piece
    # table (~9% of docs tokenized per call) — the inference half that
    # actually runs at 100 TB; warm-up trains + persists the model.
    "unigram_apply",
    # round-11 widening: query-only BM25 over the persisted inverted
    # index (~1% of the corpus as queries) — the serve half of the
    # retrieval lifecycle, scoring bit-identical to the bm25 oracle
    # section; the warm-up call builds the postings store once.
    "bm25_serve",
    # round-14 (VERDICT r13 item 1): the full 3-leg RRF hybrid query
    # answered entirely from prebuilt stores — shingle postings +
    # sizes, normalized vectors, BM25 postings/idf/stats; bit-identical
    # to the train-in-query hybrid section (pinned in
    # tests/test_hybrid_serve.py). The warm-up call builds all three
    # stores; timed reps are pure probe + fuse.
    "hybrid_serve",
    # ...and the sign-LSH ANN serve: probe the persisted band table
    # with the queries' own stored codes (zero hyperplane projections
    # at serve time), exact-cosine re-rank within candidates.
    "lsh_ann_serve",
]


def _headline_fns():
    """name -> callable, resolving consolidated constituents directly."""
    from sec_financial_pipeline_spark.registry import all_queries
    from sec_financial_pipeline_spark.registry import (
        llm_text,
        pipeline,
        sec_domain,
        similarity,
    )

    constituents = {
        "sec_metric_series": sec_domain.q_metric_series,
        "sec_full_statements": sec_domain.q_full_statements,
        "sec_ratios_join": sec_domain.q_ratios_join,
        "sec_trends": sec_domain.q_trends,
        "emb_pq_serve": similarity.q_emb_pq_serve,
        "emb_sq_serve": similarity.q_emb_sq_serve,
        "emb_ivfpq_serve": similarity.q_emb_ivfpq_serve,
        "doc_incr_dedup_serve": similarity.q_doc_incr_dedup_serve,
        "bm25_serve": similarity.q_emb_bm25_serve,
        "hybrid_serve": similarity.q_emb_hybrid_serve,
        "lsh_ann_serve": similarity.q_emb_lsh_ann_serve,
        "doc_contamination": similarity.q_doc_contamination,
        "doc_boilerplate": llm_text.q_doc_boilerplate,
        # r8: the registry row gained a `batches` section (length-
        # bucketed batch assembly); the bench keeps timing the pure
        # concat-chunk offsets plan under the historical name so the
        # pack row stays like-for-like round-over-round.
        "doc_pack_chunks": llm_text.q_doc_pack_offsets,
        # r11: the unigram tokenizer section, timed standalone
        "unigram_train": llm_text.q_doc_unigram,
        # r12: apply-only tokenization against the persisted model
        "unigram_apply": llm_text.q_doc_unigram_apply_serve,
        # r8: likewise, the clusters registry row gained the
        # leakage_split section (a second CC pass); the bench row keeps
        # timing the pure transitive-closure constituent.
        "doc_dup_clusters": similarity.q_doc_dup_clusters_only,
        "snap_cdf": pipeline.q_snap_cdf,
        "snap_dv_read": pipeline.q_snap_dv_read,
        "matview_refresh": pipeline.q_matview_refresh_bench,
        # r8: the cosine registry row gained the `hybrid` RRF section;
        # the bench row keeps timing the pure brute-force cosine
        # constituent like-for-like.
        "emb_cosine_topk": similarity.q_emb_cosine_topk,
    }
    queries = all_queries()
    return {
        name: constituents.get(name) or queries[name].fn for name in HEADLINE
    }

#: Timed repetitions per query; the OFFICIAL per-row figure is the
#: min-of-3 (VERDICT r11 item 1: the r11 readings spanned 40.7-56.8s
#: across builder/driver/judge with identical plan metrics, so the
#: official record must be the reading least sensitive to co-tenant
#: load) with a per-row `spread` field (max/min across the three
#: passes) quantifying how noisy the box was. Cross-round perf claims
#: key on plan metrics + the normalized-to-reference-row column, never
#: raw wall. The median is still recorded in BENCH_FULL.json for
#: continuity with r1-r11 totals.
N_REPS = 3


def _plan_metrics(spark, group: str) -> dict | None:
    """Deterministic plan metrics for the jobs tagged ``group``, from
    the Spark UI REST API (VERDICT r9 item 1): job/stage/task counts,
    input bytes and shuffle read/write bytes. Wall-clock moves with
    co-tenant load; these move only when the PLAN moves — a regression
    shifts them, a slower box cannot. None when the UI is unreachable
    (metrics are additive context, never a bench failure)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    app = spark.sparkContext.applicationId
    try:
        def _get(sub):
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}{sub}", timeout=10
            ) as r:
                return json.loads(r.read().decode())

        jobs = [j for j in _get("/jobs") if j.get("jobGroup") == group]
        sids = {sid for j in jobs for sid in j.get("stageIds", [])}
        stages = [s for s in _get("/stages") if s["stageId"] in sids]
        return {
            "jobs": len(jobs),
            "stages": len(stages),
            "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
            "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
            "shuffle_read_bytes": sum(
                s.get("shuffleReadBytes", 0) for s in stages
            ),
            "shuffle_write_bytes": sum(
                s.get("shuffleWriteBytes", 0) for s in stages
            ),
        }
    except Exception:
        return None


def main() -> None:
    from sec_financial_pipeline_spark.session import get_spark

    spark = get_spark(app_name="sfp-bench", cpus=CPUS, ui=True)
    fns = _headline_fns()

    # Warm up the JVM / parquet footer caches outside the timed region:
    # one cheap action per table so timed queries measure the engine,
    # not file-listing and first-touch codegen.
    from sec_financial_pipeline_spark.schemas import TESTDATA_TABLES
    from sec_financial_pipeline_spark.sources.testdata import load_table

    for t in TESTDATA_TABLES:
        load_table(spark, SF_DIR, t).count()

    # Steady-state methodology (JMH-style): one untimed warmup execution
    # per query absorbs SQL analysis + whole-stage codegen compilation —
    # one-time per-plan costs, not per-query work — then N_REPS timed
    # runs; the median is reported. PERF.md records both methodologies.
    #
    # Fetch is Arrow-batched toPandas(): still a full end-to-end
    # materialization of every result row on the driver, but through the
    # columnar interchange path a real consumer would use — py4j
    # row-at-a-time collect() was measured to spend 70s of
    # pipe_incremental's 78s deserializing 1.1M Rows in Python, turning
    # the bench into a py4j benchmark instead of an engine one.
    from sec_financial_pipeline_spark.registry.similarity import release_caches

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spread: dict[str, float] = {}
    compute_only: dict[str, float] = {}
    plan_metrics: dict[str, dict | None] = {}
    for name in HEADLINE:
        fn = fns[name]
        fn(spark, SF_DIR).toPandas()  # warmup: plan + codegen + caches
        # compute-vs-fetch split (VERDICT r07 item 6): a noop-sink write
        # executes the FULL physical plan (no aggregate pushdown games a
        # count() could play) without materializing a byte on the
        # driver, so `compute_only` isolates engine time from the Arrow
        # fetch — pipe_incremental's 1.6M-row contract pays ~3s of
        # bridge time that would otherwise mask engine regressions.
        # min of 2 (it's a secondary metric; keep the bench short).
        co = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            co.append(time.perf_counter() - t0)
        compute_only[name] = round(min(co), 4)
        reps = []
        sc = spark.sparkContext
        for i in range(N_REPS):
            # tag the final rep's jobs so the REST API can attribute
            # its deterministic plan metrics to this query
            if i == N_REPS - 1:
                sc.setJobGroup(f"bench:{name}", name)
            t0 = time.perf_counter()
            pdf = fn(spark, SF_DIR).toPandas()
            reps.append(time.perf_counter() - t0)
            assert pdf is not None
        sc.setLocalProperty("spark.jobGroup.id", None)
        plan_metrics[name] = _plan_metrics(spark, f"bench:{name}")
        # OFFICIAL per-row figure = min-of-3 (VERDICT r11 item 1): the
        # reading least sensitive to co-tenant load. `spread` = max/min
        # across the three passes — a spread near 1.0 means the min is
        # trustworthy; a wide spread flags a noisy box, in which case
        # only plan metrics + the normalized column are comparable.
        timings[name] = round(min(reps), 4)
        spread[name] = round(max(reps) / min(reps), 2)
        # median retained in the full record for continuity with the
        # r1-r11 totals (which reported sum-of-medians).
        medians[name] = round(sorted(reps)[len(reps) // 2], 4)
        # drop caches the finished query pinned: each query's reps still
        # benefit (warmup re-populates), but query j doesn't execute
        # under query i's leftover storage-memory pressure
        release_caches()

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        # per-row min-of-3 (official) + spread (max/min over 3 passes)
        "queries": timings,
        "basis": "min_of_3",
        "spread": spread,
        "spread_max": max(spread.values()),
        "median": medians,
        "median_total": round(sum(medians.values()), 4),
        # engine time without the driver-side Arrow fetch (noop sink);
        # `queries` stays the end-to-end figure so totals remain
        # like-for-like round-over-round.
        "compute_only": compute_only,
        "compute_only_total": round(sum(compute_only.values()), 4),
        "sf": sf,
        # deterministic plan metrics per row (final timed rep): a real
        # regression moves job/stage/task counts or shuffle/input
        # bytes; a slower box cannot (VERDICT r9 item 1).
        "plan_metrics": plan_metrics,
        # wall normalized to the pinned reference row: co-tenant noise
        # inflates numerator and denominator together, so this column
        # is comparable across boxes — with plan metrics, the ONLY
        # basis for cross-round perf claims (VERDICT r11 item 1).
        "normalized_to_sec_metric_series": {
            n: round(v / timings["sec_metric_series"], 3)
            for n, v in timings.items()
        }
        if timings.get("sec_metric_series")
        else {},
        # co-tenant load context (VERDICT r03 #7): the same code measured
        # 38-68s across load avg 1-5, so round-over-round driver
        # comparisons need the load recorded to be normalizable.
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }
    # The driver records only the last ~2000 chars of stdout, and the
    # full record (per-row plan metrics + three per-row timing columns)
    # outgrew that window at r8 — BENCH_r08/09/10 all parsed as null
    # (VERDICT r10 item 1). Split the output: the FULL per-row JSON is
    # written to BENCH_FULL.json next to this script, and the LAST
    # stdout line is a compact summary (driver-contract keys `metric`/
    # `value`/`unit`/`queries`/`sf` plus the three totals and load
    # context) that fits the tail window.
    # r15 (VERDICT r14 item 3): the path encodes the core count, so the
    # driver's low-core rerun no longer clobbers the 32-core record the
    # round notes cite. Purely additive — stdout contract unchanged.
    full_name = f"BENCH_FULL_c{CPUS}.json"
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             full_name)
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        # per-row min-of-3 (3dp) + per-row spread (2dp) both inside the
        # driver's ~2000-char stdout tail window (VERDICT r11 item 1)
        "queries": {n: round(v, 3) for n, v in timings.items()},
        "basis": "min_of_3",
        "spread": spread,
        "median_total": out["median_total"],
        "compute_only_total": out["compute_only_total"],
        "n_rows": len(timings),
        "sf": sf,
        "loadavg_1m": out["loadavg_1m"],
        "full_record": full_name,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces: never outgrow the window again
        compact["spread"] = {"max": out["spread_max"]}
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        compact.pop("queries")
        line = json.dumps(compact, separators=(",", ":"))
    sys.stderr.write(f"full bench record written to {full_path}\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
