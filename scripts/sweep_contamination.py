#!/usr/bin/env python
"""Corpus-scaling sweep for the train/eval contamination audit (PERF.md r7).

Same harness shape as sweep_near_dedup.py: the sf0.1 documents table is
replicated with a per-copy token-space remap (disjoint shingles per
copy, so true cross-copy contamination is zero and contamination
density stays constant while N grows), then the audit — hash split ->
5-gram explode both sides -> semi-join counts -> per-source rates —
runs at 5k/20k/80k/320k docs. The thing to catch is super-linear
wall-clock or hit growth: the semi-join's output is bounded by the
eval side (~10% of N), so both should stay near-linear.

Usage: python scripts/sweep_contamination.py [sf_dir]
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.dedup import ngram_contamination
from sec_financial_pipeline_spark.operators.sampling import hash_uniform
from sec_financial_pipeline_spark.registry.similarity import (
    _CONTAM_K as K,
    _CONTAM_MIN_OVERLAP as MIN_OVERLAP,
    _CONTAM_RATE as RATE,
    _CONTAM_SALT as SALT,
)
from sec_financial_pipeline_spark.session import get_spark
from sec_financial_pipeline_spark.sources.testdata import load_table
from sweep_near_dedup import corpus as _corpus


def corpus(base, copies: int):
    # the sweep measures the REGISTRY's audit configuration (constants
    # imported above), over the shared replication helper
    return _corpus(base, copies, extra_cols=("source",))


def run_once(spark, d):
    t0 = time.perf_counter()
    is_eval = hash_uniform(F.col("doc_id"), SALT) < RATE
    per_doc = ngram_contamination(
        d.filter(is_eval), d.filter(~is_eval), "doc_id", "text", k=K
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum((F.col("n_overlap") >= MIN_OVERLAP).cast("long")).alias(
            "n_contaminated"
        ),
        F.sum("n_overlap").alias("total_hits"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    return agg["n_eval"], agg["n_contaminated"], agg["total_hits"], wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="sweep-contamination", cpus=os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents")
    n_base = base.count()
    for copies in (1, 4, 16, 64):
        d = corpus(base, copies)
        n_eval, n_cont, hits, wall = run_once(spark, d)
        print(
            json.dumps(
                {
                    "n_docs": n_base * copies,
                    "n_eval": int(n_eval),
                    "n_contaminated": int(n_cont),
                    "total_hits": int(hits or 0),
                    "wall_s": round(wall, 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
