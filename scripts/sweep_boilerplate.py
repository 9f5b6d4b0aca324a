#!/usr/bin/env python
"""Corpus-scaling sweep for boilerplate removal (PERF.md r8).

Same harness shape as sweep_contamination.py: the sf0.1 documents table
is replicated with a per-copy token-space remap (disjoint lines per
copy — boilerplate structure is internal to each copy, so per-copy line
frequencies are constant while N grows), then the full chain — token
segments -> per-line distinct-doc counts -> anti-join drop ->
ordered reassembly — runs at 5k/20k/80k/320k docs. The thing to catch
is super-linear wall-clock or output growth: every stage is a linear
explode / partial-aggregable count / anti-join, so both should scale
~linearly with the corpus.

Usage: python scripts/sweep_boilerplate.py [sf_dir]
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.dedup import (
    drop_boilerplate_lines,
    reassemble_lines,
    token_segment_lines,
)
from sec_financial_pipeline_spark.registry.llm_text import (
    _BOILER_LINE_W as W,
    _BOILER_MIN_DOCS as MIN_DOCS,
)
from sec_financial_pipeline_spark.session import get_spark
from sec_financial_pipeline_spark.sources.testdata import load_table
from sweep_near_dedup import corpus


def run_once(spark, d):
    t0 = time.perf_counter()
    lines = token_segment_lines(d, "doc_id", "text", W)
    kept = drop_boilerplate_lines(lines, "doc_id", MIN_DOCS)
    clean = reassemble_lines(kept, "doc_id", sep=" ")
    agg = clean.agg(
        F.count(F.lit(1)).alias("n_docs_out"),
        F.sum("n_kept").alias("kept_lines"),
    ).collect()[0]
    n_lines = lines.count()
    wall = time.perf_counter() - t0
    return n_lines, agg["n_docs_out"], agg["kept_lines"], wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="sweep-boilerplate", cpus=os.environ.get("SPARK_GRAFT_CPUS", 32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents")
    n_base = base.count()
    for copies in (1, 4, 16, 64):
        d = corpus(base, copies)
        n_lines, n_out, kept_lines, wall = run_once(spark, d)
        print(
            json.dumps(
                {
                    "n_docs": n_base * copies,
                    "n_lines": int(n_lines),
                    "docs_with_survivors": int(n_out),
                    "kept_lines": int(kept_lines or 0),
                    "dropped_lines": int(n_lines - (kept_lines or 0)),
                    "wall_s": round(wall, 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
