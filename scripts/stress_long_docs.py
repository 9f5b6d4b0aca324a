#!/usr/bin/env python
"""Long-document stress fixture (PERF.md r7, judge stretch item 7).

Real pretraining corpora carry 10k-100k-token documents; the sf* test
docs are short, so a per-row quadratic in document LENGTH (like the
pre-r7 doc_profile trigram build) is invisible to the driver bench.
This harness concatenates the sf0.1 texts into ever-longer documents
while holding TOTAL tokens constant, then times the three per-document
hot paths — doc_profile, MinHash signatures, sequence packing. A
length-linear engine is flat across rows; a per-row quadratic blows up
as avg_tokens grows.

Usage: python scripts/stress_long_docs.py [sf_dir]
Prints one JSON line per corpus shape.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import similarity as S
from sec_financial_pipeline_spark.operators.packing import pack_offsets
from sec_financial_pipeline_spark.registry.llm_text import q_doc_profile
from sec_financial_pipeline_spark.session import get_spark
from sec_financial_pipeline_spark.sources.testdata import load_table


def build_fixture(base, group: int, path: str) -> None:
    """Concat every `group` docs into one; constant total tokens."""
    d = base.withColumn("g", (F.col("doc_id") % F.lit(10_000_000) / group).cast("long"))
    merged = (
        d.groupBy("g")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.concat_ws(" ", F.collect_list("text")).alias("text"),
            F.first("lang").alias("lang"),
            F.first("source").alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("int"))
        .select("doc_id", "lang", "source", "text", "n_chars")
    )
    merged.write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))


def time_paths(spark, sf_dir: str) -> dict:
    d = load_table(spark, sf_dir, "documents")
    stats = d.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("tok"),
    ).collect()[0]
    out = {"n_docs": int(stats["n"]), "avg_tokens": int(stats["tok"] / stats["n"])}

    t = time.perf_counter()
    q_doc_profile(spark, sf_dir).collect()
    out["doc_profile_sec"] = round(time.perf_counter() - t, 2)

    t = time.perf_counter()
    S.minhash_signatures(d, "doc_id", "text").count()
    out["minhash_sec"] = round(time.perf_counter() - t, 2)

    toks = d.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    t = time.perf_counter()
    pack_offsets(toks, "doc_id", "n_tok", 1024).count()
    out["packing_sec"] = round(time.perf_counter() - t, 2)

    # r8 per-document hot paths: the line-dedup chain (explode+regroup
    # segments — NOT per-row HOF slicing, which would be quadratic in
    # doc length) and the ExactSubstr span detector (per-position
    # k-grams via the shift-chain). Both must stay flat as avg_tokens
    # grows at constant total tokens.
    from sec_financial_pipeline_spark.operators.dedup import (
        drop_boilerplate_lines,
        reassemble_lines,
        repeated_kgram_spans,
        token_segment_lines,
    )

    t = time.perf_counter()
    lines = token_segment_lines(d, "doc_id", "text", 3)
    reassemble_lines(
        drop_boilerplate_lines(lines, "doc_id", 3), "doc_id", sep=" "
    ).count()
    out["boilerplate_sec"] = round(time.perf_counter() - t, 2)

    t = time.perf_counter()
    repeated_kgram_spans(d, "doc_id", "text", k=8).count()
    out["dup_spans_sec"] = round(time.perf_counter() - t, 2)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="sfp-longdoc-stress")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    time_paths(spark, sf_dir)  # untimed codegen warmup at the base shape
    with tempfile.TemporaryDirectory() as tmp:
        for group in (1, 8, 64, 512, 2500):
            fx = os.path.join(tmp, f"g{group}")
            build_fixture(base, group, fx)
            print(json.dumps({"concat_group": group, **time_paths(spark, fx)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
