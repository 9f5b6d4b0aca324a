#!/usr/bin/env python
"""Corpus-scaling sweep for the MinHash near-dedup path (PERF.md r7).

Mirrors the packing 64x measurement: run signatures -> LSH candidate
pairs -> Jaccard verify -> drop over 5k/20k/80k/320k-document corpora
and record wall-clock plus candidate-pair growth. The corpus is the
sf0.1 documents table replicated with a per-copy token-space remap
(every token gets a copy suffix), so copies share NO shingles: the
duplicate DENSITY stays constant while N grows — the correct setup to
detect super-linear behavior in the pipeline itself, as opposed to
quadratic OUTPUT from a denser duplicate structure.

Usage: python scripts/sweep_near_dedup.py [sf_dir]
Prints one JSON line per scale: n_docs, candidate pairs, verified
pairs, docs dropped, wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import similarity as S
from sec_financial_pipeline_spark.session import get_spark
from sec_financial_pipeline_spark.sources.testdata import load_table

N_HASHES, BAND_SIZE, JACCARD_TAU = 16, 4, 0.8


def corpus(base, copies: int, extra_cols: tuple[str, ...] = ()):
    """Replicate ``base`` with a per-copy token-space remap (shared by
    this sweep and sweep_contamination.py): disjoint shingles, so
    near-dup/contamination structure is internal to each copy
    (constant density), and ids stay unique."""
    parts = []
    for k in range(copies):
        c = base
        if k:
            c = c.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1_{k}").alias("text"),
                *extra_cols,
            )
        else:
            c = c.select("doc_id", "text", *extra_cols)
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_once(spark, d):
    t0 = time.perf_counter()
    sh = (
        d.select("doc_id", F.explode(S.shingles(F.col("text"))).alias("shingle"))
        .repartition("doc_id")
        .persist()
    )
    sig = S.minhash_from_shingles(sh, "doc_id", n_hashes=N_HASHES, band_size=BAND_SIZE)
    cand = S.lsh_candidate_pairs(sig, "doc_id").persist()
    n_cand = cand.count()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingle").alias("shingle_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingle").alias("shingle_a"))
    n_shared = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle_a"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    )
    pairs = (
        n_shared.join(sa, "id_a").join(sb, "id_b")
        .filter(jac >= JACCARD_TAU)
        .select("id_a", "id_b")
        .persist()
    )
    n_pairs = pairs.count()
    n_dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct().count()
    wall = time.perf_counter() - t0
    for df in (sh, cand, pairs):
        df.unpersist()
    return n_cand, n_pairs, n_dropped, wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="sfp-neardedup-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base.count()  # warm scan
    run_once(spark, corpus(base, 1))  # untimed codegen warmup
    for copies in (1, 4, 16, 64):
        d = corpus(base, copies)
        n_docs = d.count()
        n_cand, n_pairs, n_dropped, wall = run_once(spark, d)
        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "candidate_pairs": n_cand,
                    "verified_pairs": n_pairs,
                    "docs_dropped": n_dropped,
                    "wall_sec": round(wall, 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
