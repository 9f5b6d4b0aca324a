"""SemDeDup (operators/semdedup.py): cluster-bounded semantic pairs
against a brute-force all-pairs witness, keep-one-per-group semantics
through chains, and the candidate-bounding property."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import semdedup
from sec_financial_pipeline_spark.sources.testdata import load_table


def _embs(spark, sf_dir, n=256):
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
    )


def _aug(spark, sf_dir, n=256):
    """Corpus + planted semantic near-dups: perturbing a vector by a
    multiple of its own reversal keeps direction (cos ~0.99+ for 0.1,
    ~0.97 for 0.25) without being an exact copy — the synthetic corpus
    itself has no pair above cos 0.45."""
    base = _embs(spark, sf_dir, n)

    def perturbed(eps, offset, mod):
        return (
            base.filter(F.col("vec_id") % mod == 0)
            .select(
                (F.col("vec_id") + offset).alias("vec_id"),
                F.zip_with(
                    "emb", F.reverse("emb"), lambda x, y: x + F.lit(eps) * y
                ).alias("emb"),
            )
        )

    return base.unionByName(perturbed(0.1, 1000, 8)).unionByName(
        perturbed(0.25, 2000, 16)
    )


def _witness_pairs(rows, tau):
    """All-pairs rounded cosine >= tau (no clustering)."""
    out = set()
    for i in range(len(rows)):
        ia, va = rows[i]
        na = math.sqrt(sum(x * x for x in va))
        for j in range(i + 1, len(rows)):
            ib, vb = rows[j]
            nb = math.sqrt(sum(x * x for x in vb))
            c = round(sum(x * y for x, y in zip(va, vb)) / (na * nb), 6)
            if c >= tau:
                out.add((min(ia, ib), max(ia, ib)))
    return out


TAU = 0.95


def test_semantic_pairs_subset_of_bruteforce_with_high_recall(spark, sf_dir):
    """Clustering only REMOVES candidates (no false pairs), and at this
    corpus/threshold recalls the vast majority of true pairs — the
    quantified approximation contract every ANN operator here carries."""
    e = _aug(spark, sf_dir)
    rows = [(r.vec_id, r.emb) for r in e.collect()]
    want = _witness_pairs(rows, TAU)
    got = {
        (r.id_a, r.id_b)
        for r in semdedup.semantic_pairs(e, k=8, tau=TAU).collect()
    }
    assert got <= want  # never a pair below tau, never cross-invented
    assert want, "corpus must contain semantic near-dups at this tau"
    recall = len(got) / len(want)
    assert recall >= 0.8, (len(got), len(want))


def test_semantic_dedup_keeps_one_per_group(spark, sf_dir):
    e = _aug(spark, sf_dir)
    pairs = semdedup.semantic_pairs(e, k=8, tau=TAU)
    keep = semdedup.semantic_dedup(e, k=8, tau=TAU)
    kept = {r.vec_id for r in keep.filter("keep").collect()}
    dropped = {r.vec_id for r in keep.filter("NOT keep").collect()}
    # every input id classified exactly once
    assert len(kept) + len(dropped) == e.count()
    # group semantics: for every found pair, at most one side survives,
    # and the survivor of each connected group is its min id
    import collections

    adj = collections.defaultdict(set)
    for r in pairs.collect():
        adj[r.id_a].add(r.id_b)
        adj[r.id_b].add(r.id_a)
    seen = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u] - comp)
        seen |= comp
        assert kept & comp == {min(comp)}, comp
    # ids in no pair all survive
    all_ids = {r.vec_id for r in e.select("vec_id").collect()}
    assert all_ids - set(adj) <= kept


def test_semantic_pairs_candidate_bound(spark, sf_dir):
    """The whole point: candidate pairs are within-cluster only, so the
    comparison count is sum(n_c^2)/2, far below all-pairs N^2/2."""
    e = _embs(spark, sf_dir, n=512)
    # count candidates BEFORE the tau filter by setting tau=-1
    cand = semdedup.semantic_pairs(e, k=16, tau=-1.0).count()
    n = e.count()
    assert cand < (n * (n - 1) // 2) * 0.5, (cand, n)
