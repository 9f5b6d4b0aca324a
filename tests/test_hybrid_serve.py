"""Hybrid-retrieval serve lifecycle (VERDICT r13 item 1): the Jaccard
and vector legs join BM25 in the build-once/probe-many family. The
contracts pinned here:

- q_emb_hybrid_serve == q_emb_hybrid_topk bit-exactly (same _hybrid_rrf
  core over value-equal leg inputs from persisted stores);
- serving never re-runs a build phase: no shingle HOF (zip_with), no
  norm computation, no hyperplane projection in the serve plans;
- the sign-LSH ANN serve returns the exact cosine top-k WITHIN the
  candidate set its persisted band table generates (numpy witness).
"""

from __future__ import annotations

import os
import tempfile


def _iso(monkeypatch, tmp_path):
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))


def test_hybrid_serve_equals_train_in_query(spark, sf_dir, monkeypatch,
                                            tmp_path):
    from sec_financial_pipeline_spark.registry.similarity import (
        q_emb_hybrid_serve,
        q_emb_hybrid_topk,
    )

    _iso(monkeypatch, tmp_path)
    served = sorted(map(tuple, q_emb_hybrid_serve(spark, sf_dir).collect()))
    assert served, "hybrid serve returned nothing"
    # all three artifact roots exist, one each (no per-call rebuild)
    for prefix in ("sfp_shingle_", "sfp_emb_store_", "sfp_bm25_"):
        arts = [p for p in os.listdir(str(tmp_path)) if p.startswith(prefix)]
        assert len(arts) == 1, f"{prefix}: {arts}"
    train = sorted(map(tuple, q_emb_hybrid_topk(spark, sf_dir).collect()))
    assert served == train
    # idempotent second call, same artifacts, same answer
    again = sorted(map(tuple, q_emb_hybrid_serve(spark, sf_dir).collect()))
    assert again == served


def test_serve_plans_contain_no_build_phase(spark, sf_dir, monkeypatch,
                                            tmp_path):
    """The whole point of the stores: the expensive build expressions
    must be ABSENT from the serve plans. ``split(text`` marks raw-text
    tokenization (the shingle chain and BM25 term extraction both
    start there), ``sqrt`` marks the L2-norm build, and ``h_emb``
    marks the hyperplane projection — each present in a train-in-query
    twin, none in serve. (zip_with alone is NOT a valid marker: the
    exact cosine dot product legitimately runs it at serve time.)"""
    from sec_financial_pipeline_spark.registry.similarity import (
        q_emb_hybrid_serve,
        q_emb_hybrid_topk,
        q_emb_lsh_ann_serve,
    )

    _iso(monkeypatch, tmp_path)
    q_emb_hybrid_serve(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()  # builds the stores once

    train_plan = q_emb_hybrid_topk(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString().lower()
    serve_plan = q_emb_hybrid_serve(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString().lower()
    lsh_plan = q_emb_lsh_ann_serve(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString().lower()

    # the build phases the stores amortize away, visible in train...
    assert "split(text" in train_plan
    assert "sqrt" in train_plan
    # ...and absent from both serve plans
    for plan in (serve_plan, lsh_plan):
        assert "split(text" not in plan
        assert "sqrt" not in plan
        assert "h_emb" not in plan


def test_lsh_ann_serve_exact_within_candidates(spark, sf_dir, monkeypatch,
                                               tmp_path):
    """Approximation contract: the served ranking must be the EXACT
    cosine top-k restricted to the candidate set the persisted band
    table defines (vectors sharing >= 1 (band, bucket) with the
    query). Witness recomputed in numpy from the stored tables."""
    import numpy as np

    from sec_financial_pipeline_spark.registry.similarity import (
        _N_QUERIES,
        _TOP_K,
        ensure_emb_index,
        q_emb_lsh_ann_serve,
    )

    _iso(monkeypatch, tmp_path)
    got = sorted(
        (r.query_id, r.neighbor_id, r.cosine_sim, r.lsh_rank)
        for r in q_emb_lsh_ann_serve(spark, sf_dir).collect()
    )
    assert got, "LSH serve returned nothing"

    root = ensure_emb_index(spark, sf_dir)
    emb = {
        r["vec_id"]: (np.array(r["emb"]), r["nrm"])
        for r in spark.read.parquet(os.path.join(root, "emb")).collect()
    }
    buckets = {}
    codes = spark.read.parquet(os.path.join(root, "bands")).collect()
    for r in codes:
        buckets.setdefault((r["band"], r["bucket"]), set()).add(r["vec_id"])
    expected = []
    for q in range(_N_QUERIES):
        cands = set()
        for r in codes:
            if r["vec_id"] == q:
                cands |= buckets[(r["band"], r["bucket"])]
        cands.discard(q)
        qv, qn = emb[q]
        scored = sorted(
            (
                (c, round(float(np.dot(emb[c][0], qv)) / (emb[c][1] * qn), 6))
                for c in cands
            ),
            key=lambda t: (-t[1], t[0]),
        )
        for rank, (c, s) in enumerate(scored[:_TOP_K], 1):
            expected.append((q, c, s, rank))
    assert got == sorted(expected)


def test_shingle_store_matches_inline_shingles(spark, sf_dir, monkeypatch,
                                               tmp_path):
    """Store contents = the exact distinct 3-gram sets the inline HOF
    produces, and the sizes table = their cardinalities (the Jaccard
    denominators). Input equality is what makes serve==train a
    structural identity rather than a lucky hash."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.registry.similarity import (
        ensure_shingle_index,
    )
    from sec_financial_pipeline_spark.sources.testdata import load_table

    _iso(monkeypatch, tmp_path)
    root = ensure_shingle_index(spark, sf_dir)
    stored = spark.read.parquet(os.path.join(root, "shingles"))
    inline = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(S.shingles(F.col("text"))).alias("shingle")
    )
    assert stored.exceptAll(inline).isEmpty()
    assert inline.exceptAll(stored).isEmpty()
    sizes = {
        r["doc_id"]: r["n_shingles"]
        for r in spark.read.parquet(os.path.join(root, "sizes")).collect()
    }
    inline_sizes = {
        r["doc_id"]: r["n"]
        for r in inline.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert sizes == inline_sizes
