"""IVF-PQ composed ANN index (operators/ivfpq).

Verified properties (all deterministic — the corpus and seeds are fixed):

- exactness in the limit: probing every cell with a re-rank budget >=
  corpus size must return EXACTLY the brute-force top-5 (quantization
  only prunes; the final ranking is exact cosine);
- pruning trades recall for cost monotonically: more re-rank budget
  never hurts recall;
- results are identical under different input partitioning;
- returned cosine values equal the exact python-computed cosine.
"""

from __future__ import annotations

import collections
import math

import pytest
from pyspark.sql import functions as F

_SLICES = ((1, 1, 32), (2, 33, 32))
_N_QUERIES = 5


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .withColumn("nrm", S.norm(F.col("emb")))
        .repartition(8)
        .persist()
    )
    e.count()
    return e


@pytest.fixture(scope="module")
def index(corpus):
    from sec_financial_pipeline_spark.operators import ivfpq

    seeds = corpus.filter(
        (F.col("vec_id") >= 16) & (F.col("vec_id") < 24)
    ).select(
        (F.col("vec_id") - 16).cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    return ivfpq.build_index(
        corpus, seeds, list(range(24, 32)), _SLICES, n_iter=1
    )


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "emb", "nrm"
    )


@pytest.fixture(scope="module")
def exact_top5(corpus):
    vecs = {r.vec_id: r.emb for r in corpus.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            ),
            6,
        )

    out = {}
    for qid in range(_N_QUERIES):
        ranked = sorted(
            ((cos(vecs[qid], vecs[v]), -v) for v in vecs if v != qid),
            reverse=True,
        )[:5]
        out[qid] = {-nv for _, nv in ranked}
    return vecs, cos, out


def _recall(rows, exact):
    got = collections.defaultdict(set)
    for r in rows:
        got[r.query_id].add(r.neighbor_id)
    return sum(len(got[q] & exact[q]) for q in exact) / (5 * len(exact))


def test_full_probe_full_rerank_is_exact(corpus, queries, index, exact_top5):
    from sec_financial_pipeline_spark.operators import ivfpq

    n = corpus.count()
    rows = ivfpq.search(
        corpus, queries, index, n_probe=8, rerank=n, top_k=5
    ).collect()
    vecs, cos, exact = exact_top5
    assert _recall(rows, exact) == 1.0
    assert all(
        abs(r.cosine_sim - cos(vecs[r.query_id], vecs[r.neighbor_id])) < 1e-9
        for r in rows
    )


def test_rerank_budget_monotone_and_pruned_recall(
    corpus, queries, index, exact_top5
):
    from sec_financial_pipeline_spark.operators import ivfpq

    _, _, exact = exact_top5
    r50 = _recall(
        ivfpq.search(corpus, queries, index, n_probe=8, rerank=50, top_k=5).collect(),
        exact,
    )
    r150 = _recall(
        ivfpq.search(corpus, queries, index, n_probe=8, rerank=150, top_k=5).collect(),
        exact,
    )
    assert 0 < r50 <= r150  # bigger exact-rerank budget never hurts
    # 6-bit codes on a uniform random corpus: coarse by construction,
    # but the fixed inputs make these measured values stable
    assert r150 >= 0.6


def test_search_is_partitioning_invariant(corpus, queries, index, exact_top5):
    from sec_financial_pipeline_spark.operators import ivfpq

    a = sorted(
        tuple(r)
        for r in ivfpq.search(
            corpus, queries, index, n_probe=2, rerank=50, top_k=5
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in ivfpq.search(
            corpus.repartition(3), queries, index, n_probe=2, rerank=50, top_k=5
        ).collect()
    )
    assert a == b and len(a) == 25


def test_index_parquet_roundtrip(spark, tmp_path, corpus, queries, index):
    from sec_financial_pipeline_spark.operators import ivfpq

    before = sorted(
        tuple(r)
        for r in ivfpq.search(
            corpus, queries, index, n_probe=2, rerank=50, top_k=5
        ).collect()
    )
    path = str(tmp_path / "ivfpq_index")
    ivfpq.save_index(index, path)
    loaded = ivfpq.load_index(spark, path)
    assert loaded.slices == index.slices
    after = sorted(
        tuple(r)
        for r in ivfpq.search(
            corpus, queries, loaded, n_probe=2, rerank=50, top_k=5
        ).collect()
    )
    assert after == before


def test_loaded_codes_prune_on_cell_and_no_streamed_nested_loop(
    spark, tmp_path, corpus, queries, index
):
    from sec_financial_pipeline_spark.operators import ivfpq

    path = str(tmp_path / "ivfpq_index2")
    ivfpq.save_index(index, path)
    loaded = ivfpq.load_index(spark, path)
    # probing is a filter on the partition column: the scan must prune
    # to the probed cells' files, not read the whole code table
    probe = loaded.codes.filter(F.col("cell").isin(0, 3))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters: [")[1].splitlines()[0]
    # and the search plan over the loaded index contains no
    # streamed-streamed nested loop (broadcast build sides only)
    splan = (
        ivfpq.search(corpus, queries, loaded, n_probe=2, rerank=50, top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in splan
    for frag in splan.split("BroadcastNestedLoopJoin")[1:]:
        head = frag.splitlines()[0]
        assert "BuildRight" in head or "BuildLeft" in head


def test_serve_path_matches_train_and_query(spark, sf_dir, monkeypatch, tmp_path):
    """The query-only serving path (persisted index loaded from parquet,
    no Lloyd pass) returns exactly what the train+query registry path
    returns — the index round-trip changes latency, never results."""
    import tempfile

    from sec_financial_pipeline_spark.registry import similarity as sim

    # isolate the persisted-index location so the test never reads a
    # stale index from a previous process
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    full = sorted(
        tuple(r) for r in sim.q_emb_ivfpq_topk(spark, sf_dir).collect()
    )
    served = sorted(
        tuple(r) for r in sim.q_emb_ivfpq_serve(spark, sf_dir).collect()
    )
    assert served == full and len(full) > 0
    # second serve call must NOT retrain: the ensure step sees the
    # persisted copy (mtime unchanged) and goes straight to search
    import os

    path = sim.ensure_ivfpq_index(spark, sf_dir)
    mtime = os.path.getmtime(os.path.join(path, "slices"))
    again = sorted(
        tuple(r) for r in sim.q_emb_ivfpq_serve(spark, sf_dir).collect()
    )
    assert again == full
    assert os.path.getmtime(os.path.join(path, "slices")) == mtime


def test_append_ingest_without_retraining(spark, tmp_path, corpus, queries):
    """Index maintenance: new vectors encode under the FROZEN codebooks
    and append — the parquet-level ingest must equal the in-memory
    union, leave the codebook files untouched, and make the new
    vectors searchable."""
    import os

    from sec_financial_pipeline_spark.operators import ivfpq

    # build on the corpus minus a held-out batch, then ingest the
    # batch. The hold-out starts above 32 so every coarse seed (16-23)
    # and PQ seed (24-31) stays in `base` — otherwise the index would
    # silently train with missing cells/centroids.
    held_out = (F.col("vec_id") >= 32) & (F.col("vec_id") % 7 == 3)
    batch = corpus.filter(held_out)
    base = corpus.filter(~held_out)
    seeds = base.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 24)).select(
        (F.col("vec_id") - 16).cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    idx = ivfpq.build_index(base, seeds, list(range(24, 32)), _SLICES, n_iter=1)
    path = str(tmp_path / "ivfpq_append")
    ivfpq.save_index(idx, path)
    cb_mtime = max(
        os.path.getmtime(os.path.join(root, f))
        for sub in ("coarse", "pq", "slices")
        for root, _, files in os.walk(os.path.join(path, sub))
        for f in files
    )

    ivfpq.append_to_saved_index(spark, path, batch)
    loaded = ivfpq.load_index(spark, path)
    in_mem = ivfpq.append_to_index(idx, batch)

    cols = ["vec_id", "cell", "m", "code"]
    on_disk_codes = sorted(map(tuple, loaded.codes.select(*cols).collect()))
    in_mem_codes = sorted(map(tuple, in_mem.codes.select(*cols).collect()))
    assert on_disk_codes == in_mem_codes
    assert len(on_disk_codes) == corpus.count() * len(_SLICES)
    # codebook files untouched by the ingest
    assert (
        max(
            os.path.getmtime(os.path.join(root, f))
            for sub in ("coarse", "pq", "slices")
            for root, _, files in os.walk(os.path.join(path, sub))
            for f in files
        )
        == cb_mtime
    )
    # appended vectors are searchable: query with an APPENDED vector's
    # exact embedding under a synthetic id (search excludes the query's
    # own vec_id, so the probe id must differ) — the appended vector
    # itself must come back as the top neighbor at cosine 1.0
    probe_src = batch.orderBy("vec_id").limit(1).collect()[0]
    probe = spark.createDataFrame(
        [(-1, probe_src["emb"], probe_src["nrm"])],
        "query_id LONG, emb ARRAY<DOUBLE>, nrm DOUBLE",
    )
    top = (
        ivfpq.search(corpus, probe, loaded, n_probe=2, rerank=50, top_k=5)
        .orderBy(F.col("cosine_sim").desc(), "neighbor_id")
        .collect()
    )
    assert top[0]["neighbor_id"] == probe_src["vec_id"]
    assert top[0]["cosine_sim"] == 1.0

    # re-ingesting the same batch is a no-op (first-wins duplicate
    # guard): without it, duplicated (vec_id, m) rows would make the
    # vector unsearchable via search's exact n_m completeness check
    ivfpq.append_to_saved_index(spark, path, batch)
    again = sorted(
        map(
            tuple,
            ivfpq.load_index(spark, path).codes.select(*cols).collect(),
        )
    )
    assert again == on_disk_codes


def test_delete_then_reappend_is_an_update(spark, tmp_path, corpus):
    """Index deletion + re-append = UPDATE: a deleted vector vanishes
    from search; re-appending it restores the exact original codes
    (the first-wins guard no longer blocks it once deleted)."""
    import os

    from sec_financial_pipeline_spark.operators import ivfpq

    seeds = corpus.filter(
        (F.col("vec_id") >= 16) & (F.col("vec_id") < 24)
    ).select(
        (F.col("vec_id") - 16).cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    idx = ivfpq.build_index(corpus, seeds, list(range(24, 32)), _SLICES, n_iter=1)
    path = str(tmp_path / "ivfpq_del")
    ivfpq.save_index(idx, path)
    cols = ["vec_id", "cell", "m", "code"]
    original = sorted(
        map(tuple, ivfpq.load_index(spark, path).codes.select(*cols).collect())
    )

    victim = corpus.filter(F.col("vec_id") >= 40).orderBy("vec_id").limit(1).collect()[0]
    n_left = ivfpq.delete_from_saved_index(spark, path, [victim["vec_id"]])
    assert n_left == len(original) - len(_SLICES)
    # a probe with the victim's own embedding no longer returns it
    probe = spark.createDataFrame(
        [(-1, victim["emb"], victim["nrm"])],
        "query_id LONG, emb ARRAY<DOUBLE>, nrm DOUBLE",
    )
    loaded = ivfpq.load_index(spark, path)
    hits = {
        r["neighbor_id"]
        for r in ivfpq.search(
            corpus, probe, loaded, n_probe=2, rerank=50, top_k=5
        ).collect()
    }
    assert victim["vec_id"] not in hits

    # re-append restores the exact original code rows (an UPDATE flow)
    ivfpq.append_to_saved_index(
        spark, path, corpus.filter(F.col("vec_id") == victim["vec_id"])
    )
    restored = sorted(
        map(tuple, ivfpq.load_index(spark, path).codes.select(*cols).collect())
    )
    assert restored == original


def test_pq_serve_path_matches_train_and_query(spark, sf_dir, monkeypatch, tmp_path):
    """VERDICT r7 item 1: the PQ serving path (persisted subspace
    codebooks + code table, no Lloyd pass, no corpus re-encode) returns
    exactly what the train-in-query path returns, and a second serve
    call does not rebuild the index."""
    import os
    import tempfile

    from sec_financial_pipeline_spark.registry import similarity as sim

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    full = sorted(tuple(r) for r in sim.q_emb_pq_topk(spark, sf_dir).collect())
    served = sorted(tuple(r) for r in sim.q_emb_pq_serve(spark, sf_dir).collect())
    assert served == full and len(full) > 0
    path = sim.ensure_pq_index(spark, sf_dir)
    mtime = os.path.getmtime(os.path.join(path, "cb"))
    again = sorted(tuple(r) for r in sim.q_emb_pq_serve(spark, sf_dir).collect())
    assert again == full
    assert os.path.getmtime(os.path.join(path, "cb")) == mtime


def test_sq_serve_path_matches_train_and_query(spark, sf_dir, monkeypatch, tmp_path):
    """SQ twin: the persisted int8 code table serves searches with no
    corpus explode / min-max pass, bit-identical to the train-in-query
    row, and the store is built exactly once."""
    import os
    import tempfile

    from sec_financial_pipeline_spark.registry import similarity as sim

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    full = sorted(tuple(r) for r in sim.q_emb_sq_topk(spark, sf_dir).collect())
    served = sorted(tuple(r) for r in sim.q_emb_sq_serve(spark, sf_dir).collect())
    assert served == full and len(full) > 0
    path = sim.ensure_sq_index(spark, sf_dir)
    mtime = os.path.getmtime(path)
    again = sorted(tuple(r) for r in sim.q_emb_sq_serve(spark, sf_dir).collect())
    assert again == full
    assert os.path.getmtime(path) == mtime


def test_maintained_store_matches_from_scratch(
    spark, sf_dir, monkeypatch, tmp_path, corpus
):
    """VERDICT r13 item 6: the MAINTAINED saved index (build on an
    initial slice -> save -> append the rest under frozen codebooks ->
    swap-rewrite delete) serves exactly what an in-memory
    reconstruction over the same lifecycle produces, deleted ids never
    surface, and the store is built once."""
    import os
    import tempfile

    from sec_financial_pipeline_spark.operators import ivfpq
    from sec_financial_pipeline_spark.registry import similarity as sim

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    served = sorted(
        tuple(r) for r in sim.q_emb_ivfpq_maint(spark, sf_dir).collect()
    )
    assert served

    # in-memory twin: build on the initial slice, append the rest,
    # drop the deleted ids from the code table, search identically
    init = corpus.filter(~F.expr(sim._IVFPQM_APPEND))
    seeds = init.filter(
        (F.col("vec_id") >= 16) & (F.col("vec_id") < 24)
    ).select(
        (F.col("vec_id") - 16).cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    idx = ivfpq.build_index(init, seeds, list(range(24, 32)), _SLICES, n_iter=1)
    idx = ivfpq.append_to_index(idx, corpus.filter(F.expr(sim._IVFPQM_APPEND)))
    idx = ivfpq.IvfPqIndex(
        coarse=idx.coarse,
        pq=idx.pq,
        codes=idx.codes.filter(~F.expr(sim._IVFPQM_DELETE)),
        slices=idx.slices,
    )
    queries = corpus.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "emb", "nrm"
    )
    twin = sorted(
        tuple(r)
        for r in ivfpq.search(
            corpus, queries, idx, n_probe=2, rerank=50, top_k=5
        ).collect()
    )
    assert served == twin

    deleted = {
        r.vec_id
        for r in corpus.filter(F.expr(sim._IVFPQM_DELETE))
        .select("vec_id")
        .collect()
    }
    assert deleted, "delete slice empty — the lifecycle test is vacuous"
    assert not deleted & {n for _, n, _ in served}

    # build-once: a second serve call must not touch the store
    path = sim.ensure_ivfpq_maintained_index(spark, sf_dir)
    mtime = os.path.getmtime(os.path.join(path, "codes"))
    again = sorted(
        tuple(r) for r in sim.q_emb_ivfpq_maint(spark, sf_dir).collect()
    )
    assert again == served
    assert os.path.getmtime(os.path.join(path, "codes")) == mtime


def test_saved_index_compaction_pays_append_debt(
    spark, tmp_path, corpus, queries, index, exact_top5
):
    """r14: the maintained saved index accretes one file set per
    touched cell per append; compact_saved_index folds to one file per
    cell with bit-identical codes and identical search results."""
    from sec_financial_pipeline_spark.operators import ivfpq

    path = str(tmp_path / "maint")
    base = corpus.filter(F.col("vec_id") < 200)
    seeds = base.filter(
        (F.col("vec_id") >= 16) & (F.col("vec_id") < 24)
    ).select(
        (F.col("vec_id") - 16).cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    idx = ivfpq.build_index(base, seeds, list(range(24, 32)), _SLICES, n_iter=1)
    ivfpq.save_index(idx, path)
    for lo in range(200, 280, 20):  # 4 appends accrete per-cell files
        ivfpq.append_to_saved_index(
            spark, path,
            corpus.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 20)),
        )
    debt = ivfpq.saved_index_debt(spark, path)
    cols = ["vec_id", "cell", "m", "code"]
    before_codes = sorted(
        map(tuple, ivfpq.load_index(spark, path).codes.select(*cols).collect())
    )
    sub = corpus.filter(F.col("vec_id") < 280)
    before = sorted(
        map(tuple, ivfpq.search(
            sub, queries, ivfpq.load_index(spark, path),
            n_probe=2, rerank=50, top_k=5,
        ).collect())
    )
    n_after = ivfpq.compact_saved_index(spark, path)
    assert n_after < debt, (debt, n_after)
    n_cells = ivfpq.load_index(spark, path).codes.select("cell").distinct().count()
    assert n_after == n_cells  # one file per live cell partition
    assert sorted(
        map(tuple, ivfpq.load_index(spark, path).codes.select(*cols).collect())
    ) == before_codes
    after = sorted(
        map(tuple, ivfpq.search(
            sub, queries, ivfpq.load_index(spark, path),
            n_probe=2, rerank=50, top_k=5,
        ).collect())
    )
    assert after == before
