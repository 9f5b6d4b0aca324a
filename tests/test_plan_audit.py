"""Physical-plan regression audit (PERF.md "plan audits" made executable).

Correctness tests prove the answers; these prove the *plans* stay the
ones designed for 100 TB: filters pushed to the scan, dims broadcast,
rank-pushdown on the serving window, heap-based top-k, persisted reuse of
the shingle table, and — globally — no cartesian/nested-loop join sneaks
into any registry query (the one sanctioned BroadcastNestedLoop is the
bounded broadcast-codebook/constant cross joins, which only ever carry a
broadcast side).
"""

from __future__ import annotations

import pytest

from sec_financial_pipeline_spark.registry import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _fn_plan(spark, sf_dir, fn) -> str:
    """Plan of an unregistered constituent (merged under a section-tagged
    union for the driver window, but still audited standalone here)."""
    df = fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_serving_plan_broadcast_and_rank_pushdown(spark, sf_dir):
    from sec_financial_pipeline_spark.registry.sec_domain import q_metric_series

    plan = _fn_plan(spark, sf_dir, q_metric_series)
    assert "BroadcastHashJoin" in plan  # alias-map dim join never shuffles facts
    assert "WindowGroupLimit" in plan  # dedup rank computed pre-shuffle
    assert "CartesianProduct" not in plan


def test_scan_pushdown_reaches_parquet(spark, sf_dir):
    plan = _plan(spark, sf_dir, "rel_scan_pushdown")
    assert "PushedFilters: [" in plan
    # column pruning: the lineitem scan must not read all 11 columns
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert read_schema.count(",") < 6


def test_topk_uses_heap_not_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "rel_topk")
    assert "TakeOrderedAndProject" in plan


def test_near_dedup_reuses_persisted_shingles(spark, sf_dir):
    plan = _plan(spark, sf_dir, "doc_near_dedup_end2end")
    # the exploded shingle table must come from cache, not be re-derived
    # per consumer (4 consumers -> at least 4 cache reads)
    assert plan.count("InMemoryTableScan") >= 4
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_is_bucketed_equi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "evt_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ratio_matrix_is_one_fused_plan(spark, sf_dir):
    """Eleven ratio columns from ONE alias broadcast + ONE dedup window +
    ONE pivot — not eleven per-metric series plans joined pairwise."""
    from sec_financial_pipeline_spark.registry.sec_domain import q_ratio_matrix

    plan = _fn_plan(spark, sf_dir, q_ratio_matrix)
    assert plan.count("BroadcastHashJoin") == 1  # the alias dim join
    assert "SortMergeJoin" not in plan  # no series-vs-series join at all
    assert "WindowGroupLimit" in plan  # dedup rank pushdown


def test_quarterly_serving_group_limit_pushdown(spark, sf_dir):
    """The years*4 per-(ticker, metric) clip must plan as a group-limit
    (rank pushdown), so only k rows per group survive the sort."""
    from sec_financial_pipeline_spark.registry.sec_domain import (
        q_quarterly_serving,
    )

    plan = _fn_plan(spark, sf_dir, q_quarterly_serving)
    assert plan.count("WindowGroupLimit") >= 2  # dedup window + serving clip
    assert "CartesianProduct" not in plan


def test_sign_lsh_candidates_read_cached_codes(spark, sf_dir):
    """Both self-join sides of the banded candidate join must read the
    persisted code table — exchange reuse can't dedupe them (the sign
    projection embeds HOF lambdas, which never canonicalize equal), so
    without the cache the whole projection pipeline runs twice."""
    plan = _plan(spark, sf_dir, "emb_cosine_near_dup")
    assert plan.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unbounded_nested_loops_anywhere(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    # BroadcastNestedLoopJoin is allowed only with a broadcast build side
    # (bounded small side by construction); a streamed-streamed nested
    # loop would be quadratic at scale
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        assert "BuildRight" in frag.splitlines()[0] or "BuildLeft" in frag.splitlines()[0], name


def test_media_payload_never_crosses_a_shuffle(spark, sf_dir):
    """The multimodal contract at 100 TB: payload bytes ride only from
    the scan into the in-partition mapInPandas; every Exchange in the
    plan moves the extracted feature/stat columns, never the binary."""
    import re

    plan = _plan(spark, sf_dir, "mm_media_stats")
    for frag in plan.split("Exchange")[1:]:
        header = frag.splitlines()[0]
        # the binary column renders as `payload#N`; `payload_hash#N` is
        # the extracted stat and is exactly what SHOULD shuffle
        assert not re.search(r"payload#\d", header), (
            "binary payload entered a shuffle"
        )
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_chunk_assembly_has_no_global_window(spark, sf_dir):
    """Both packing phases must stay partitioned: the only windows are
    the per-bucket running sum and the tiny subtotal-table cumsum — a
    corpus-wide single-task window would be the 100 TB killer."""
    plan = _plan(spark, sf_dir, "doc_chunk_assembly")
    # every Window's partition spec must be non-empty except the one
    # over the per-bucket subtotal table (bounded rows by construction)
    import re

    specs = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
    unpartitioned = [s for s in specs if s.strip().startswith("__bkt") is False
                     and "ASC NULLS FIRST" in s and "," not in s.split("ASC")[0]]
    # the subtotal cumsum orders by __bkt alone; anything else
    # unpartitioned would window the corpus
    for s in unpartitioned:
        assert "__bkt" in s, f"corpus-wide window detected: {s}"


_WINDOWSPEC_RE = __import__("re").compile(r"windowspecdefinition\(([^)]*)")


def _unpartitioned_window_specs(plan: str) -> list[str]:
    """windowspecdefinition args whose FIRST token is an order column
    (carries ASC/DESC) — i.e. an empty partition spec. Spark moves all
    rows of such a window to one task ("No Partition Defined" warning),
    the 100 TB killer unless the input is provably bounded."""
    out = []
    for args in _WINDOWSPEC_RE.findall(plan):
        first = args.split(",")[0].strip()
        if " ASC" in first or " DESC" in first:
            out.append(first)
    return sorted(set(out))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unpartitioned_windows_anywhere(spark, sf_dir, name):
    """Every registered query must plan with zero unpartitioned
    WindowExecs — global prefix sums go through the two-phase bucketed
    pattern (operators/packing.py), global ranks through heap top-k plus
    bounded preceding-count. Keeps the bench tail free of WindowExec
    single-partition warnings and makes any regression a test failure,
    not a log line."""
    plan = _plan(spark, sf_dir, name)
    specs = _unpartitioned_window_specs(plan)
    assert not specs, f"{name}: unpartitioned global window over {specs}"


def test_candidate_pair_output_stays_near_linear(spark, sf_dir):
    """Output-cardinality guard for every candidate-pair generator
    (VERDICT r06 item 4, the standing form of the doc_near_pairs d=10
    lesson): a generator whose candidate set grows toward the N^2 pair
    space is a retune bug — it OOMs the driver collect and melts the
    verify join long before any sweep runs. Bound each at c*N for the
    test corpus; c is generous (real dups cluster), the quadratic blowup
    these catch is orders of magnitude past it.
    """
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # MinHash banded LSH (doc_near_pairs / near-dedup band join)
    sig = S.minhash_signatures(docs, "doc_id", "text")
    assert S.lsh_candidate_pairs(sig, "doc_id").count() <= 6 * n_docs

    # SimHash pigeonhole blocks at the production d=3 retune
    sh32 = S.simhash(docs, "doc_id", "text")
    assert S.hamming_pairs(sh32, "doc_id", max_distance=3).count() <= 6 * n_docs

    from sec_financial_pipeline_spark.registry.similarity import (
        _MP_BITS,
        _SIGN_BITS,
        _sign_planes,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    n_vec = emb.count()

    # banded sign-LSH over embeddings at the production band shape
    codes = S.sign_lsh_bands(emb, "vec_id", _sign_planes(emb), _SIGN_BITS).persist()
    try:
        assert S.sign_lsh_candidate_pairs(codes, "vec_id").count() <= 8 * n_vec
    finally:
        codes.unpersist()

    # multi-probe variant widens candidates by design (tuned operating
    # point accepts ~27 pairs/vector at sf0.01, PERF.md r6) — the guard
    # is against a quadratic blowup, so the linear constant is wider
    from sec_financial_pipeline_spark.registry.similarity import (
        _MP_BANDS,
        _SIGN_BASE,
    )

    planes_mp = emb.filter(
        (F.col("vec_id") >= _SIGN_BASE)
        & (F.col("vec_id") < _SIGN_BASE + _MP_BANDS * _MP_BITS)
    ).select(
        (F.col("vec_id") - _SIGN_BASE).alias("h_id"),
        F.col("emb").alias("h_emb"),
    )
    mp_codes = S.sign_lsh_bands(emb, "vec_id", planes_mp, _MP_BITS).persist()
    try:
        assert (
            S.sign_lsh_multiprobe_pairs(mp_codes, "vec_id", _MP_BITS).count()
            <= 40 * n_vec
        )
    finally:
        mp_codes.unpersist()


def test_contamination_scan_is_column_pruned(spark, sf_dir):
    """The contamination audit reads only (doc_id, text, source) from
    the documents scan — payload-width discipline: n_chars/lang never
    reach the parquet reader."""
    from sec_financial_pipeline_spark.registry.similarity import (
        q_doc_contamination,
    )

    plan = _fn_plan(spark, sf_dir, q_doc_contamination)
    for chunk in plan.split("ReadSchema: ")[1:]:
        schema = chunk.splitlines()[0]
        assert "n_chars" not in schema and "lang" not in schema, schema


def test_epoch_shuffle_window_is_partitioned(spark, sf_dir):
    """The shuffle's rank window is partitioned by shard — never a
    single-task global window (the zero-unpartitioned-windows rule,
    asserted directly on this operator's plan)."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.sampling import epoch_shuffle

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    plan = epoch_shuffle(d, "doc_id", 8, seed="audit")._jdf.queryExecution(
    ).executedPlan().toString()
    assert _unpartitioned_window_specs(plan) == []


def test_boilerplate_frequency_agg_is_partial_and_drop_is_antijoin(spark, sf_dir):
    """Boilerplate removal's physical plan: the per-line distinct-doc
    count must be a two-phase (partial-aggregable) HashAggregate, the
    drop a LeftAnti join, and nothing may plan a cartesian product —
    the shapes that keep the operator linear at 100 TB."""
    from sec_financial_pipeline_spark.registry.llm_text import q_doc_boilerplate

    plan = q_doc_boilerplate(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # countDistinct plans as the two-exchange partial_count(distinct ...)
    # shape: partial aggregation markers must be present
    assert "partial_count" in plan or "partial_" in plan
