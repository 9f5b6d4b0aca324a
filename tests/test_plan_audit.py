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
