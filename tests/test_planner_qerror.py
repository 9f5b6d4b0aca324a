"""Cost-model telemetry for the Selinger chain planner (VERDICT r10
item 4): estimated vs ACTUAL intermediate cardinalities, gated on
median q-error so the next cost-model change is measurable rather than
vibes. The DP-vs-greedy dominance property itself is pinned separately
(``test_dp_order_optimal_on_random_graphs``, 500 random instances).

The chains here are the testdata snowflake (customer -> nation ->
region), whose FK->PK steps the System-R containment estimate should
get almost exactly right (the only noise is HLL NDV error, ~1.6% at
b=12) — so the gates are tight: a cost-model regression that misses
FK->PK containment moves median q-error far past 1.5.
"""

from __future__ import annotations

import pytest

import sec_financial_pipeline_spark.sources.snaptable as T
from sec_financial_pipeline_spark.registry.pipeline import (
    _ensure_joinchain_demo,
)

EDGES = [("cust", "nat", "nationkey"), ("nat", "reg", "regionkey")]


@pytest.fixture(scope="module")
def chain(spark, sf_dir):
    path = _ensure_joinchain_demo(spark, sf_dir)
    return {
        "cust": f"{path}/cust", "nat": f"{path}/nat", "reg": f"{path}/reg"
    }


def test_fk_pk_chain_qerror_tight(spark, chain):
    rep = T.chain_qerror(spark, chain, EDGES)
    assert len(rep["steps"]) == 2
    for s in rep["steps"]:
        assert s["true_rows"] > 0
        assert s["qerror"] >= 1.0
    # FK->PK containment: both steps preserve the customer count, and
    # the estimator knows it up to HLL error
    assert rep["median_qerror"] <= 1.5, rep
    assert rep["max_qerror"] <= 2.0, rep


def test_filtered_chain_qerror_bounded(spark, chain):
    # an equality filter on the 25-NDV nationkey column shrinks the
    # cust side ~25x; the estimate must track within a small factor
    rep = T.chain_qerror(
        spark, chain, EDGES, filters={"cust": "nationkey = 7"}
    )
    assert all(s["true_rows"] > 0 for s in rep["steps"]), rep
    assert rep["median_qerror"] <= 4.0, rep


def test_qerror_reports_the_planned_order(spark, chain):
    rep = T.chain_qerror(spark, chain, EDGES)
    plan = T.suggest_join_chain(spark, chain, EDGES)
    assert rep["order"] == plan["order"]
    assert rep["planner"] == plan["planner"]
    # estimated rows in the telemetry match the plan's own steps
    assert [s["est_rows"] for s in rep["steps"]] == [
        max(1, s["est_rows"]) for s in plan["steps"]
    ]


def test_chain_qerror_refuses_degenerate_inputs(spark, tmp_path):
    """A telemetry call that could produce an empty q-error list must
    refuse loudly up front (review finding; the upstream planner guards
    cover both shapes — pin them from chain_qerror's entry point)."""
    from sec_financial_pipeline_spark.sources.snaptable import chain_qerror

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (a, b):
        T.create(spark.createDataFrame([(1, "x")], "k bigint, v string"), p)
        T.analyze_table(spark, p)
    with pytest.raises(ValueError, match=">= 2 tables"):
        chain_qerror(spark, {"a": a}, edges=[])
    with pytest.raises(ValueError, match=">= 1 edge"):
        chain_qerror(spark, {"a": a, "b": b}, edges=[])
