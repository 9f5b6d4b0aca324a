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


# ---------------------------------------------------------------------------
# q-error FEEDBACK (VERDICT r13 item 4, the LEO loop closed): a measured
# run records per-edge correction factors; the next plan with the same
# feedback dict prefers observed cardinalities over static NDVs.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def misleading_chain(spark, tmp_path_factory):
    """Three snaptables whose ANALYZE statistics MISLEAD the System-R
    containment estimate on one edge: fact a joins dim b on the
    composite key (x, y) where y == x, so the per-column NDV product
    (80 * 80, capped at rows) overstates the true 80 combinations ~50x
    and the estimator thinks a JOIN b is tiny. The a-c edge (single
    uniform key) estimates exactly. A cost model trusting static NDVs
    therefore seeds with the (actually huge) a-b join."""
    base = tmp_path_factory.mktemp("fbchain")
    a = str(base / "a")
    b = str(base / "b")
    c = str(base / "c")
    T.create(
        spark.createDataFrame(
            [(i % 80, i % 80, i % 50, i) for i in range(4000)],
            "x bigint, y bigint, z bigint, payload bigint",
        ).repartition(4),
        a,
    )
    T.create(
        spark.createDataFrame(
            [(i % 80, i % 80, i) for i in range(800)],
            "x bigint, y bigint, b_payload bigint",
        ).repartition(2),
        b,
    )
    T.create(
        spark.createDataFrame(
            [(i, i) for i in range(50)], "z bigint, c_payload bigint"
        ),
        c,
    )
    for p, cols in ((a, ["x", "y", "z"]), (b, ["x", "y"]), (c, ["z"])):
        T.analyze_table(spark, p, cols=cols)
    return {"a": a, "b": b, "c": c}


EDGES_FB = [("a", "b", ["x", "y"]), ("a", "c", ["z"])]


def test_feedback_replans_misestimated_chain(spark, misleading_chain):
    """The done-criterion loop: first run measures q-error > 2 on the
    composite-key edge and records factors; the REPLANNED chain takes
    a different order whose TRUE total intermediate rows are
    measurably smaller, and the second measured run's q-error
    collapses toward 1."""
    fb: dict = {}
    first = T.chain_qerror(spark, misleading_chain, EDGES_FB, feedback=fb)
    assert first["max_qerror"] > 2, first  # the static model is wrong
    assert fb, "no factors recorded"
    # static model seeds with the misestimated a-b edge
    assert first["order"][:2] in (["a", "b"], ["b", "a"]), first["order"]

    second = T.chain_qerror(spark, misleading_chain, EDGES_FB, feedback=fb)
    assert second["order"] != first["order"], (first, second)
    true_total_first = sum(s["true_rows"] for s in first["steps"])
    true_total_second = sum(s["true_rows"] for s in second["steps"])
    assert true_total_second < true_total_first, (first, second)
    # observed cardinalities now drive the estimates
    assert second["max_qerror"] < 2, second
    # and the factors are consumed by the public planner entry too
    plan = T.suggest_join_chain(
        spark, misleading_chain, EDGES_FB, feedback=fb
    )
    assert plan["order"] == second["order"]
    assert plan["feedback_edges"] >= 1


def test_feedback_converges_not_oscillates(spark, misleading_chain):
    """Factors COMPOSE (new = old * residual), so repeated measured
    runs settle: by the third run the recorded factors move by < 10%
    and the order is stable."""
    fb: dict = {}
    T.chain_qerror(spark, misleading_chain, EDGES_FB, feedback=fb)
    snap2 = None
    for _ in range(2):
        prev = dict(fb)
        rep = T.chain_qerror(spark, misleading_chain, EDGES_FB, feedback=fb)
        snap2 = snap2 or rep["order"]
        assert rep["order"] == snap2
    for k, v in fb.items():
        assert abs(v - prev[k]) / prev[k] < 0.1, (k, prev[k], v)


def test_feedback_key_distinguishes_filters(spark, misleading_chain):
    """A factor learned under a filter must not correct an unfiltered
    plan: the feedback keys embed each side's predicate."""
    fb: dict = {}
    T.chain_qerror(
        spark, misleading_chain, EDGES_FB, filters={"a": "z = 7"},
        feedback=fb,
    )
    assert fb
    plan = T.suggest_join_chain(spark, misleading_chain, EDGES_FB,
                                feedback=fb)
    assert plan["feedback_edges"] == 0  # filtered keys don't match


def test_dp_remains_optimal_under_random_feedback():
    """Subset-determinedness survives the feedback (the documented DP
    trap re-checked with factors in play): over seeded random graphs
    with random per-edge correction factors, the DP's corrected total
    intermediate bytes never exceed the greedy's nor any sampled valid
    left-deep order's."""
    from tests.test_snaptable import _random_chain_instance

    from sec_financial_pipeline_spark.sources.snaptable import planner as P

    key = "total_intermediate_bytes"
    for trial in range(40):
        est, edges, names, rng = _random_chain_instance(trial + 10_000)
        fb = {
            P._edge_id(a, b, k): rng.choice([0.01, 0.1, 0.5, 2.0, 10, 100])
            for a, b, k in edges
        }
        d = P._best_order_dp(est, edges, names, fb)
        g = P._best_order_greedy(est, edges, names, fb)
        d_cost = P._order_cost(est, edges, d, fb)[key]
        assert d_cost <= P._order_cost(est, edges, g, fb)[key], (trial, d, g)
        adj = {}
        for a, b, _ in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for _ in range(20):
            order = [rng.choice(names)]
            while len(order) < len(names):
                reach = sorted(
                    set().union(*(adj[t] for t in order)) - set(order)
                )
                order.append(rng.choice(reach))
            assert d_cost <= P._order_cost(est, edges, order, fb)[key], (
                trial, d, order
            )


def test_feedback_store_roundtrip_and_crash_tolerance(spark, tmp_path):
    """Persisted LEO store: save/load round-trips exactly; a torn main
    file (crash mid-overwrite) falls back to the fully-staged .tmp;
    an absent store reads as empty; main+tmp both torn raises instead
    of silently resetting every factor to 1."""
    import os

    store = str(tmp_path / "fbstore")
    assert T.load_chain_feedback(spark, store) == {}
    fb = {"edge-a": 0.02, "edge-b": 37.5}
    T.save_chain_feedback(spark, store, fb)
    assert T.load_chain_feedback(spark, store) == fb

    main = os.path.join(store, "_chain_feedback.json")
    with open(main, "w") as f:
        f.write('{"edge-a": 0.0')  # torn overwrite
    assert T.load_chain_feedback(spark, store) == fb  # staged copy

    with open(main + ".tmp", "w") as f:
        f.write("garbage")
    with pytest.raises(ValueError, match="unreadable"):
        T.load_chain_feedback(spark, store)


def test_cli_learn_replans_across_invocations(
    spark, capsys, misleading_chain, tmp_path
):
    """The durable loop end to end: two `snap join --learn STORE`
    invocations (separate CLI calls — the factors travel only through
    the store). The first measures the misestimate and persists
    factors; the second replans from them: different order, q-error
    collapsed under 2."""
    import json

    from sec_financial_pipeline_spark.cli import main

    store = str(tmp_path / "fb")

    def run():
        argv = ["snap", "join",
                "--table", f"a={misleading_chain['a']}",
                "--table", f"b={misleading_chain['b']}",
                "--table", f"c={misleading_chain['c']}",
                "--edge", "a:b:x,y", "--edge", "a:c:z",
                "--learn", store, "--limit", "1"]
        assert main(argv, spark=spark) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    first = run()
    assert first["max_qerror"] > 2
    assert first["feedback_edges"] == 0  # store was empty at plan time
    second = run()
    assert second["feedback_edges"] >= 1
    assert second["order"] != first["order"]
    assert second["max_qerror"] < 2
