"""Unit tests for connected components (operators/components)."""

from __future__ import annotations

import pytest

from sec_financial_pipeline_spark.operators.components import connected_components


def _labels(df):
    return sorted((r.node, r.label) for r in df.collect())


def test_chain_transitivity(spark):
    # 1-2, 2-3, 3-4: one component even though (1,4) is not an edge —
    # exactly the under-merge pairwise dedup suffers from
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src INT, dst INT")
    assert _labels(connected_components(edges)) == [
        (1, 1),
        (2, 1),
        (3, 1),
        (4, 1),
    ]


def test_multiple_components_and_edge_direction(spark):
    # labels must ignore edge direction (9->5 still pulls 9 down to 5)
    edges = spark.createDataFrame(
        [(9, 5), (5, 7), (2, 1), (30, 30)], "src INT, dst INT"
    )
    assert _labels(connected_components(edges)) == [
        (1, 1),
        (2, 1),
        (5, 5),
        (7, 5),
        (9, 5),
        (30, 30),
    ]


def test_long_chain_converges_fast(spark):
    # star contraction: a 40-node path must converge in O(log n)
    # alternations (large-star halves the distance-to-minimum each
    # round), so max_iter=8 suffices where plain propagation needs 39
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src INT, dst INT"
    )
    out = connected_components(edges, max_iter=8)
    assert _labels(out) == [(i, 0) for i in range(41)]


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(40)], "src INT, dst INT")
    with pytest.raises(RuntimeError):
        connected_components(edges, max_iter=1)


def test_huge_ids_exact_convergence_sum(spark):
    # convergence detection must stay exact at any id range: the star
    # check is an integer role-count (no sum at all), but greatest/
    # least/min over ids near 2^62 must not lose bits anywhere
    base = 1 << 62
    edges = spark.createDataFrame(
        [(base + i, base + i + 1) for i in range(16)], "src LONG, dst LONG"
    )
    out = connected_components(edges, max_iter=8)
    assert _labels(out) == [(base + i, base) for i in range(17)]


def test_128_chain_logarithmic_rounds(spark):
    # diameter 127: plain min-propagation needs 127 rounds; star
    # contraction must land it within 10 alternations
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(127)], "src INT, dst INT"
    )
    out = connected_components(edges, max_iter=10)
    assert _labels(out) == [(i, 0) for i in range(128)]


def _union_find(edges):
    """Pure-Python ground truth: min-id representative per component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((n, find(n)) for n in parent)


@pytest.mark.parametrize(
    "name,edges",
    [
        ("clique10", [(i, j) for i in range(10) for j in range(i)]),
        ("star_out", [(0, i) for i in range(1, 50)]),
        ("star_in", [(i, 0) for i in range(1, 50)]),
        ("two_cliques_bridge",
         [(i, j) for i in range(6) for j in range(i)]
         + [(100 + i, 100 + j) for i in range(6) for j in range(i)]
         + [(5, 100)]),
        ("dup_and_reversed", [(1, 2), (2, 1), (1, 2), (3, 2), (2, 3)]),
    ],
)
def test_star_contraction_matches_union_find(spark, name, edges):
    # shape-adversarial graphs (cliques like LSH dup clusters, hub
    # stars like boilerplate super-nodes, bridged components, duplicate
    # and reversed edges) must all match the exact union-find closure
    df = spark.createDataFrame(edges, "src INT, dst INT")
    assert _labels(connected_components(df)) == _union_find(edges)


def test_random_graphs_match_union_find(spark):
    import random

    rng = random.Random(11)
    for _ in range(4):
        n = rng.randint(5, 120)
        edges = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(rng.randint(1, 3 * n))
        ]
        df = spark.createDataFrame(edges, "src LONG, dst LONG")
        assert _labels(connected_components(df)) == _union_find(edges)


def test_two_roots_counterexample_does_not_split_component(spark):
    """Review-caught convergence bug: after one alternation of
    [(5,3),(6,3),(5,1),(6,2)] the edge set {(3,1),(5,1),(3,2),(6,2)}
    has DISJOINT hi/lo node sets, but node 3 still bridges roots 1 and
    2 — declaring convergence there splits one component into {1,3,5}
    and {2,6}. The fixpoint check must also require one edge per hi."""
    edges = spark.createDataFrame(
        [(5, 3), (6, 3), (5, 1), (6, 2)], "src INT, dst INT"
    )
    assert _labels(connected_components(edges)) == [
        (1, 1), (2, 1), (3, 1), (5, 1), (6, 1),
    ]


def _star_cc_sim(edges, max_iter=25):
    """Pure-Python mirror of connected_components' EXACT DataFrame
    semantics (canonical orientation, large-star, small-star, distinct,
    the two-condition star-forest check, the final label fold) — lets
    the ALGORITHM be fuzzed against union-find at volumes a Spark loop
    cannot (5000 graphs below; 31/2000 failed under the old
    disjointness-only check)."""
    from collections import Counter, defaultdict

    cur = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    self_nodes = {a for a, b in edges if a == b}
    converged = False
    for _ in range(max_iter):
        adj = defaultdict(set)
        for hi, lo in cur:
            adj[hi].add(lo)
            adj[lo].add(hi)
        ls = set()
        for v, nb in adj.items():
            m = min([v, *nb])
            for u in nb:
                if u > v:
                    ls.add((u, m))
        by_hi = defaultdict(set)
        for hi, lo in ls:
            by_hi[hi].add(lo)
        ss = set()
        for hi, los in by_hi.items():
            m = min(los)
            for lo in los:
                if lo != m:
                    ss.add((lo, m))
            if hi != m:
                ss.add((hi, m))
        cur = ss
        eh = Counter(hi for hi, _ in cur)
        lo_set = {lo for _, lo in cur}
        if not (
            any(n in lo_set for n in eh) or any(c > 1 for c in eh.values())
        ):
            converged = True
            break
    assert converged, "simulation did not converge"
    labels = {}
    for hi, lo in cur:
        labels[hi] = min(labels.get(hi, hi), lo)
        labels.setdefault(lo, lo)
    for n in self_nodes:
        labels.setdefault(n, n)
    return sorted(labels.items())


def test_simulated_algorithm_fuzz_5000_graphs_vs_union_find():
    import random

    rng = random.Random(2024)
    for case in range(5000):
        n = rng.randint(2, 40)
        edges = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(rng.randint(1, 2 * n))
        ]
        assert _star_cc_sim(edges) == _union_find(edges), (case, edges)


def test_simulation_mirrors_spark_on_structured_cases(spark):
    # the sim is only a valid fuzz proxy if it matches the real
    # operator wherever both run — pin on the adversarial shapes
    cases = [
        [(5, 3), (6, 3), (5, 1), (6, 2)],
        [(i, i + 1) for i in range(17)],
        [(0, i) for i in range(1, 20)],
        [(9, 5), (5, 7), (2, 1), (30, 30)],
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src LONG, dst LONG")
        assert _labels(connected_components(df)) == _star_cc_sim(edges)


def test_leakage_safe_split_never_straddles_near_dup_pairs(spark, sf_dir):
    """The point of cluster-keyed splitting: NO verified near-dup pair
    may straddle train/val/test (a per-document hash split leaks — a
    doc and its near-duplicate land in different splits and eval
    rewards memorization). Also: every doc assigned exactly once, and
    a naive per-doc split on the same corpus DOES straddle (the test
    is non-vacuous)."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.sampling import hash_uniform
    from sec_financial_pipeline_spark.registry.similarity import (
        _near_dup_pairs,
        leakage_safe_split,
    )

    d, pairs = _near_dup_pairs(spark, sf_dir)
    assigned = leakage_safe_split(d, "doc_id", pairs)
    assert assigned.count() == d.count()
    assert assigned.select("doc_id").distinct().count() == d.count()

    sp = assigned.select("doc_id", "split")
    straddle = (
        pairs.join(sp.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
        .join(sp.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
        .filter(F.col("sa") != F.col("sb"))
    )
    assert straddle.count() == 0
    assert pairs.count() > 0  # there ARE pairs to straddle

    # non-vacuity: the naive per-document split DOES leak on this corpus
    naive = d.select(
        "doc_id",
        F.when(hash_uniform(F.col("doc_id"), "split1") >= 0.5, "a")
        .otherwise("b")
        .alias("split"),
    )
    naive_straddle = (
        pairs.join(naive.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
        .join(naive.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
        .filter(F.col("sa") != F.col("sb"))
    )
    assert naive_straddle.count() > 0
