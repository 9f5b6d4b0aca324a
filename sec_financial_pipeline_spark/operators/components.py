"""Connected components over an edge list — duplicate-cluster closure.

Pairwise near-dup detection (MinHash/LSH, SimHash, cosine) emits *pairs*;
real dedup needs the transitive closure: if A~B and B~C, then {A,B,C} is
ONE cluster with one canonical representative, even when (A,C) was never
itself a candidate pair. This operator labels every node with the minimum
node id reachable from it (the cluster representative).

Algorithm: alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", 2014) over the
canonically-oriented edge set ``(hi, lo)`` with ``hi > lo``:

- **large-star**: every node ``v`` connects its strictly-greater
  neighbors to ``m(v) = min(neighborhood(v) + {v})`` — one partitioned
  window ``min`` over the symmetrized adjacency, no join;
- **small-star**: every node ``v`` connects its smaller neighbors (and
  itself) to their minimum — one partitioned window ``min`` over the
  already-canonical edges.

Both phases preserve connectivity and only ever re-point edges at
*smaller* ids, so the edge set contracts monotonically toward a forest
of stars rooted at each component's minimum id. Versus the min-label
pointer-jumping loop this replaced (git history): the state is ONE
shrinking edge table instead of a label table + static edge table, a
batch is 3 exchanges instead of ~10 (two windows + one distinct; no
label join, no jump self-join), and a near-clique LSH dup graph becomes
a star forest in a single alternation, so the scheduling-round term —
which dominates wall time at small SF and was this family's most
load-sensitive bench row — drops ~2x (measured: CC term 26 -> 12 jobs
at sf0.01, full doc_dup_clusters pipeline 46 -> 31).

Convergence detection stays ONE exact scalar aggregate per batch, no
join against the previous round (same discipline as the decimal-sum
check it replaces, and exact at any id range): the alternation's
fixpoint is a star forest, and a canonically-oriented DISTINCT edge
set is a star forest **iff no node appears on both the hi and lo side
AND no hi carries more than one edge**. Both conditions are necessary:
hi/lo-disjoint alone admits two-level forests where one hi attaches to
two roots — e.g. mid-contraction state {(3,1),(5,1),(3,2),(6,2)}
(reached from edges [(5,3),(6,3),(5,1),(6,2)], ONE component with min
1) is hi/lo-disjoint but node 3 still bridges roots 1 and 2, and
labeling there would SPLIT the component (a review-caught bug in the
first version of this check; the exact case is pinned in
tests/test_components.py and a 5000-graph pure-Python simulation of
these exact semantics fuzzes the loop against union-find). Since both
phases preserve the original components, each final star IS one
original component, and its center (the star's minimum, = min since
lo < hi everywhere) is the component minimum. The check is a single
role groupBy — per node, the count of edges where it is ``hi`` and a
flag for appearing as ``lo`` — counting violators of either condition,
computed on the just-materialized edge table.

Each batch ends with an eager ``localCheckpoint`` — the same
lineage-truncation rationale as ``operators/kmeans.py``: without it,
round i's plan embeds all prior rounds and every action replans the
full history. The edge table only shrinks (distinct per batch bounds
the within-batch <=4x blowup of the two explode/union phases); on a
real cluster use a reliable ``checkpoint`` dir instead. Skew note: the
per-node window ``min`` streams one pass per partition key, so a
power-law super-node (a boilerplate dup cluster member with 10^7
neighbors) is a straggler task, not an OOM — large-star itself is the
mitigation, since after one round all its neighbors point at the
component min and the super-node's adjacency collapses.

The reference has no graph operators at all; this extends the dedup
family the brief mandates (near-dedup at 100 TB is exactly this shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Label each node of the undirected graph ``edges`` with the minimum
    node id in its connected component.

    Returns ``(node, label)`` — one row per distinct node appearing in
    any edge (self-loop-only nodes label themselves). ``max_iter``
    budgets large-star/small-star alternations; a path of diameter d
    needs ~log2(d) alternations (large-star halves path distance to the
    minimum each round), so the default covers any component a real dup
    graph produces."""
    # materialize the edge list BEFORE deriving anything: the union'd /
    # symmetrized branches would otherwise each re-execute whatever
    # (possibly very expensive) pipeline produced the edges — e.g. the
    # full LSH + Jaccard-verify subtree in the near-dup caller — and
    # every contraction batch would re-execute it again (measured 5x
    # slower without this).
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    # canonical orientation hi > lo; self-loops carry membership only
    cur = (
        e.where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .distinct()
    )
    self_nodes = e.where(F.col("a") == F.col("b")).select(F.col("a").alias("node"))

    converged = False
    for _ in range(max_iter):
        # large-star: symmetrize, m(v) = min(v, min of neighbors) via a
        # partitioned window (one exchange, no join-back), emit
        # (u, m(v)) for strictly-greater neighbors u — m <= v < u keeps
        # the canonical orientation for free, and edges dropped here
        # (v's smaller neighbors) re-enter from the mirrored adjacency
        # row where v is the greater endpoint.
        sym = cur.select(F.col("hi").alias("v"), F.col("lo").alias("u")).unionByName(
            cur.select(F.col("lo").alias("v"), F.col("hi").alias("u"))
        )
        mv = F.least(F.col("v"), F.min("u").over(Window.partitionBy("v")))
        ls = (
            sym.withColumn("m", mv)
            .where(F.col("u") > F.col("v"))
            .select(F.col("u").alias("hi"), F.col("m").alias("lo"))
        )
        # small-star: every hi-group points its smaller neighbors (and
        # itself) at the group minimum; explode keeps both the leaf
        # edges (lo, m) and the center edge (hi, m), self-loops drop.
        m2 = F.min("lo").over(Window.partitionBy("hi"))
        ss = (
            ls.withColumn("m", m2)
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("hi").alias("x"), F.col("m").alias("y")),
                        F.struct(F.col("lo").alias("x"), F.col("m").alias("y")),
                    )
                ).alias("s")
            )
            .where(F.col("s.x") != F.col("s.y"))
            .select(F.col("s.x").alias("hi"), F.col("s.y").alias("lo"))
            .distinct()
        )
        cur = ss.localCheckpoint(eager=True)
        # fixpoint <=> star forest <=> (a) hi-side and lo-side node
        # sets are disjoint AND (b) every hi carries exactly one edge
        # (cur is distinct, so edges-per-hi == distinct-lo-per-hi).
        # Disjointness alone is NOT enough — see module docstring for
        # the two-roots counterexample. One exact integer scalar on the
        # just-checkpointed table (no sum, no overflow, no float).
        roles = cur.select(
            F.col("hi").alias("n"), F.lit(1).alias("h"), F.lit(0).alias("l")
        ).unionByName(
            cur.select(F.col("lo").alias("n"), F.lit(0).alias("h"), F.lit(1).alias("l"))
        )
        n_violations = (
            roles.groupBy("n")
            .agg(F.sum("h").alias("eh"), F.max("l").alias("l"))
            .where(
                ((F.col("eh") > 0) & (F.col("l") == 1)) | (F.col("eh") > 1)
            )
            .count()
        )
        if n_violations == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large-star/small-star alternations"
        )
    # star forest -> labels: leaves point at their center, centers and
    # self-loop-only nodes at themselves; groupBy-min folds the three
    # branches exactly (a center's id can also appear as a self-loop
    # node or — never — as a leaf, and min() of equal labels is a no-op).
    return (
        cur.select(F.col("hi").alias("node"), F.col("lo").alias("label"))
        .unionByName(cur.select(F.col("lo").alias("node"), F.col("lo").alias("label")))
        .unionByName(self_nodes.select("node", F.col("node").alias("label")))
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
