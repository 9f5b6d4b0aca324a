"""SemDeDup — semantic (embedding-space) near-duplicate pruning
(Abbas et al. 2023; SURVEY §2.9 north-star: the dedup family's third
modality after lexical MinHash/SimHash and exact hashing).

The scale trick is the paper's: k-means first, then pairwise cosine
ONLY within each cluster. All-pairs cosine is O(N^2); with k clusters
of roughly N/k members the candidate set drops to O(N^2 / k), and each
cluster's pair block is an independent, shuffle-local self-join — at
100 TB, k grows with the corpus so the per-cluster block stays bounded
(the same candidate-bounding discipline as the LSH band join and IVF
cells; the cross-cluster pairs k-means severs are exactly the far
pairs the threshold would reject anyway — approximation error
concentrates BELOW tau, like every ANN operator here, and the witness
test quantifies it).

Everything reuses existing exact operators: spherical k-means
(`operators/kmeans.lloyd` — deterministic, decimal-exact centroids),
the rounded-cosine convention of the ANN family, and star-contraction
connected components (`operators/components`) so a duplicate GROUP
keeps exactly one representative (min vec_id) even through chains
(a~b~c with cos(a,c) < tau still collapses to one survivor, matching
the paper's per-group keep-one semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import kmeans
from sec_financial_pipeline_spark.operators import similarity as S
from sec_financial_pipeline_spark.operators.components import (
    connected_components,
)


def _prep(e: DataFrame) -> DataFrame:
    """(vec_id, emb, nrm) with norms precomputed once."""
    cols = set(e.columns)
    if "nrm" not in cols:
        e = e.withColumn("nrm", S.norm(F.col("emb")))
    return e.select("vec_id", "emb", "nrm")


def semantic_pairs(
    e: DataFrame, k: int, tau: float, n_iter: int = 3, seed_base: int = 0
) -> DataFrame:
    """Within-cluster semantic near-dup pairs: ``(id_a, id_b, cos)``
    with ``id_a < id_b`` and rounded cosine >= ``tau``. Seeds are the
    ``k`` vectors with ids in ``[seed_base, seed_base + k)`` — the
    deterministic fixed-input-seed convention of the IVF/PQ trainers
    (no sampling, no window)."""
    e = _prep(e).persist()
    try:
        seeds = e.filter(
            (F.col("vec_id") >= seed_base) & (F.col("vec_id") < seed_base + k)
        ).select(
            (F.col("vec_id") - seed_base).cast("int").alias("cluster"),
            F.col("emb").alias("cvec"),
            F.col("nrm").alias("c_nrm"),
        )
        cents = kmeans.lloyd(e, seeds, n_iter)
        assign = kmeans.assign_clusters(e, cents)
        m = assign.join(e, "vec_id")
        a = m.select(
            "cluster",
            F.col("vec_id").alias("id_a"),
            F.col("emb").alias("emb_a"),
            F.col("nrm").alias("nrm_a"),
        )
        b = m.select(
            "cluster",
            F.col("vec_id").alias("id_b"),
            F.col("emb").alias("emb_b"),
            F.col("nrm").alias("nrm_b"),
        )
        pairs = (
            a.join(b, "cluster")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.round(
                    S.dot(F.col("emb_a"), F.col("emb_b"))
                    / (F.col("nrm_a") * F.col("nrm_b")),
                    6,
                ).alias("cos"),
            )
            .filter(F.col("cos") >= tau)
        )
        # materialize before unpersisting the prep the plan depends on
        return pairs.localCheckpoint(eager=True)
    finally:
        e.unpersist()


def semantic_dedup(
    e: DataFrame, k: int, tau: float, n_iter: int = 3
) -> DataFrame:
    """Survivor set after semantic dedup: ``(vec_id, keep)`` for every
    input vector, ``keep = false`` iff the vector is a non-representative
    member of a semantic duplicate GROUP (connected component of the
    within-cluster pair graph; representative = min vec_id)."""
    pairs = semantic_pairs(e, k, tau, n_iter)
    labels = connected_components(pairs, "id_a", "id_b")
    drops = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("vec_id")
    )
    return _prep(e).select("vec_id").join(
        drops.withColumn("__drop", F.lit(True)), "vec_id", "left"
    ).select(
        "vec_id", F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep")
    )
