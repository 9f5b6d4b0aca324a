"""Deterministic spherical k-means (Lloyd iterations) for IVF codebook
training (SURVEY §2.9 similarity-search; the reference has no vector
operators — this is north-star scope).

Every step is an exact, engine-independent DataFrame composition:

- assignment = argmax of ROUNDED cosine with a cluster-id tie-break (a
  total order, so ties never depend on partitioning), computed as one
  partial-aggregable ``max_by`` — no window sort (measured ~30% faster
  per iteration than the row_number formulation, and at scale a partial
  agg shuffles one winner per (partition, vec) instead of sorting);
- centroid update = per-(cluster, dim) exact DECIMAL(30,6) means over the
  ORIGINAL vector components (order-independent — raw components are
  exact at 6 decimals in this corpus). A single ``groupBy(cluster)``
  with d side-by-side decimal sums was measured SLOWER than the
  posexplode + (cluster, dim) agg used here — 65 wide agg buffers beat
  the saved shuffle only on paper;
- seeds are fixed input vectors, not random samples.

Shape at 100 TB: each iteration is one broadcast of the k x d codebook
(a few KB), one narrow map over the corpus (N x k cosines), and
partial-aggregable groupBys — Lloyd's classic Spark formulation. No
collect of vector data; only the codebook crosses the driver boundary if
the caller wants it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import similarity as S


#: argmax ordering: highest cosine, ties to the SMALLER cluster id
#: (struct max compares cos first, then the negated id).
def _best() -> Column:
    return F.struct(F.col("cos"), (-F.col("cluster")).alias("neg_cluster"))


def assign_clusters(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Hard assignment: for each vector in ``e`` (vec_id, emb, nrm), the
    cluster in ``cents`` (cluster, cvec, c_nrm) with the highest rounded
    cosine; ties break to the smaller cluster id."""
    proj = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cluster",
        F.round(
            S.dot(F.col("emb"), F.col("cvec")) / (F.col("nrm") * F.col("c_nrm")), 6
        ).alias("cos"),
    )
    return proj.groupBy("vec_id").agg(
        F.max_by("cluster", _best()).alias("cluster")
    )


def update_centroids(e: DataFrame, assign: DataFrame) -> DataFrame:
    """Exact per-(cluster, dim) decimal means over member vectors ->
    (cluster, cvec, c_nrm). Clusters that lost every member disappear
    (standard Lloyd behavior; deterministic in any engine)."""
    member_dims = (
        assign.join(e, "vec_id")
        .select("cluster", F.posexplode("emb").alias("pos", "v"))
        .select("cluster", (F.col("pos") + 1).alias("dim"), "v")
    )
    means = member_dims.groupBy("cluster", "dim").agg(
        (F.sum(F.col("v").cast("decimal(30,6)")).cast("double") / F.count("v")).alias("v")
    )
    return (
        means.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "v"))).alias("s"))
        .select("cluster", F.expr("transform(s, x -> x.v)").alias("cvec"))
        .select("cluster", "cvec", S.norm(F.col("cvec")).alias("c_nrm"))
    )


def lloyd(
    e: DataFrame, seeds: DataFrame, n_iter: int, materialize: bool = True
) -> DataFrame:
    """``n_iter`` Lloyd iterations from ``seeds`` (cluster, cvec, c_nrm);
    returns the trained codebook in the same shape.

    ``materialize`` eagerly truncates the codebook's lineage after each
    iteration (``localCheckpoint``): without it, iteration i's plan embeds
    all prior iterations, so Catalyst replans — and the executor re-scans
    the corpus for — every historical pass on every action (measured: 20
    scans of the embeddings parquet for 2 iterations + probe). The
    codebook is k x d doubles (a few KB), so the checkpoint cost is nil.
    On a real cluster, swap ``localCheckpoint`` for a reliable
    ``checkpoint`` dir so executor loss can't drop a cached iteration."""
    cents = seeds
    for _ in range(n_iter):
        cents = update_centroids(e, assign_clusters(e, cents))
        if materialize:
            cents = cents.localCheckpoint(eager=True)
    return cents
