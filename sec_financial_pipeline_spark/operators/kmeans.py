"""Deterministic spherical k-means (Lloyd iterations) for IVF / PQ
codebook training (SURVEY §2.9 similarity-search; the reference has no
vector operators — this is north-star scope).

Every step is an exact, engine-independent DataFrame composition:

- assignment = argmax of ROUNDED cosine with a cluster-id tie-break (a
  total order, so ties never depend on partitioning). Since r14 the
  codebook — a bounded (groups x k x d) table of doubles, the same
  class of driver-side value as the BPE merge table — is collected and
  embedded as a CONSTANT-FOLDED literal array, so assignment is a pure
  per-row expression: no crossJoin against a broadcast, no
  groupBy(vec_id) exchange shuffling one winner per vector, and the
  corpus payload never crosses the network during training (guide §8:
  decide with small data, move big rows never). The collected doubles
  round-trip bit-exactly (IEEE binary over Arrow/pickle), and the
  cosine fold order is unchanged, so results are bit-identical to the
  former join formulation;
- centroid update = per-(cluster, dim) exact DECIMAL(30,6) means over
  the ORIGINAL vector components (order-independent — raw components
  are exact at 6 decimals in this corpus), computed straight off the
  assignment expression — the former join-back of the assignment table
  to the corpus (one full-payload shuffle per iteration) is gone. A
  single ``groupBy(cluster)`` with d side-by-side decimal sums was
  measured SLOWER than the posexplode + (cluster, dim) agg used here —
  65 wide agg buffers beat the saved shuffle only on paper;
- seeds are fixed input vectors, not random samples.

``group_cols`` trains a whole FAMILY of independent codebooks in one
pass — rows carrying a group key (PQ subspace id, tenant, language) are
assigned/updated only against their group's centroids (the literal
codebook becomes a map keyed by the group). One corpus scan and one
driver round-trip per iteration regardless of family size, instead of
per-codebook sequential loops.

Shape at 100 TB: each iteration ships the (groups x k x d) codebook (a
few KB) to the driver and back inside the next plan, runs one narrow
map over the corpus, and two partial-aggregable groupBys whose exchange
carries only (groups x k x d) partial rows per partition. No collect of
vector data; only the codebook crosses the driver boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import similarity as S


def collect_codebook(cents: DataFrame, group_cols: Sequence[str] = ()):
    """Collect a bounded codebook DataFrame (cluster, cvec, c_nrm,
    *group_cols) into deterministically ordered driver rows."""
    rows = cents.collect()
    return sorted(
        rows, key=lambda r: tuple([r[g] for g in group_cols] + [r["cluster"]])
    )


def _sql_double(x: float) -> str:
    # repr() is the shortest round-trip form and Spark's parser is
    # correctly rounded, so the exact IEEE bits survive the text trip
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _cents_literal(rows, schema, group_cols: Sequence[str]) -> Column:
    """A constant-foldable column holding the codebook: an
    array<struct<cvec,c_nrm,cluster>> literal (or, with a single group
    column, a map from group key to such an array). Built as ONE
    ``F.expr`` call — per-element ``F.lit`` composition costs a py4j
    round-trip per number (~0.5s per k x d codebook, measured), which
    would put the driver, not the cluster, on the critical path. The
    literals are cast to the source schema's exact types so downstream
    columns keep their dtypes."""
    cluster_t = schema["cluster"].dataType.simpleString()

    def arr(rs) -> str:
        structs = [
            "named_struct('cvec', array("
            + ", ".join(_sql_double(x) for x in r["cvec"])
            + f"), 'c_nrm', {_sql_double(r['c_nrm'])}"
            + f", 'cluster', CAST({int(r['cluster'])} AS {cluster_t}))"
            for r in rs
        ]
        return "array(" + ", ".join(structs) + ")"

    if not group_cols:
        return F.expr(arr(rows))
    if len(group_cols) != 1:  # pragma: no cover — no multi-group caller
        raise ValueError("literal codebooks support at most one group col")
    g = group_cols[0]
    g_t = schema[g].dataType.simpleString()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r[g], []).append(r)
    pairs = [
        f"CAST({int(gv)} AS {g_t}), {arr(by_g[gv])}" for gv in sorted(by_g)
    ]
    return F.expr("map(" + ", ".join(pairs) + ")")


def scored_centroids(
    rows, schema, group_cols: Sequence[str] = ()
) -> Column:
    """array<struct<cos,neg_cluster,cluster>> of every same-group
    centroid scored against the current row's (emb, nrm) — ordered so
    that the struct MAX is the assignment winner (highest rounded
    cosine, ties to the smaller cluster id) and a descending sort is
    the probe order."""
    carr = _cents_literal(rows, schema, group_cols)
    if group_cols:
        carr = F.element_at(carr, F.col(group_cols[0]))
    return F.transform(
        carr,
        lambda c: F.struct(
            F.round(
                S.dot(F.col("emb"), c["cvec"])
                / (F.col("nrm") * c["c_nrm"]),
                6,
            ).alias("cos"),
            (-c["cluster"]).alias("neg_cluster"),
            c["cluster"].alias("cluster"),
        ),
    )


def assignment_col(rows, schema, group_cols: Sequence[str] = ()) -> Column:
    """The winning cluster id as a pure expression (see module doc)."""
    return F.array_max(scored_centroids(rows, schema, group_cols))["cluster"]


def assign_clusters(
    e: DataFrame, cents: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Hard assignment: for each vector in ``e`` (vec_id, emb, nrm,
    *group_cols), the cluster in ``cents`` (cluster, cvec, c_nrm,
    *group_cols) of the SAME group with the highest rounded cosine; ties
    break to the smaller cluster id. Collects the bounded codebook and
    assigns map-side — no join, no exchange."""
    rows = collect_codebook(cents, group_cols)
    if not rows:
        # empty codebook: the former join formulation produced an empty
        # assignment — preserve that, not a null-cluster column
        return (
            e.select(
                "vec_id",
                *group_cols,
                F.lit(None)
                .cast(cents.schema["cluster"].dataType)
                .alias("cluster"),
            )
            .filter(F.lit(False))
        )
    return e.select(
        "vec_id",
        *group_cols,
        assignment_col(rows, cents.schema, group_cols).alias("cluster"),
    )


def update_centroids(
    e: DataFrame, assign: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Exact per-(group, cluster, dim) decimal means over member vectors
    -> (cluster, cvec, c_nrm, *group_cols). Clusters that lost every
    member disappear (standard Lloyd behavior; deterministic in any
    engine). When ``assign`` already carries ``emb`` (the expression
    assignment path), the former join-back of the corpus — a full
    payload shuffle — is skipped."""
    keys = [*group_cols, "cluster"]
    src = (
        assign
        if "emb" in assign.columns
        else assign.join(e, ["vec_id", *group_cols])
    )
    member_dims = src.select(
        *keys, F.posexplode("emb").alias("pos", "v")
    ).select(*keys, (F.col("pos") + 1).alias("dim"), "v")
    means = member_dims.groupBy(*keys, "dim").agg(
        (F.sum(F.col("v").cast("decimal(30,6)")).cast("double") / F.count("v")).alias("v")
    )
    return (
        means.groupBy(*keys)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "v"))).alias("s"))
        .select(*keys, F.expr("transform(s, x -> x.v)").alias("cvec"))
        .select(*keys, "cvec", S.norm(F.col("cvec")).alias("c_nrm"))
    )


def lloyd(
    e: DataFrame,
    seeds: DataFrame,
    n_iter: int,
    materialize: bool = True,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """``n_iter`` Lloyd iterations from ``seeds`` (cluster, cvec, c_nrm,
    *group_cols); returns the trained codebook(s) in the same shape.

    Each iteration collects the bounded previous codebook (groups x k x
    d doubles — a few KB) and folds it into the next pass as literals,
    so iteration i's plan never embeds iteration i-1's: lineage is
    truncated by construction, replacing the former per-iteration
    ``localCheckpoint``. ``materialize`` eagerly pins the RETURNED
    codebook the same way (one collect + local re-create), so callers
    chain onto a constant-sized plan rather than one final aggregation
    pass."""
    cents = seeds
    for _ in range(n_iter):
        rows = collect_codebook(cents, group_cols)
        if not rows:
            # every cluster vanished (empty seeds / empty corpus):
            # further iterations are no-ops on an empty codebook
            return e.sparkSession.createDataFrame([], cents.schema)
        assigned = e.withColumn(
            "cluster", assignment_col(rows, cents.schema, group_cols)
        )
        cents = update_centroids(e, assigned, group_cols)
    if n_iter and materialize:
        spark = e.sparkSession
        cents = spark.createDataFrame(
            collect_codebook(cents, group_cols), cents.schema
        )
    return cents
