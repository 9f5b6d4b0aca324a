"""IVF-PQ: the canonical composed ANN index for web-scale corpora
(SURVEY §2.9 similarity-search north star; no reference counterpart).

Composition of the two quantizers already in the engine:

1. a COARSE codebook (``kmeans.lloyd``) partitions the corpus into
   cells — at query time only ``n_probe`` cells are scanned (the
   inverted-file trade: candidates shrink from N to ~N * probe/cells);
2. within each cell, vectors are stored as PQ codes of their RESIDUAL
   (vector minus cell centroid) — M per-subspace codebooks trained in
   one grouped-kmeans pass. Storage per vector: one cell id + M bytes.
3. search scores candidates by ADC (asymmetric distance computation):
   the query's residual against each probed cell is sliced into
   subspaces and dotted with that subspace's centroids — a (cells x M
   x k) lookup table per query — then summed per candidate; the top
   ``rerank`` candidates are re-ranked with the exact vectors.

Everything is spherical (cosine), matching the engine's k-means; for
normalized-embedding corpora this is the standard choice. All steps are
deterministic DataFrame compositions: codebooks come from fixed seeds,
every ranking has a total order (rounded score + id tie-break).

Scale shape: training and encoding are the grouped-kmeans passes
(broadcast codebooks, partial-aggregable groupBys); the search plan is
(queries x probed cells x M) broadcast-joined ADC lookups against the
code table — the big side (codes) is only ever equi-joined on
(cell, m, code), never crossed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import kmeans
from sec_financial_pipeline_spark.operators import similarity as S

#: floor for residual norms: a vector exactly equal to its cell centroid
#: has a zero residual; cosine against it is defined as 0 via this floor
#: (deterministic, engine-independent)
_NORM_FLOOR = 1e-12


@dataclass(frozen=True)
class IvfPqIndex:
    coarse: DataFrame  # (cluster, cvec, c_nrm)
    pq: DataFrame  # (m, cluster, cvec, c_nrm) — per-subspace residual codebooks
    codes: DataFrame  # (vec_id, cell, m, code)
    slices: tuple[tuple[int, int, int], ...]  # (m, start, length)


def _subspaces(df: DataFrame, vec_col: str, slices) -> DataFrame:
    """One row per (row, subspace) with the sliced vector and its norm."""
    return (
        df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.slice(vec_col, start, length).alias("sub"),
                        )
                        for m, start, length in slices
                    ]
                )
            ).alias("_s"),
        )
        .withColumn("m", F.col("_s.m"))
        .withColumn("emb", F.col("_s.sub"))
        .drop("_s", vec_col)
        .withColumn("nrm", F.greatest(S.norm(F.col("emb")), F.lit(_NORM_FLOOR)))
    )


def _residual(vec: F.Column, cent: F.Column) -> F.Column:
    return F.zip_with(vec, cent, lambda a, b: a - b)


def build_index(
    e: DataFrame,
    coarse_seeds: DataFrame,
    pq_seed_ids: list[int],
    slices,
    n_iter: int = 1,
) -> IvfPqIndex:
    """Train coarse + residual-PQ codebooks and encode the corpus.

    ``e``: (vec_id, emb, nrm). ``coarse_seeds``: (cluster, cvec, c_nrm).
    ``pq_seed_ids``: vec_ids whose residual subvectors seed the PQ
    codebooks (cluster = rank within the SORTED id list — the given
    order of ``pq_seed_ids`` does not affect cluster numbering)."""
    coarse = kmeans.lloyd(e, coarse_seeds, n_iter=n_iter)
    # PQ training needs the residual subspaces, which _encode_parts also
    # derives — compute them once here for both seeding and training
    resid, rsub = _encode_parts(e, coarse, slices)
    seed_rank = {v: i for i, v in enumerate(sorted(pq_seed_ids))}
    seed_map = F.create_map(
        *[x for v, i in seed_rank.items() for x in (F.lit(v), F.lit(i))]
    )
    pq_seeds = rsub.filter(F.col("vec_id").isin(list(pq_seed_ids))).select(
        "m",
        seed_map[F.col("vec_id")].cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    pq = kmeans.lloyd(rsub, pq_seeds, n_iter=n_iter, group_cols=["m"])
    # same tail as encode(), but over the resid/rsub already derived for
    # PQ seeding/training — calling encode() here would duplicate those
    # subtrees in the plan
    codes = kmeans.assign_clusters(rsub, pq, group_cols=["m"]).select(
        "vec_id",
        F.col("m"),
        F.col("cluster").alias("code"),
    )
    cells = resid.select("vec_id", "cell")
    return IvfPqIndex(
        coarse=coarse,
        pq=pq,
        codes=codes.join(cells, "vec_id").select("vec_id", "cell", "m", "code"),
        slices=tuple(slices),
    )


def _encode_parts(e: DataFrame, coarse: DataFrame, slices):
    """(residuals with cell assignment, residual subspace rows) for a
    vector set under FIXED coarse centroids."""
    assign = kmeans.assign_clusters(e, coarse)
    resid = (
        e.join(assign, "vec_id")
        .join(
            F.broadcast(coarse.select(F.col("cluster"), F.col("cvec"))), "cluster"
        )
        .select(
            "vec_id",
            F.col("cluster").alias("cell"),
            _residual(F.col("emb"), F.col("cvec")).alias("resid"),
        )
    )
    return resid, _subspaces(resid, "resid", slices)


def encode(e: DataFrame, index: IvfPqIndex) -> DataFrame:
    """``(vec_id, cell, m, code)`` rows for vectors under the index's
    FROZEN codebooks — no training pass. This is the index-maintenance
    primitive: new corpus vectors are encoded against the existing
    coarse + PQ codebooks and appended, so a 100 TB index absorbs
    ingest without retraining (retrain on drift is a policy decision,
    not a per-batch cost)."""
    resid, rsub = _encode_parts(e, index.coarse, index.slices)
    codes = kmeans.assign_clusters(rsub, index.pq, group_cols=["m"]).select(
        "vec_id",
        F.col("m"),
        F.col("cluster").alias("code"),
    )
    cells = resid.select("vec_id", "cell")
    return codes.join(cells, "vec_id").select("vec_id", "cell", "m", "code")


def _fresh_codes(index: IvfPqIndex, new_e: DataFrame) -> DataFrame:
    """Codes for the NOT-yet-indexed subset of ``new_e`` (first-wins:
    an already-indexed vec_id is skipped). Without this guard a
    re-ingested id would carry 2 rows per (vec_id, m), and search's
    exact ``n_m == M`` completeness check would silently drop the
    vector from every result — duplicated means unsearchable, with no
    error anywhere. Updating a vector is therefore an explicit
    delete-and-rebuild policy, never an append."""
    existing = index.codes.select("vec_id").distinct()
    return encode(new_e, index).join(existing, "vec_id", "left_anti")


def append_to_index(index: IvfPqIndex, new_e: DataFrame) -> IvfPqIndex:
    """In-memory index with ``new_e``'s not-yet-indexed vectors encoded
    under the frozen codebooks and unioned into the code table
    (re-ingesting an indexed id is a no-op — see :func:`_fresh_codes`)."""
    return IvfPqIndex(
        coarse=index.coarse,
        pq=index.pq,
        codes=index.codes.unionByName(_fresh_codes(index, new_e)),
        slices=index.slices,
    )


def append_to_saved_index(spark, path: str, new_e: DataFrame) -> None:
    """Parquet-level ingest: encode ``new_e``'s not-yet-indexed vectors
    under the saved index's codebooks and APPEND into the
    cell-partitioned code table — the codebook files are untouched,
    only the affected cells' partitions gain files, and a retried or
    overlapping ingest is idempotent (first-wins duplicate guard)."""
    index = load_index(spark, path)
    # materialize before writing: the duplicate guard READS path/codes,
    # and the append WRITES it — the cache barrier keeps the scan from
    # listing files the write is concurrently creating
    from sec_financial_pipeline_spark.sources.sink import append_partitioned

    fresh = _fresh_codes(index, new_e).persist()
    try:
        fresh.count()
        append_partitioned(fresh, f"{path}/codes", ("cell",))
    finally:
        fresh.unpersist()


def search(
    e: DataFrame,
    queries: DataFrame,
    index: IvfPqIndex,
    n_probe: int = 2,
    rerank: int = 50,
    top_k: int = 5,
) -> DataFrame:
    """ANN search: probe ``n_probe`` cells per query, ADC-score every
    encoded vector in them, exact-re-rank the ``rerank`` best, return
    ``top_k`` rows (query_id, neighbor_id, cosine_sim).

    ``queries``: (query_id, emb, nrm)."""
    qcos = queries.crossJoin(F.broadcast(index.coarse)).select(
        "query_id",
        "emb",
        F.col("cluster").alias("cell"),
        F.col("cvec"),
        F.round(
            S.dot(F.col("emb"), F.col("cvec")) / (F.col("nrm") * F.col("c_nrm")), 6
        ).alias("cos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cell").asc()
    )
    probed = (
        qcos.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select(
            "query_id",
            "cell",
            _residual(F.col("emb"), F.col("cvec")).alias("qresid"),
        )
    )
    # per (query, probed cell, subspace, pq centroid): the ADC table
    adc = (
        _subspaces(probed, "qresid", index.slices)
        .join(F.broadcast(index.pq.select("m", "cluster", "cvec")), "m")
        .select(
            "query_id",
            "cell",
            "m",
            F.col("cluster").alias("code"),
            S.dot(F.col("emb"), F.col("cvec")).alias("pd"),
        )
    )
    scores = (
        index.codes.join(adc, ["cell", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd").alias("approx"), F.count(F.lit(1)).alias("n_m"))
        # only vectors with ALL M subspace scores present (i.e. in a
        # probed cell) — and the M-term sum is over a fixed tiny M, whose
        # float order Spark fixes per-group at this size; determinism is
        # enforced by the ROUNDED ranking + id tie-break
        .filter(F.col("n_m") == len(index.slices))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.round(F.col("approx"), 6).desc(), F.col("vec_id").asc()
    )
    cands = (
        scores.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= rerank)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qv = queries.select(
        F.col("query_id"), F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    nv = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    sims = (
        cands.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                S.dot(F.col("q_emb"), F.col("n_emb"))
                / (F.col("q_nrm") * F.col("n_nrm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# Index lifecycle: at 100 TB the index is trained by a batch job and
# served by many search jobs — codebooks and codes round-trip through
# parquet (codes partitioned by cell, so a probe prunes to the probed
# cells' files before any shuffle).
# ---------------------------------------------------------------------------


def delete_from_saved_index(spark, path: str, vec_ids) -> int:
    """Remove vectors from a persisted index (the deletion half of
    index maintenance — after this, a deleted id can be re-appended
    with fresh data, which is how an UPDATE is expressed): rewrite the
    code table minus the ids via ``sources/sink.py::swap_rewrite``
    (crash-safe two-rename swap over the Hadoop FS API — works on
    remote stores, survives deleting the last vector); codebooks are
    untouched. ``vec_ids`` is a Python list or a one-column DataFrame;
    the deletion predicate is a ``left_anti`` join either way (a
    literal ``~isin`` blows up the plan at GDPR-batch id counts — see
    ``similarity._ids_df``). Returns code rows remaining."""
    from sec_financial_pipeline_spark.operators.similarity import _ids_df
    from sec_financial_pipeline_spark.sources.sink import (
        recover_swap,
        swap_rewrite,
    )

    codes_path = f"{path}/codes"
    recover_swap(spark, codes_path)  # retrying a crashed delete self-heals
    codes = spark.read.parquet(codes_path)
    kept = codes.join(
        _ids_df(spark, vec_ids, "vec_id", like=codes), "vec_id", "left_anti"
    )
    swap_rewrite(kept, codes_path, ("cell",))
    return spark.read.parquet(codes_path).count()


def save_index(index: IvfPqIndex, path: str, nparts: int | None = None) -> None:
    """Persist an index: tiny codebook tables plus the cell-partitioned
    code table; ``slices`` ride along as a one-row parquet.

    ``nparts`` (r14, guide §6) bounds the code-table writer-task count
    so each cell dir gets byte-sized files instead of one file per
    upstream shuffle partition; appends keep their own batch layout."""
    index.coarse.write.mode("overwrite").parquet(f"{path}/coarse")
    index.pq.write.mode("overwrite").parquet(f"{path}/pq")
    codes = index.codes
    if nparts is not None:
        codes = codes.repartition(nparts, "cell")
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/codes"
    )
    spark = index.coarse.sparkSession
    spark.createDataFrame(
        [(m, s, l) for m, s, l in index.slices], "m INT, start INT, length INT"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/slices")


def load_index(spark, path: str) -> IvfPqIndex:
    # the code table is the swap-rewritten piece (deletion); finish or
    # roll back a crashed swap before reading — no-op when healthy
    from sec_financial_pipeline_spark.sources.sink import recover_swap

    recover_swap(spark, f"{path}/codes")
    # schema-pinned reads (r14): the index layout is fixed by
    # save_index, and a schema-less read schedules a footer-inference
    # job per component — four serial driver round-trips per load
    slices = tuple(
        (r.m, r.start, r.length)
        for r in spark.read.schema("m int, start int, length int")
        .parquet(f"{path}/slices")
        .orderBy("m")
        .collect()
    )
    cb_schema = "m int, cluster int, cvec array<double>, c_nrm double"
    return IvfPqIndex(
        coarse=spark.read.schema(
            "cluster int, cvec array<double>, c_nrm double"
        ).parquet(f"{path}/coarse"),
        pq=spark.read.schema(cb_schema).parquet(f"{path}/pq"),
        codes=spark.read.schema("vec_id bigint, m int, code int, cell int")
        .parquet(f"{path}/codes"),
        slices=slices,
    )


def saved_index_debt(spark, path: str) -> int:
    """Small-file debt of a maintained saved index: parquet file count
    in the cell-partitioned code table. Every
    :func:`append_to_saved_index` adds one file set per touched cell
    partition, so a long-lived maintained index accretes files until
    compaction — the same debt shape as the BM25 epoch dirs and the
    MinHash band files. Cheap: one recursive listing, no scan."""
    from sec_financial_pipeline_spark.sources.sink import (
        _count_parquet_files,
    )

    return _count_parquet_files(spark, f"{path}/codes")


def compact_saved_index(spark, path: str) -> int:
    """Fold the maintained code table to one file per cell partition
    (codebooks are untouched — they never accrete). Delegates to
    ``sink.compact``: crash-safe swap_rewrite under the code table's
    writer lease, bit-identical contents, identical search results
    (pinned in tests/test_ivfpq.py). Deletes already compact
    implicitly (swap_rewrite is a full rewrite); this pays down
    append debt. Returns the file count after compaction."""
    from sec_financial_pipeline_spark.sources.sink import compact

    return compact(
        spark, f"{path}/codes",
        target_files_per_partition=1, partition_cols=("cell",),
    )
