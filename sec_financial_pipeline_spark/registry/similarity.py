"""Similarity-search & near-dup queries (SURVEY §2.9) over `documents` /
`embeddings`, each with a DuckDB oracle twin where expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import similarity as S
from sec_financial_pipeline_spark.registry.core import register
from sec_financial_pipeline_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Cache bookkeeping: the shared shingle/pair tables and the ANN corpus
# caches are persisted for cross-query reuse (CacheManager dedupes
# identical plans), but a long-lived session — the ServingFacade process
# — would otherwise pin superseded sf_dirs' partitions forever. Every
# .persist() here goes through _track(); release_caches() is the
# session-scoped cleanup hook.
# ---------------------------------------------------------------------------

_TRACKED: list[DataFrame] = []


def _track(df: DataFrame) -> DataFrame:
    _TRACKED.append(df)
    return df


def release_caches(blocking: bool = False) -> int:
    """Unpersist every cached table this module created; returns how many.
    Safe to call between queries — the next call simply re-persists."""
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist(blocking=blocking)
        n += 1
    return n

# ---------------------------------------------------------------------------
# Brute-force cosine top-k (the ANN baseline)
# ---------------------------------------------------------------------------

_N_QUERIES = 5
_TOP_K = 10

_COSINE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] * c.emb[i]))
           / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
              * sqrt(list_sum(list_transform(c.emb, x -> x * x)))), 6) AS cosine_sim
  FROM e q JOIN e c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {_N_QUERIES}
)
SELECT query_id, neighbor_id, cosine_sim FROM (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= {_TOP_K}
"""


def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # precompute per-vector norms ONCE behind an exchange: array folds are
    # interpreted (no codegen), and cosine-per-pair would otherwise
    # re-fold both norms for every pair (Q x N x 2 redundant passes)
    n_part = max(1, spark.sparkContext.defaultParallelism)
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .withColumn("nrm", S.norm(F.col("emb")))
        .repartition(n_part)
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    # broadcast the (small) query set; candidates stream by partition —
    # the O(Q x N) baseline shape that scales out linearly.
    sims = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                S.dot(F.col("q_emb"), F.col("emb"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: lexical (3-gram Jaccard) leg + vector (cosine) leg
# fused by reciprocal-rank fusion (RRF, Cormack et al. 2009) — the
# standard keyword+vector search shape. documents.doc_id and
# embeddings.vec_id are the aligned id space of the synthetic corpus.
# Determinism: Jaccard is a ratio of small ints (bit-identical in any
# IEEE engine), cosine is the rounded-6 convention, RRF adds two exact
# reciprocals of integers — every rank tie breaks (score desc, id asc).
# ---------------------------------------------------------------------------

_HY_KLEG = 20   # per-leg candidate depth
_RRF_K = 60

_HYBRID_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(w) - 2),
                i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM toks
),
sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
),
lexshared AS (
  SELECT q.doc_id AS query_id, c.doc_id AS cand_id, count(*) AS n_shared
  FROM sh q JOIN sh c ON q.shingle = c.shingle AND q.doc_id <> c.doc_id
  WHERE q.doc_id < {_N_QUERIES}
  GROUP BY q.doc_id, c.doc_id
),
lexrank AS (
  SELECT query_id, cand_id,
         row_number() OVER (PARTITION BY query_id ORDER BY
           CAST(n_shared AS DOUBLE) / (sq.n_shingles + sc.n_shingles - n_shared) DESC,
           cand_id ASC) AS lex_rank
  FROM lexshared l
  JOIN sizes sq ON l.query_id = sq.doc_id
  JOIN sizes sc ON l.cand_id = sc.doc_id
),
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
cosrank AS (
  SELECT query_id, cand_id, row_number() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, cand_id ASC
         ) AS cos_rank
  FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           round(
             list_sum(list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] * c.emb[i]))
             / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                * sqrt(list_sum(list_transform(c.emb, x -> x * x)))), 6) AS cosine_sim
    FROM e q JOIN e c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {_N_QUERIES}
  )
),
bocc AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
blens AS (SELECT doc_id, count(*) AS len_d FROM bocc GROUP BY doc_id),
btf AS (SELECT doc_id, term, count(*) AS tf FROM bocc GROUP BY doc_id, term),
bstats AS (SELECT count(*) AS n_docs, sum(len_d) AS total_len FROM blens),
bidf AS (
  SELECT term,
         CAST(round(1000.0 * ln((s.n_docs - df + 0.5) / (df + 0.5) + 1.0))
              AS BIGINT) AS idf_milli
  FROM (SELECT term, count(*) AS df FROM btf GROUP BY term) d, bstats s
),
bmrank AS (
  SELECT query_id, cand_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY bm25_milli DESC, cand_id ASC) AS bm25_rank
  FROM (
    SELECT q.query_id, t.doc_id AS cand_id,
           CAST(sum(CAST(round(
             i.idf_milli *
             ((t.tf * (1.2 + 1.0)) /
              (t.tf + 1.2 * (1.0 - 0.75 + 0.75 *
                (l.len_d / (CAST(s.total_len AS DOUBLE) / s.n_docs)))))
           ) AS BIGINT)) AS BIGINT) AS bm25_milli
    FROM (SELECT DISTINCT doc_id AS query_id, term FROM btf
          WHERE doc_id < {_N_QUERIES}) q
    JOIN btf t ON t.term = q.term AND t.doc_id <> q.query_id
    JOIN bidf i ON i.term = q.term
    JOIN blens l ON l.doc_id = t.doc_id
    CROSS JOIN bstats s
    GROUP BY q.query_id, t.doc_id
  )
),
fused AS (
  SELECT coalesce(lc.query_id, b.query_id) AS query_id,
         coalesce(lc.neighbor_id, b.cand_id) AS neighbor_id,
         lc.lex_rank, lc.cos_rank, b.bm25_rank,
         coalesce(lc.lexcos_rrf, 0)
         + coalesce(1.0 / ({_RRF_K} + b.bm25_rank), 0) AS rrf_score
  FROM (
    SELECT coalesce(l.query_id, c.query_id) AS query_id,
           coalesce(l.cand_id, c.cand_id) AS neighbor_id,
           l.lex_rank, c.cos_rank,
           coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0)
           + coalesce(1.0 / ({_RRF_K} + c.cos_rank), 0) AS lexcos_rrf
    FROM (SELECT * FROM lexrank WHERE lex_rank <= {_HY_KLEG}) l
    FULL OUTER JOIN (SELECT * FROM cosrank WHERE cos_rank <= {_HY_KLEG}) c
      ON l.query_id = c.query_id AND l.cand_id = c.cand_id
  ) lc
  FULL OUTER JOIN (SELECT * FROM bmrank WHERE bm25_rank <= {_HY_KLEG}) b
    ON lc.query_id = b.query_id AND lc.neighbor_id = b.cand_id
)
SELECT query_id, neighbor_id, CAST(lex_rank AS INTEGER) AS lex_rank,
       CAST(cos_rank AS INTEGER) AS cos_rank,
       CAST(bm25_rank AS INTEGER) AS bm25_rank, rrf_score
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY rrf_score DESC, neighbor_id ASC) AS rn
  FROM fused
) WHERE rn <= {_TOP_K}
"""


def _hybrid_rrf(
    sh: DataFrame, sizes: DataFrame, e: DataFrame, bm: DataFrame
) -> DataFrame:
    """The engine of both hybrid paths — train-in-query
    (:func:`q_emb_hybrid_topk`) and store-served
    (:func:`q_emb_hybrid_serve`) run THIS function on leg inputs that
    differ only in provenance, so serve == train equality is equality
    of inputs, pinned in tests/test_hybrid_serve.py.

    ``sh``: (doc_id, shingle) exploded 3-gram postings; ``sizes``:
    (doc_id, n_shingles); ``e``: (vec_id, emb, nrm) with the L2 norm
    PRE-computed; ``bm``: (query_id, cand_id, bm25_rank) already
    truncated to ``_HY_KLEG``. Scale shape: the Jaccard leg is the
    shared-shingle equi-join (query side tiny — broadcast), the vector
    leg the broadcast-query cosine; every leg truncates to
    ``_HY_KLEG`` per query BEFORE fusion, so the full-outer fuse
    touches <= 3 * KLEG rows per query regardless of corpus size;
    windows are partitioned by query."""
    from pyspark.sql import Window

    qsh = sh.filter(F.col("doc_id") < _N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "shingle"
    )
    shared = (
        F.broadcast(qsh)
        .join(sh, "shingle")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("cand_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("nq") + F.col("nc") - F.col("n_shared")
    )
    wq = Window.partitionBy("query_id")
    lex = (
        shared.join(
            sizes.select(F.col("doc_id").alias("query_id"),
                         F.col("n_shingles").alias("nq")), "query_id")
        .join(
            sizes.select(F.col("doc_id").alias("cand_id"),
                         F.col("n_shingles").alias("nc")), "cand_id")
        .withColumn(
            "lex_rank",
            F.row_number().over(wq.orderBy(jac.desc(), F.col("cand_id").asc())),
        )
        .filter(F.col("lex_rank") <= _HY_KLEG)
        .select("query_id", "cand_id", "lex_rank")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(
                S.dot(F.col("emb"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm")),
                6,
            ).alias("cosine_sim"),
        )
        .withColumn(
            "cos_rank",
            F.row_number().over(
                wq.orderBy(F.col("cosine_sim").desc(), F.col("cand_id").asc())
            ),
        )
        .filter(F.col("cos_rank") <= _HY_KLEG)
        .select("query_id", "cand_id", "cos_rank")
    )
    fused = (
        lex.join(cos, ["query_id", "cand_id"], "full_outer")
        .join(bm, ["query_id", "cand_id"], "full_outer")
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("cos_rank").cast("int").alias("cos_rank"),
            F.col("bm25_rank").cast("int").alias("bm25_rank"),
            (
                F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lex_rank")),
                           F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("cos_rank")),
                             F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("bm25_rank")),
                             F.lit(0.0))
            ).alias("rrf_score"),
        )
    )
    return (
        fused.withColumn(
            "rn",
            F.row_number().over(
                wq.orderBy(F.col("rrf_score").desc(), F.col("neighbor_id").asc())
            ),
        )
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "lex_rank", "cos_rank",
                "bm25_rank", "rrf_score")
    )


def q_emb_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF hybrid search, three legs (VERDICT r11 item 3): 3-gram
    Jaccard (recall-oriented token-set overlap), BM25 (the
    production-standard lexical ranking), and cosine (vector) — built
    in-query; :func:`q_emb_hybrid_serve` is the store-served twin."""
    from sec_financial_pipeline_spark.operators.bm25 import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    n_part = max(1, spark.sparkContext.defaultParallelism)
    # the exchange is a materialization barrier: sh feeds FOUR branches
    # (query side, probe side, two sizes joins) and Catalyst does not
    # dedupe common subtrees — without it the interpreted shingle HOF
    # re-runs per branch (the measured 7-17x trap minhash_signatures
    # documents); with it the later branches hit a ReusedExchange
    sh = d.select(
        "doc_id", F.explode(S.shingles(F.col("text"))).alias("shingle")
    ).repartition(n_part, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .withColumn("nrm", S.norm(F.col("emb")))
        .repartition(n_part)
    )
    bm = bm25_topk(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n_queries=_N_QUERIES, top_k=_HY_KLEG,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("cand_id"),
        F.col("bm25_rank"),
    )
    return _hybrid_rrf(sh, sizes, e, bm)


_EMB_TOPK_SCHEMA = [
    ("query_id", "bigint"),
    ("neighbor_id", "bigint"),
    ("cosine_sim", "double"),
    ("lex_rank", "int"),
    ("cos_rank", "int"),
    ("rrf_score", "double"),
    ("bm25_milli", "bigint"),
    ("bm25_rank", "int"),
]

# ---------------------------------------------------------------------------
# BM25 lexical retrieval (third section of emb_cosine_topk): the
# inverted-index ranking function production search actually runs
# (Robertson & Zaragoza 2009, Lucene idf variant). Integer milli-nat
# firewall like operators/lm.py: idf and each matched term's
# contribution round to integers ONCE, the per-doc score is an exact
# BIGINT sum — order-independent and engine-identical; the saturation
# chain mirrors the Spark expression literal-for-literal so both
# engines run the same IEEE op sequence.
# ---------------------------------------------------------------------------

_BM25_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
lens AS (SELECT doc_id, count(*) AS len_d FROM occ GROUP BY doc_id),
tf AS (SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY doc_id, term),
stats AS (
  SELECT count(*) AS n_docs, sum(len_d) AS total_len FROM lens
),
idf AS (
  SELECT term,
         CAST(round(1000.0 * ln((s.n_docs - df + 0.5) / (df + 0.5) + 1.0))
              AS BIGINT) AS idf_milli
  FROM (SELECT term, count(*) AS df FROM tf GROUP BY term) d, stats s
),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, term FROM tf
  WHERE doc_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, t.doc_id AS neighbor_id,
         CAST(sum(CAST(round(
           i.idf_milli *
           ((t.tf * (1.2 + 1.0)) /
            (t.tf + 1.2 * (1.0 - 0.75 + 0.75 *
              (l.len_d / (CAST(s.total_len AS DOUBLE) / s.n_docs)))))
         ) AS BIGINT)) AS BIGINT) AS bm25_milli
  FROM qterms q
  JOIN tf t ON t.term = q.term AND t.doc_id <> q.query_id
  JOIN idf i ON i.term = q.term
  JOIN lens l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, t.doc_id
)
SELECT query_id, neighbor_id, bm25_milli, CAST(bm25_rank AS INTEGER) AS bm25_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY bm25_milli DESC, neighbor_id ASC) AS bm25_rank
  FROM scored
) WHERE bm25_rank <= {_TOP_K}
"""


def q_emb_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.bm25 import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, "doc_id", "text", n_queries=_N_QUERIES, top_k=_TOP_K)


_BM25_SERVE_MOD = 101  # ~1% of the corpus queries the store per call


def ensure_bm25_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent batch half of the BM25 lifecycle: build the inverted
    index ONCE (postings partitioned-by-nothing parquet + idf + corpus
    stats under one artifact root, atomic-rename published) — the
    nightly index build every search deployment runs. Serving then
    pays query-term extraction + the postings probe only."""
    import os

    from sec_financial_pipeline_spark.operators.bm25 import (
        B,
        K1,
        save_bm25_store,
    )

    # tag DERIVED from the scoring constants (ADVICE r11): retuning
    # K1/B invalidates the persisted artifact instead of silently
    # serving stale scores from an index built under the old config.
    # "g1" = store generation 3 (r13): postings carry a per-batch
    # generation column and stats carry max_gen, making the store
    # delete/update-maintainable (operators/bm25.py::
    # delete_from_bm25_store / update_bm25_docs / compact_bm25_store)
    # on top of r12's maintained per-term df table.
    tag = f"k{str(K1).replace('.', '')}b{str(B).replace('.', '')}-d16-g1"
    path = _artifact_path("sfp_bm25_", sf_dir, "documents", tag)
    if not os.path.exists(path):
        d = load_table(spark, sf_dir, "documents")
        # DOC-hash postings layout across 16 files (r12): the probe
        # broadcasts the query terms so the postings scan never
        # reshuffles regardless of layout (plan-gated), and doc
        # clustering keeps the score aggregation's map-side combine
        # one-row-per-(query,neighbor) — see save_bm25_store
        _publish_atomically(
            lambda p: save_bm25_store(d, "doc_id", "text", p), path
        )
    return path


def q_emb_bm25_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-ONLY BM25 latency (bench row): probe the persisted
    inverted index with ~1% of the corpus as queries — no tf/df/idf
    recomputation, the exact serve shape of a production search tier
    (the first call builds the store; the bench warm-up absorbs it).
    Scoring is bit-identical to the train-in-query path — both run
    operators/bm25.bm25_score (asserted by tests/test_bm25.py)."""
    from sec_financial_pipeline_spark.operators.bm25 import (
        bm25_score,
        load_bm25_store,
    )

    root = ensure_bm25_index(spark, sf_dir)
    postings, idf, stats = load_bm25_store(spark, root)
    # query terms come from tokenizing the ~1% QUERY documents, not
    # from scanning the whole postings store — identical term sets
    # (a doc's postings are exactly its distinct tokens; pinned
    # equal in tests/test_bm25.py) at a fraction of the scan
    qterms = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _BM25_SERVE_MOD == 7)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.split(F.col("text"), " ")).alias("term"),
        )
        .distinct()
    )
    return bm25_score(postings, idf, stats, qterms, _TOP_K)


# ---------------------------------------------------------------------------
# Hybrid-retrieval SERVE lifecycle (r14 — VERDICT r13 item 1): the two
# legs that still rebuilt per call get the ensure_bm25_index
# build-once/probe-many treatment. The shingle store persists the
# exploded 3-gram postings + per-doc set sizes (the Jaccard leg's
# inverted layout — the expensive zip-with shingle HOF runs once at
# build, never at serve). The embedding store persists the vectors
# with PRE-computed L2 norms plus the banded sign-LSH code table
# (Charikar hyperplane buckets — the ANN candidate generator), so a
# vector-side serve never recomputes a norm or a projection.
# q_emb_hybrid_serve then answers the full 3-leg RRF query entirely
# from prebuilt stores, bit-identical to the train-in-query path
# (same _hybrid_rrf core, equality pinned in tests).
# ---------------------------------------------------------------------------

#: normalized-vector store layout (r14: serve reads pin the schema so
#: no footer-inference job is scheduled per read — the formats are
#: fixed by the stores' config-tagged paths)
_EMB_STORE_SCHEMA = "vec_id bigint, emb array<double>, nrm double"


def ensure_shingle_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build of the 3-gram shingle store for `documents`:
    ``shingles/`` (doc_id, shingle — the exploded DISTINCT-set
    postings, shingle-clustered like an inverted index) and ``sizes/``
    (doc_id, n_shingles — the Jaccard denominators). Build-once: the
    zip-with shingle chain is the measured cost center of every
    lexical leg (the 7-17x HOF trap), and it runs only here."""
    import os

    path = _artifact_path("sfp_shingle_", sf_dir, "documents", "k3g2")
    if not os.path.exists(path):

        def build(p):
            d = load_table(spark, sf_dir, "documents")
            # file count by bytes, clustering by shingle (guide §6)
            n_part = _store_nparts(sf_dir, "documents")
            d.select(
                "doc_id",
                F.explode(S.shingles(F.col("text"))).alias("shingle"),
            ).repartition(n_part, "shingle").write.parquet(
                os.path.join(p, "shingles")
            )
            # sizes derive from the WRITTEN postings (never re-run the
            # HOF); one row per doc — a single file keeps the serve
            # side's two tiny size joins off the scheduler's back
            spark.read.parquet(os.path.join(p, "shingles")).groupBy(
                "doc_id"
            ).agg(F.count(F.lit(1)).alias("n_shingles")).repartition(
                1
            ).write.parquet(os.path.join(p, "sizes"))

        _publish_atomically(build, path)
    return path


#: ANN-probe band shape: the SAME 64 hyperplanes as the near-dup code
#: table (_SIGN_BANDS x _SIGN_BITS), re-sliced as 8 bands x 8 bits.
#: Charikar tuning r ~ log2(N / c): the near-dup shape (r=16) bounds
#: bucket occupancy at N/2^16 — ideal for planted duplicates, but at
#: this corpus size (N <= 2000) NO two non-identical vectors collide,
#: so a top-k probe would return nothing. r=8 holds occupancy at
#: N/256 (~2-8 here) and b=8 ORs recall back; at 100 TB the build
#: re-derives r from log2(N) and the artifact tag invalidates.
_ANN_BANDS = 8
_ANN_BITS = 8


def ensure_emb_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build of the embedding store for `embeddings`:
    ``emb/`` (vec_id, emb, nrm — double-cast vectors with their L2
    norm computed ONCE; parquet round-trips doubles exactly) and
    ``bands/`` (vec_id, band, bucket — the banded sign-LSH code table
    at the ANN-probe shape, (band, bucket)-clustered so one bucket's
    candidates co-locate). Tag carries the plane config: retuning
    bands/bits/plane-base invalidates the artifact instead of silently
    serving stale codes."""
    import os

    cfg = f"b{_ANN_BANDS}r{_ANN_BITS}p{_SIGN_BASE}nrmf1"
    path = _artifact_path("sfp_emb_store_", sf_dir, "embeddings", cfg)
    if not os.path.exists(path):

        def build(p):
            # file count by bytes, not cores (guide §6)
            n_part = _store_nparts(sf_dir, "embeddings")
            e = (
                load_table(spark, sf_dir, "embeddings")
                .select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("emb"),
                )
                .withColumn("nrm", S.norm(F.col("emb")))
            )
            e.repartition(n_part).write.parquet(os.path.join(p, "emb"))
            stored = spark.read.parquet(os.path.join(p, "emb"))
            S.sign_lsh_bands(
                stored, "vec_id", _sign_planes(stored), _ANN_BITS
            ).repartition(n_part, "band", "bucket").write.parquet(
                os.path.join(p, "bands")
            )

        _publish_atomically(build, path)
    return path


def q_emb_hybrid_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve-only hybrid retrieval (bench row `hybrid_serve`): the full
    3-leg RRF query answered ENTIRELY from prebuilt stores — shingle
    postings + sizes from :func:`ensure_shingle_index`, normalized
    vectors from :func:`ensure_emb_index`, BM25 postings/idf/stats from
    :func:`ensure_bm25_index` (query terms read from the postings store
    itself with a pushed doc_id filter, exactly the term sets
    bm25_topk derives). No shingle HOF, no norm computation, no
    df/idf recomputation at serve time; results are bit-identical to
    q_emb_hybrid_topk because both run :func:`_hybrid_rrf` on
    value-equal leg inputs."""
    import os

    from sec_financial_pipeline_spark.operators.bm25 import (
        bm25_score,
        load_bm25_store,
    )

    sroot = ensure_shingle_index(spark, sf_dir)
    eroot = ensure_emb_index(spark, sf_dir)
    broot = ensure_bm25_index(spark, sf_dir)
    # schema-pinned store reads (r14): every schema-less
    # spark.read.parquet schedules a footer-inference job before the
    # real work — six serial ~40ms driver round-trips on this row alone.
    # The store formats are fixed by their config-tagged paths.
    sh = spark.read.schema("doc_id bigint, shingle string").parquet(
        os.path.join(sroot, "shingles")
    )
    sizes = spark.read.schema("doc_id bigint, n_shingles bigint").parquet(
        os.path.join(sroot, "sizes")
    )
    e = spark.read.schema(_EMB_STORE_SCHEMA).parquet(
        os.path.join(eroot, "emb")
    )
    postings, idf, stats = load_bm25_store(spark, broot)
    qterms = (
        postings.filter(F.col("doc_id") < _N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    bm = bm25_score(postings, idf, stats, qterms, _HY_KLEG).select(
        "query_id",
        F.col("neighbor_id").alias("cand_id"),
        F.col("bm25_rank"),
    )
    return _hybrid_rrf(sh, sizes, e, bm)


def q_emb_lsh_ann_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN serve: probe the PERSISTED band table with the
    query vectors' own stored codes (queries are corpus members — zero
    hyperplane projections at serve time), take every vector sharing a
    bucket in >= 1 band as a candidate, and exact-cosine re-rank the
    candidates to ``_TOP_K``. The probe is a broadcast of the (tiny)
    query-code table against the band store — the stored side never
    shuffles; the re-rank joins the (small) candidate list back to the
    vector store with the candidate side broadcast, so the embedding
    scan never shuffles either. This is the LSH analog of
    q_emb_ivfpq_serve: approximate by construction (candidates bound
    per bucket at N/2^r), with the exactness contract "top-k WITHIN
    the candidate set" pinned by test."""
    import os

    root = ensure_emb_index(spark, sf_dir)
    # schema-pinned (r14): skips the footer-inference job per read
    e = spark.read.schema(_EMB_STORE_SCHEMA).parquet(
        os.path.join(root, "emb")
    )
    bands = spark.read.schema("vec_id bigint, band int, bucket int").parquet(
        os.path.join(root, "bands")
    )
    qcodes = bands.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    cand = (
        bands.join(F.broadcast(qcodes), ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
        .distinct()
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    probe = cand.join(F.broadcast(q), "query_id")
    scored = e.join(
        F.broadcast(probe), e["vec_id"] == probe["cand_id"]
    ).select(
        "query_id",
        F.col("cand_id").alias("neighbor_id"),
        F.round(
            S.dot(F.col("emb"), F.col("q_emb"))
            / (F.col("nrm") * F.col("q_nrm")),
            6,
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("lsh_rank", F.row_number().over(w))
        .filter(F.col("lsh_rank") <= _TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "cosine_sim",
            F.col("lsh_rank").cast("int").alias("lsh_rank"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 store MAINTENANCE (fourth section, r13 — VERDICT r12 items 1+2):
# the served index here is not a one-shot build but the survivor of the
# full store lifecycle — save(⅓ of the corpus) → ingest(the rest) →
# DELETE (doc_id % 13 = 2: tombstones + df decrement + idf rebuild) →
# UPDATE (doc_id % 17 = 3 re-written with a 'rev ' prefix: tombstone +
# re-ingest under a fresh generation) → COMPACT (epoch/tombstone purge,
# doc-clustered rewrite). The oracle recomputes BM25 from scratch over
# the equivalent FINAL corpus in pure SQL (deleted docs absent, updated
# docs carrying the new text); equality proves every maintenance step
# is exact, not stale-tolerant.
# ---------------------------------------------------------------------------

_BM25_MAINT_QMOD = 53

_BM25_MAINT_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 3 THEN 'rev ' || text ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 2
),
occ AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM corpus
),
lens AS (SELECT doc_id, count(*) AS len_d FROM occ GROUP BY doc_id),
tf AS (SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY doc_id, term),
stats AS (
  SELECT count(*) AS n_docs, sum(len_d) AS total_len FROM lens
),
idf AS (
  SELECT term,
         CAST(round(1000.0 * ln((s.n_docs - df + 0.5) / (df + 0.5) + 1.0))
              AS BIGINT) AS idf_milli
  FROM (SELECT term, count(*) AS df FROM tf GROUP BY term) d, stats s
),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, term FROM tf
  WHERE doc_id % {_BM25_MAINT_QMOD} = 5
),
scored AS (
  SELECT q.query_id, t.doc_id AS neighbor_id,
         CAST(sum(CAST(round(
           i.idf_milli *
           ((t.tf * (1.2 + 1.0)) /
            (t.tf + 1.2 * (1.0 - 0.75 + 0.75 *
              (l.len_d / (CAST(s.total_len AS DOUBLE) / s.n_docs)))))
         ) AS BIGINT)) AS BIGINT) AS bm25_milli
  FROM qterms q
  JOIN tf t ON t.term = q.term AND t.doc_id <> q.query_id
  JOIN idf i ON i.term = q.term
  JOIN lens l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, t.doc_id
)
SELECT query_id, neighbor_id, bm25_milli, CAST(bm25_rank AS INTEGER) AS bm25_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY bm25_milli DESC, neighbor_id ASC) AS bm25_rank
  FROM scored
) WHERE bm25_rank <= {_TOP_K}
"""


def ensure_bm25_maintained_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-once artifact exercising the WHOLE store lifecycle (see
    the section comment above); keyed like every artifact by
    (sf_dir, source mtime, config tag), atomic-rename published."""
    import os

    from sec_financial_pipeline_spark.operators.bm25 import (
        B,
        K1,
        compact_bm25_store,
        delete_from_bm25_store,
        ingest_bm25_store,
        save_bm25_store,
        update_bm25_docs,
    )

    tag = (
        f"k{str(K1).replace('.', '')}b{str(B).replace('.', '')}"
        "-g1-del13-upd17-compact"
    )
    path = _artifact_path("sfp_bm25m_", sf_dir, "documents", tag)
    if not os.path.exists(path):
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

        def build(p: str) -> None:
            save_bm25_store(d.filter("doc_id % 3 = 0"), "doc_id", "text", p)
            ingest_bm25_store(
                d.filter("doc_id % 3 != 0"), "doc_id", "text", p
            )
            delete_from_bm25_store(
                spark, p, d.filter("doc_id % 13 = 2").select("doc_id")
            )
            upd = d.filter(
                "doc_id % 17 = 3 AND doc_id % 13 != 2"
            ).withColumn("text", F.concat(F.lit("rev "), F.col("text")))
            update_bm25_docs(upd, "doc_id", "text", p)
            compact_bm25_store(spark, p)

        _publish_atomically(build, path)
    return path


def q_emb_bm25_maint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve against the MAINTAINED store; queries tokenize the final
    live corpus (updated docs under their new text), mirroring the
    oracle's qterms CTE exactly."""
    from sec_financial_pipeline_spark.operators.bm25 import (
        bm25_score,
        load_bm25_store,
    )

    root = ensure_bm25_maintained_index(spark, sf_dir)
    postings, idf, stats = load_bm25_store(spark, root)
    qd = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % _BM25_MAINT_QMOD == 5)
            & (F.col("doc_id") % 13 != 2)
        )
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 17 == 3,
                F.concat(F.lit("rev "), F.col("text")),
            ).otherwise(F.col("text")),
        )
    )
    qterms = qd.select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    ).distinct()
    return bm25_score(postings, idf, stats, qterms, _TOP_K)


from sec_financial_pipeline_spark.registry.merge import (  # noqa: E402
    union_sections as _u_sections,
    union_sections_sql as _u_sections_sql,
)


@register(
    "emb_cosine_topk",
    _u_sections_sql(
        [
            ("cosine", _COSINE_ORACLE,
             ["query_id", "neighbor_id", "cosine_sim"]),
            ("hybrid", _HYBRID_ORACLE,
             ["query_id", "neighbor_id", "lex_rank", "cos_rank",
              "bm25_rank", "rrf_score"]),
            ("bm25", _BM25_ORACLE,
             ["query_id", "neighbor_id", "bm25_milli", "bm25_rank"]),
            ("bm25_maint", _BM25_MAINT_ORACLE,
             ["query_id", "neighbor_id", "bm25_milli", "bm25_rank"]),
        ],
        _EMB_TOPK_SCHEMA,
    ),
    survey=(
        "§2.9 similarity-search (brute-force cosine top-k baseline)"
        " + hybrid retrieval, THREE legs (3-gram Jaccard, BM25, cosine;"
        " each truncated to 20/query, fused by reciprocal-rank"
        " fusion k=60 — Cormack et al. 2009)"
        " + BM25 inverted-index ranking (Robertson-Zaragoza, Lucene idf;"
        " integer milli-nat scores, exact BIGINT sums)"
        " + BM25 store delete/update/compact maintenance (tombstone"
        " generations, incremental df/idf, epoch+tombstone compaction;"
        " served index == from-scratch over the final corpus)"
    ),
)
def q_emb_cosine_and_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _u_sections(
        [
            ("cosine", q_emb_cosine_topk(spark, sf_dir)),
            ("hybrid", q_emb_hybrid_topk(spark, sf_dir)),
            ("bm25", q_emb_bm25_topk(spark, sf_dir)),
            ("bm25_maint", q_emb_bm25_maint(spark, sf_dir)),
        ],
        _EMB_TOPK_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Banded sign-projection LSH (the ANN scale path): hyperplanes are fixed
# embeddings (vec_id 8..71), so both engines derive identical codes.
# b=4 bands x r=16 bits — the MinHash band structure applied to
# random-hyperplane LSH. r bounds bucket occupancy at N/2^r (scale r with
# log2 N); b recovers recall (OR across bands). A single fixed-width code
# table (the round-2 design) made within-bucket candidates quadratic in N.
# ---------------------------------------------------------------------------

_SIGN_BASE = 8
_SIGN_BANDS = 4
_SIGN_BITS = 16  # per band; planes vec_id 8..71


def _sign_planes(e: DataFrame) -> DataFrame:
    """(h_id, h_emb) hyperplane table, 0-based contiguous h_id."""
    hi = _SIGN_BASE + _SIGN_BANDS * _SIGN_BITS
    return e.filter(
        (F.col("vec_id") >= _SIGN_BASE) & (F.col("vec_id") < hi)
    ).select((F.col("vec_id") - _SIGN_BASE).alias("h_id"), F.col("emb").alias("h_emb"))


_SIGN_CODES_SQL = f"""
h AS (
  SELECT vec_id - {_SIGN_BASE} AS h_id, emb AS h_emb FROM base
  WHERE vec_id BETWEEN {_SIGN_BASE} AND {_SIGN_BASE + _SIGN_BANDS * _SIGN_BITS - 1}
),
proj AS (
  SELECT a.vec_id, CAST(h.h_id // {_SIGN_BITS} AS INT) AS band,
         h.h_id % {_SIGN_BITS} AS bit,
         round(list_sum(list_transform(generate_series(1, len(a.emb)),
                                       i -> a.emb[i] * h.h_emb[i])), 6) AS d
  FROM aug a CROSS JOIN h
),
codes AS (
  SELECT vec_id, band,
         CAST(sum(CASE WHEN d > 0 THEN power(2, bit) ELSE 0 END) AS INT) AS bucket
  FROM proj
  GROUP BY vec_id, band
)
"""

_QUANTIZATION_ORACLE = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
aug AS (SELECT * FROM base),
{_SIGN_CODES_SQL.strip()}
SELECT 'lsh_bucket' AS part, vec_id, band, bucket,
       CAST(NULL AS VARCHAR) AS label, CAST(NULL AS INT) AS dim,
       CAST(NULL AS DOUBLE) AS centroid
FROM codes
UNION ALL
SELECT 'centroid' AS part, CAST(NULL AS BIGINT) AS vec_id,
       CAST(NULL AS INT) AS band, CAST(NULL AS INT) AS bucket,
       CAST(label AS VARCHAR) AS label, CAST(dim AS INT) AS dim,
       CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) / COUNT(v) AS centroid
FROM (
  SELECT label, u.dim, u.v FROM base,
  LATERAL (SELECT generate_subscripts(emb, 1) AS dim, unnest(emb) AS v) u
)
GROUP BY label, dim
"""


@register(
    "emb_quantization",
    _QUANTIZATION_ORACLE,
    survey="§2.9 similarity-search (banded sign-LSH code assignment, b x r bands) + embedding ops (per-label centroid, order-independent mean)",
)
def q_emb_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    codes = S.sign_lsh_bands(e, "vec_id", _sign_planes(e), _SIGN_BITS)
    buckets = codes.select(
        F.lit("lsh_bucket").alias("part"),
        "vec_id",
        "band",
        "bucket",
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("int").alias("dim"),
        F.lit(None).cast("double").alias("centroid"),
    )
    exploded = e.select(
        "label", F.posexplode("emb").alias("pos", "v")
    ).select("label", (F.col("pos") + 1).cast("int").alias("dim"), "v")
    centroids = exploded.groupBy("label", "dim").agg(
        (F.sum(F.col("v").cast("decimal(30,6)")).cast("double") / F.count("v")).alias(
            "centroid"
        )
    ).select(
        F.lit("centroid").alias("part"),
        F.lit(None).cast("bigint").alias("vec_id"),
        F.lit(None).cast("int").alias("band"),
        F.lit(None).cast("int").alias("bucket"),
        # label is INTEGER in parquet; the bucket branch carries a string-typed
        # NULL, so without this cast the union resolves `label` to a numeric
        # column and renders '4.0' where DuckDB's VARCHAR coercion yields '4'.
        F.col("label").cast("bigint").cast("string").alias("label"),
        "dim",
        "centroid",
    )
    return buckets.unionByName(centroids)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup removal: LSH sign-bucket candidates -> exact
# cosine verify -> drop. The synthetic corpus has no natural near-dups
# (max pairwise cosine 0.51), so the input is augmented with
# deterministic scaled clones (vec_id + 10000, emb * 1.5) — cosine is
# scale-invariant, so each clone pairs with its original at exactly 1.0
# and lands in the SAME bucket in EVERY band (positive scaling preserves
# every projection sign), guaranteeing banded-LSH recall. A correct
# near-dedup must drop exactly the 5% clones and keep every original.
# ---------------------------------------------------------------------------

_NEARDUP_THRESHOLD = 0.999

_COSINE_NEARDUP_ORACLE = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
aug AS (
  SELECT vec_id, label, emb FROM base
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, label,
         list_transform(emb, x -> x * 1.5) AS emb
  FROM base WHERE vec_id % 20 = 0
),
{_SIGN_CODES_SQL.strip()},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM codes a JOIN codes b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN aug x ON x.vec_id = c.id_a
  JOIN aug y ON y.vec_id = c.id_b
  WHERE round(
          list_sum(list_transform(generate_series(1, len(x.emb)), i -> x.emb[i] * y.emb[i]))
          / (sqrt(list_sum(list_transform(x.emb, v -> v * v)))
             * sqrt(list_sum(list_transform(y.emb, v -> v * v)))), 6) >= {_NEARDUP_THRESHOLD}
),
dropped AS (SELECT DISTINCT id_b AS vec_id FROM verified)
SELECT a.vec_id, a.label
FROM aug a
WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
"""


@register(
    "emb_cosine_near_dup",
    _COSINE_NEARDUP_ORACLE,
    survey="§2.9 dedup-embedding-cosine (banded sign-LSH candidates -> exact cosine verify -> drop; scale-invariant per-band recall)",
)
def q_emb_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_part = max(1, spark.sparkContext.defaultParallelism)
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    clones = base.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        "label",
        F.expr("transform(emb, x -> x * 1.5)").alias("emb"),
    )
    # one persisted-by-exchange augmented table with norms: consumed by
    # the code projection, both candidate sides, and the verify join
    aug = base.unionByName(clones).withColumn("nrm", S.norm(F.col("emb"))).repartition(n_part)
    # the code table is persisted because exchange reuse CANNOT dedupe the
    # two self-join sides here: the projection embeds zip_with/aggregate
    # lambdas, and plans containing NamedLambdaVariable never canonicalize
    # equal (unlike the MinHash band build, whose md5 exprs reuse fine).
    # The table is O(N x b) ints — cheap to cache, 2x to recompute.
    codes = _track(
        S.sign_lsh_bands(aug, "vec_id", _sign_planes(base), _SIGN_BITS).persist()
    )
    cand = S.sign_lsh_candidate_pairs(codes, "vec_id")
    xa = aug.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"), F.col("nrm").alias("nrm_a")
    )
    xb = aug.select(
        F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"), F.col("nrm").alias("nrm_b")
    )
    cos = F.round(
        S.dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b")), 6
    )
    dropped = (
        cand.join(xa, "id_a")
        .join(xb, "id_b")
        .filter(cos >= _NEARDUP_THRESHOLD)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return aug.join(dropped, "vec_id", "left_anti").select("vec_id", "label")


# ---------------------------------------------------------------------------
# Scalar-quantization ANN: per-dim min/max int8 codebook -> exact-integer
# approximate scores -> top-50 candidates -> exact cosine re-rank.
# The SQ trade at 100 TB: the approx pass touches 1 byte/dim instead of 8
# (8x less memory bandwidth, integer SIMD), and the exact pass touches
# only candidates (<= 10% of N per query).
# ---------------------------------------------------------------------------

_SQ_N_QUERIES = 5
_SQ_CANDIDATES = 50
_SQ_TOP_K = 10

_SQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
long AS (
  SELECT vec_id, u.dim AS dim, u.v AS v FROM e,
  LATERAL (SELECT generate_subscripts(emb, 1) AS dim, unnest(emb) AS v) u
),
stats AS (
  SELECT dim, min(v) AS mn, max(v) AS mx FROM long GROUP BY dim
),
codes AS (
  SELECT l.vec_id, l.dim,
         CAST(CASE WHEN s.mx > s.mn
                   THEN floor((l.v - s.mn) / (s.mx - s.mn) * 255.0)
                   ELSE 0 END AS BIGINT) AS code
  FROM long l JOIN stats s ON l.dim = s.dim
),
approx AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(q.code * c.code) AS adot
  FROM codes q JOIN codes c ON q.dim = c.dim AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {_SQ_N_QUERIES}
  GROUP BY 1, 2
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adot DESC, neighbor_id ASC) AS rn
    FROM approx
  ) WHERE rn <= {_SQ_CANDIDATES}
),
sims AS (
  SELECT cd.query_id, cd.neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] * n.emb[i]))
           / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
              * sqrt(list_sum(list_transform(n.emb, x -> x * x)))), 6) AS cosine_sim
  FROM cand cd
  JOIN e q ON q.vec_id = cd.query_id
  JOIN e n ON n.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim FROM (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= {_SQ_TOP_K}
"""


def _sq_corpus(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    # ``spread=False`` for SERVE paths (r14, guide §2.4): the encode
    # side wants the explicit exchange (materialization barrier for the
    # multi-branch training pipeline), but a serve call only re-ranks a
    # bounded candidate set — the round-robin repartition cannot serve
    # the re-rank join's hash partitioning, so at serve time it is a
    # pure extra full-corpus exchange.
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .withColumn("nrm", S.norm(F.col("emb")))
    )
    if spread:
        n_part = max(1, spark.sparkContext.defaultParallelism)
        e = e.repartition(n_part)
    return e


def _sq_codes(e: DataFrame) -> DataFrame:
    """Batch half of the SQ lifecycle: int8 codes per (vector, dim)
    under the per-dim min/max scale params (the 64-row codebook)."""
    long = e.select("vec_id", F.posexplode("emb").alias("pos", "v")).select(
        "vec_id", (F.col("pos") + 1).alias("dim"), "v"
    )
    # per-dim codebook (64 rows) — min/max are exact, broadcastable
    stats = long.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.floor((F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255.0),
    ).otherwise(F.lit(0)).cast("bigint")
    return long.join(F.broadcast(stats), "dim").select(
        "vec_id", "dim", code.alias("code")
    )


def q_emb_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _sq_corpus(spark, sf_dir)
    return _sq_search(e, _sq_codes(e))


def ensure_sq_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build-once half of the SQ serving lifecycle
    (VERDICT r7 item 1): encode the corpus once — the scale params are
    baked into the persisted codes, so a search needs only the code
    table. The query codes ride in the same table (a query IS a corpus
    vector here), so serve does zero re-encoding."""
    import os

    cfg = f"sq255q{_SQ_N_QUERIES}f1"
    path = _artifact_path("sfp_sq_serve_", sf_dir, "embeddings", cfg)
    if not os.path.exists(path):
        e = _sq_corpus(spark, sf_dir)
        # file count by bytes, not shuffle partitions (guide §6): the
        # encode shuffle's 32 partitions otherwise become 32 tiny files
        # every serve scan re-opens
        codes = _sq_codes(e).repartition(_store_nparts(sf_dir, "embeddings"))
        _publish_atomically(
            lambda p: codes.write.mode("overwrite").parquet(p), path
        )
    return path


def q_emb_sq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-ONLY SQ ANN latency: first call encodes + persists the int8
    code table (bench warm-up absorbs it); every later call loads it
    and searches — no corpus explode, no min/max pass. Bit-identical to
    ``q_emb_sq_topk`` (asserted by tests/test_ivfpq.py)."""
    path = ensure_sq_index(spark, sf_dir)
    e = _sq_corpus(spark, sf_dir, spread=False)
    # schema-pinned (r14): skips the footer-inference job
    return _sq_search(
        e, spark.read.schema("vec_id bigint, dim int, code bigint").parquet(path)
    )


def _sq_search(e: DataFrame, codes: DataFrame) -> DataFrame:
    """Query half of the SQ lifecycle, shared bit-for-bit by the
    train-in-query row and the serve path: integer approximate dots
    over the code table -> top ``_SQ_CANDIDATES`` -> exact cosine
    re-rank against the raw vectors."""
    q_codes = codes.filter(F.col("vec_id") < _SQ_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "dim", F.col("code").alias("q_code")
    )
    # integer approximate dot products: exact under any aggregation order
    approx = (
        codes.join(F.broadcast(q_codes), "dim")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum(F.col("q_code") * F.col("code")).alias("adot"))
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("adot").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        approx.withColumn("rn", F.row_number().over(w_cand))
        .filter(F.col("rn") <= _SQ_CANDIDATES)
        .select("query_id", "neighbor_id")
    )
    qv = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    nv = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    sims = (
        cand.join(F.broadcast(qv), "query_id")
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
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") <= _SQ_TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# MinHash + SimHash signatures, and the banded / blocked near-pair joins
# ---------------------------------------------------------------------------

_N_HASHES = 16
_BAND_SIZE = 4

#: SimHash near-dup Hamming threshold. d=3 over the 32-bit signature
#: keeps the pigeonhole blocks 8 bits wide (buckets of N/256) AND the
#: output near-dup-sized: the r6 sf0.1 self-check caught the previous
#: d=10 emitting 7.0M pairs on 5,000 docs (>50% of the pair space —
#: quadratic OUTPUT, a driver-collect OOM at 10x the checked scale);
#: d=3 emits 725 pairs at sf0.01 / 83k at sf0.1. Signatures over
#: vocabulary-sharing corpora concentrate, so the 100 TB contract is
#: 64-bit signatures with d <= 6 (operators/similarity.py:340 note).
_SIMHASH_MAX_DIST = 3


def _minhash_ctes() -> str:
    """The toks/sh/mh CTE bodies (no WITH, no final SELECT)."""
    mins = ",\n    ".join(
        f"min(md5('{i}#' || shingle)) AS mh{i}" for i in range(_N_HASHES)
    )
    return f"""toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(w) - 2),
                i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM toks
),
mh AS (
  SELECT doc_id,
    {mins}
  FROM sh GROUP BY doc_id
)"""


def _bands_select() -> str:
    bands = ",\n  ".join(
        "md5("
        + " || '|' || ".join(
            f"mh{b * _BAND_SIZE + j}" for j in range(_BAND_SIZE)
        )
        + f") AS band{b}"
        for b in range(_N_HASHES // _BAND_SIZE)
    )
    return f"SELECT doc_id,\n  {bands}\nFROM mh"


def _minhash_oracle() -> str:
    return "WITH " + _minhash_ctes() + "\n" + _bands_select()


def _simhash_ctes(prefix: str = "") -> str:
    """CTE bodies for the SimHash signature (prefixable so they can share
    a WITH clause with the minhash CTEs without name collisions)."""
    votes = ",\n    ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(S.N_SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(S.N_SIMHASH_BITS)
    )
    return f"""{prefix}toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
{prefix}hashed AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM {prefix}toks
),
{prefix}votes AS (
  SELECT doc_id,
    {votes}
  FROM {prefix}hashed GROUP BY doc_id
),
{prefix}sig AS (
  SELECT doc_id, CAST({sig} AS BIGINT) AS simhash
  FROM {prefix}votes
)"""


@register(
    "doc_signatures",
    "WITH "
    + _minhash_ctes()
    + ",\n"
    + _simhash_ctes("s_")
    + f"""
SELECT m.doc_id, m.band0, m.band1, m.band2, m.band3, s.simhash
FROM ({_bands_select()}) m
JOIN s_sig s ON m.doc_id = s.doc_id
""",
    survey="§2.9 dedup-minhash + dedup-simhash (shingle->md5-min->LSH bands; token bit-vote signature, exact int math)",
)
def q_doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    mh = S.minhash_signatures(
        d, "doc_id", "text", n_hashes=_N_HASHES, band_size=_BAND_SIZE
    )
    sh = S.simhash(d, "doc_id", "text")
    return mh.join(sh, "doc_id")


@register(
    "doc_near_pairs",
    "WITH "
    + _minhash_ctes()
    + ",\nbands AS (\n"
    + _bands_select()
    + "\n),\nstacked AS (\n"
    + "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_no, band{b} AS band_hash FROM bands"
        for b in range(_N_HASHES // _BAND_SIZE)
    )
    + "\n),\ncand AS (\n"
    + """  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM stacked a JOIN stacked b
    ON a.band_hash = b.band_hash AND a.band_no = b.band_no AND a.doc_id < b.doc_id
),
"""
    + _simhash_ctes("s_")
    + f"""
SELECT 'minhash_band' AS method, id_a, id_b, CAST(NULL AS INT) AS hamming
FROM cand
UNION ALL
SELECT 'simhash' AS method, a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s_sig a JOIN s_sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_MAX_DIST}
UNION ALL
SELECT 'incr_store' AS method, id_a, id_b, CAST(NULL AS INT) AS hamming
FROM cand WHERE id_a % 5 = 0 OR id_b % 5 = 0
""",
    survey="§2.9 dedup-minhash banded candidate pairs + dedup-simhash pigeonhole-blocked Hamming pairs + incremental batch-vs-persisted-store probe",
)
def q_doc_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    mh_sig = S.minhash_signatures(
        d, "doc_id", "text", n_hashes=_N_HASHES, band_size=_BAND_SIZE
    )
    minhash = S.lsh_candidate_pairs(mh_sig, "doc_id").select(
        F.lit("minhash_band").alias("method"),
        "id_a",
        "id_b",
        F.lit(None).cast("int").alias("hamming"),
    )
    sh_sig = S.simhash(d, "doc_id", "text")
    simhash = S.hamming_pairs(
        sh_sig, "doc_id", max_distance=_SIMHASH_MAX_DIST
    ).select(
        F.lit("simhash").alias("method"), "id_a", "id_b", "hamming"
    )
    # incremental section: the persisted-store ingest lifecycle over a
    # 4:1 corpus/batch split (batch = doc_id % 5 == 0). The corpus'
    # bands are built ONCE and saved to parquet (ensure_*); the batch
    # is banded and probed against the LOADED store. Because a doc's
    # bands are a pure function of its text, the result is provably the
    # full recompute's pair set restricted to pairs touching >= 1 batch
    # doc — which is exactly what the oracle's filtered cand states.
    store = S.load_signature_store(
        spark,
        ensure_minhash_store(spark, sf_dir),
        schema="id bigint, band_hash string, band_no int",
    )
    batch_sigs = S.minhash_signatures(
        d.filter(F.col("doc_id") % 5 == 0),
        "doc_id",
        "text",
        n_hashes=_N_HASHES,
        band_size=_BAND_SIZE,
    )
    incr = S.incremental_candidate_pairs(batch_sigs, "doc_id", store).select(
        F.lit("incr_store").alias("method"),
        "id_a",
        "id_b",
        F.lit(None).cast("int").alias("hamming"),
    )
    return minhash.unionByName(simhash).unionByName(incr)


def ensure_minhash_store(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent batch half of incremental near-dedup: band the
    standing corpus (doc_id % 5 != 0) and persist the band table,
    partitioned by band_no. The 100 TB analog is the nightly signature
    build; every ingest afterwards probes it without re-banding the
    corpus."""
    import os

    path = _artifact_path(
        "sfp_mh_store_", sf_dir, "documents", f"h{_N_HASHES}b{_BAND_SIZE}f1"
    )
    if not os.path.exists(path):
        corpus = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 != 0
        )
        sigs = S.minhash_signatures(
            corpus, "doc_id", "text", n_hashes=_N_HASHES, band_size=_BAND_SIZE
        )
        _publish_atomically(
            lambda p: S.save_signature_store(
                sigs, "doc_id", p, nparts=_store_nparts(sf_dir, "documents")
            ),
            path,
        )
    return path


def q_doc_incr_dedup_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-only near-dedup latency (bench row): probe an incoming
    batch against the already-persisted corpus signature store — no
    corpus re-banding. The first call builds the store (absorbed by the
    bench warm-up, mirroring the nightly batch job); timed calls pay
    batch signatures + the store probe only."""
    store = S.load_signature_store(
        spark,
        ensure_minhash_store(spark, sf_dir),
        schema="id bigint, band_hash string, band_no int",
    )
    batch = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    batch_sigs = S.minhash_signatures(
        batch, "doc_id", "text", n_hashes=_N_HASHES, band_size=_BAND_SIZE
    )
    return S.incremental_candidate_pairs(batch_sigs, "doc_id", store)


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup (shared-shingle candidates, exact Jaccard)
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(w) - 2),
                i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM toks
),
sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT s.id_a, s.id_b,
       round(CAST(s.n_shared AS DOUBLE)
             / (sa.n_shingles + sb.n_shingles - s.n_shared), 6) AS jaccard
FROM shared s
JOIN sizes sa ON s.id_a = sa.doc_id
JOIN sizes sb ON s.id_b = sb.doc_id
WHERE CAST(s.n_shared AS DOUBLE) / (sa.n_shingles + sb.n_shingles - s.n_shared) >= 0.05
"""


def q_doc_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(S.shingles(F.col("text"))).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("nb")
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    )
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.05)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Train/eval contamination (decontamination audit): hash-split the corpus
# into train / held-out eval, count each eval doc's distinct k-gram
# overlaps with the training side (GPT-3 §C style), report per-source
# contamination rates. Merged as a section of `doc_ngram_jaccard` —
# same n-gram-overlap family, keeps the registry at 50 names.
# ---------------------------------------------------------------------------

_CONTAM_K = 5  # n-gram size (GPT-3 used 13; synthetic docs are short)
_CONTAM_MIN_OVERLAP = 3  # eval doc is contaminated at >= this many hits
_CONTAM_SALT = "eval1"  # hash-split salt; ~10% of docs go to eval
_CONTAM_RATE = 0.1

# doc_id % k is NOT a valid eval split here: the synthetic corpus sets
# source = src(doc_id % 20), so a modulus split collapses onto two
# sources. The md5-hash-uniform split (same map as operators/sampling)
# is independent of every id-derived attribute.
def _contam_split(ref: str = "doc_id") -> str:
    return (
        f"('0x' || substr(md5('{_CONTAM_SALT}' || CAST({ref} AS VARCHAR)), 1, 8))"
        f"::BIGINT / 4294967296.0 < {_CONTAM_RATE}"
    )

# Shared CTE fragment: the hash-split + k-gram shingle table. Used by
# the contamination audit AND the curation capstone's decontamination
# stage (there it shadows nothing: the dedup CTEs live inside the
# survivors subquery's own WITH scope).
_CONTAM_SH_CTES = f"""contoks AS (
  SELECT doc_id, source, string_split(text, ' ') AS w,
         {_contam_split()} AS is_eval
  FROM documents
),
consh AS (
  SELECT doc_id, source, is_eval,
         unnest(list_distinct(list_transform(
             generate_series(1, len(w) - {_CONTAM_K - 1}),
             i -> {" || ' ' || ".join(f"w[i + {j}]" for j in range(_CONTAM_K))})))
           AS shingle
  FROM contoks
)"""

_CONTAM_ORACLE = f"""
WITH {_CONTAM_SH_CTES},
hits AS (
  SELECT e.doc_id, count(*) AS n_overlap
  FROM consh e
  WHERE e.is_eval
    AND e.shingle IN (SELECT shingle FROM consh t WHERE NOT t.is_eval)
  GROUP BY e.doc_id
),
per_doc AS (
  SELECT d.doc_id, d.source, coalesce(h.n_overlap, 0) AS n_overlap
  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
  WHERE {_contam_split('d.doc_id')}
)
SELECT source,
       count(*) AS n_eval,
       CAST(sum(CASE WHEN n_overlap >= {_CONTAM_MIN_OVERLAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       round(CAST(sum(CASE WHEN n_overlap >= {_CONTAM_MIN_OVERLAP} THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS contamination_rate,
       CAST(max(n_overlap) AS BIGINT) AS max_overlap
FROM per_doc
GROUP BY source
"""


def q_doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.dedup import ngram_contamination
    from sec_financial_pipeline_spark.operators.sampling import hash_uniform

    d = load_table(spark, sf_dir, "documents")
    is_eval = hash_uniform(F.col("doc_id"), _CONTAM_SALT) < _CONTAM_RATE
    per_doc = ngram_contamination(
        d.filter(is_eval), d.filter(~is_eval), "doc_id", "text", k=_CONTAM_K
    )
    contaminated = (
        (F.col("n_overlap") >= _CONTAM_MIN_OVERLAP).cast("bigint")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(contaminated).alias("n_contaminated"),
        F.round(
            F.sum(contaminated).cast("double") / F.count(F.lit(1)), 6
        ).alias("contamination_rate"),
        F.max("n_overlap").alias("max_overlap"),
    )


# ---------------------------------------------------------------------------
# Corpus-LM fluency/rarity profile (CCNet-style LM filtering with the
# corpus' own bigram counts as the model; integer-exact by design —
# see operators/dedup.py::bigram_support_profile). Third section of
# doc_ngram_jaccard: same n-gram-statistics family, registry stays 50.
# ---------------------------------------------------------------------------

_FLU_CAP = 100
_FLU_RARE = 2

_FLUENCY_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
occ AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM toks,
  LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) u(i)
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM occ GROUP BY w1, w2)
SELECT o.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(least(c.c12, {_FLU_CAP})) AS BIGINT) AS support_sum,
       CAST(sum(CASE WHEN c.c12 <= {_FLU_RARE} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rare
FROM occ o JOIN c12 c ON c.w1 = o.w1 AND c.w2 = o.w2
GROUP BY o.doc_id
"""


def q_doc_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.dedup import (
        bigram_support_profile,
    )

    d = load_table(spark, sf_dir, "documents")
    return bigram_support_profile(
        d, "doc_id", "text", support_cap=_FLU_CAP, rare_max=_FLU_RARE
    )


# ---------------------------------------------------------------------------
# Edit-distance-verified fuzzy pairs (fourth section of doc_ngram_jaccard):
# the character-level verification modality — Levenshtein over the SAME
# shared-shingle candidate set the jaccard section scores, catching
# template-with-substitutions duplicates that token-set overlap blurs.
# Both engines compute plain character Levenshtein and one IEEE double
# division of exact integers, so the match is bit-exact unrounded.
# ---------------------------------------------------------------------------

_EDIT_MIN_SIM = 0.4

# ASCII CONSTRAINT (ADVICE r11): DuckDB's levenshtein is BYTE-based
# (levenshtein('é','a') = 2) while Spark's is CODEPOINT-based (= 1), so
# the bit-exact oracle parity below holds only while the corpus is
# pure ASCII (current testdata documents are — verified). If non-ASCII
# text ever enters the documents table the divergence is made LOUD by
# tests/test_oracle_parity.py::test_editdist_oracle_non_ascii_divergence,
# which pins the exact byte-vs-codepoint disagreement on 'é'.
_EDITDIST_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(w) - 2),
                i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM toks
),
sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
cand AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN sizes sa ON s.id_a = sa.doc_id
  JOIN sizes sb ON s.id_b = sb.doc_id
  WHERE CAST(s.n_shared AS DOUBLE)
        / (sa.n_shingles + sb.n_shingles - s.n_shared) >= 0.05
)
SELECT c.id_a, c.id_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
       1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
             / greatest(len(da.text), len(db.text)) AS edit_sim
FROM cand c
JOIN documents da ON da.doc_id = c.id_a
JOIN documents db ON db.doc_id = c.id_b
WHERE 1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
      / greatest(len(da.text), len(db.text)) >= {_EDIT_MIN_SIM}
"""


def q_doc_editdist_pairs(
    spark: SparkSession, sf_dir: str, cand: DataFrame | None = None
) -> DataFrame:
    from sec_financial_pipeline_spark.operators.dedup import (
        edit_distance_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    if cand is None:
        cand = q_doc_ngram_jaccard_pairs(spark, sf_dir)
    return edit_distance_pairs(
        d, cand.select("id_a", "id_b"), "doc_id", "text",
        min_sim=_EDIT_MIN_SIM,
    )


_NGRAM_SCHEMA = [
    ("id_a", "bigint"),
    ("id_b", "bigint"),
    ("jaccard", "double"),
    ("edit_dist", "bigint"),
    ("edit_sim", "double"),
    ("source", "string"),
    ("n_eval", "bigint"),
    ("n_contaminated", "bigint"),
    ("contamination_rate", "double"),
    ("max_overlap", "bigint"),
    ("doc_id", "bigint"),
    ("n_bigrams", "bigint"),
    ("support_sum", "bigint"),
    ("n_rare", "bigint"),
]

from sec_financial_pipeline_spark.registry.merge import (  # noqa: E402
    union_sections,
    union_sections_sql,
)

_NGRAM_MERGED_ORACLE = union_sections_sql(
    [
        ("jaccard", _JACCARD_ORACLE, ["id_a", "id_b", "jaccard"]),
        (
            "editdist",
            _EDITDIST_ORACLE,
            ["id_a", "id_b", "edit_dist", "edit_sim"],
        ),
        (
            "contamination",
            _CONTAM_ORACLE,
            ["source", "n_eval", "n_contaminated", "contamination_rate",
             "max_overlap"],
        ),
        (
            "fluency",
            _FLUENCY_ORACLE,
            ["doc_id", "n_bigrams", "support_sum", "n_rare"],
        ),
    ],
    _NGRAM_SCHEMA,
)


@register(
    "doc_ngram_jaccard",
    _NGRAM_MERGED_ORACLE,
    survey=(
        "§2.9 dedup-ngram-jaccard (shared-shingle candidates, exact Jaccard)"
        " + edit-distance-verified fuzzy pairs (character-level Levenshtein"
        " over the same bucketed candidates, JVM codegen)"
        " + train/eval n-gram contamination audit (GPT-3-style overlap"
        " decontamination; hash-split, semi-join counts, per-source rates)"
        " + corpus-LM bigram fluency/rarity profile (CCNet-style LM"
        " filtering signal, integer-exact: per-doc capped support sum and"
        " rare-bigram count against corpus bigram statistics)"
    ),
)
def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE persisted pair table feeds both the jaccard section and the
    # edit-distance verifier's candidate set (review finding: the
    # verifier previously re-built the whole shared-shingle self-join —
    # the merged query's heaviest stage — a second time)
    pairs = _track(q_doc_ngram_jaccard_pairs(spark, sf_dir).persist())
    return union_sections(
        [
            ("jaccard", pairs),
            ("editdist", q_doc_editdist_pairs(spark, sf_dir, cand=pairs)),
            ("contamination", q_doc_contamination(spark, sf_dir)),
            ("fluency", q_doc_fluency(spark, sf_dir)),
        ],
        _NGRAM_SCHEMA,
    )


# ---------------------------------------------------------------------------
# End-to-end near-dedup: MinHash bands -> candidates -> Jaccard verify ->
# drop verified dups -> survivors
# ---------------------------------------------------------------------------

# CTE chain shared by the end-to-end near-dedup oracle and the
# duplicate-cluster (connected components) oracle: shingles -> MinHash ->
# bands -> candidate pairs -> Jaccard-verified pairs.
_DEDUP_CTES = _minhash_ctes() + """,
bands AS (
  SELECT doc_id,
""" + ",\n".join(
    "    md5("
    + " || '|' || ".join(f"mh{b * _BAND_SIZE + j}" for j in range(_BAND_SIZE))
    + f") AS band{b}"
    for b in range(_N_HASHES // _BAND_SIZE)
) + """
  FROM mh
),
stacked AS (
""" + "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band_no, band{b} AS band_hash FROM bands"
    for b in range(_N_HASHES // _BAND_SIZE)
) + """
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM stacked a JOIN stacked b
    ON a.band_hash = b.band_hash AND a.band_no = b.band_no AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
verified AS (
  SELECT c.id_a, c.id_b,
         CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) AS jac
  FROM (
    SELECT c.id_a, c.id_b, count(*) AS n_shared
    FROM cand c
    JOIN sh x ON x.doc_id = c.id_a
    JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
    GROUP BY c.id_a, c.id_b
  ) j
  JOIN cand c ON c.id_a = j.id_a AND c.id_b = j.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
)"""

_E2E_DEDUP_ORACLE = "WITH " + _DEDUP_CTES + """,
dropped AS (SELECT DISTINCT id_b AS doc_id FROM verified WHERE jac >= 0.8)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def _near_dup_pairs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The shared front half of the near-dedup family: documents table +
    Jaccard-verified near-duplicate pairs (jac >= 0.8, id_a < id_b).
    Consumed by the end-to-end drop query AND the duplicate-cluster
    (connected components) query; the Spark twin of ``_DEDUP_CTES``."""
    d = load_table(spark, sf_dir, "documents")
    # ONE exploded shingle table, persisted: the MinHash signature agg,
    # the per-doc sizes, and both sides of the Jaccard verify join all
    # read it, and per-branch column pruning / filter pushdown rewrites
    # each branch's subtree differently, which defeats ReusedExchange —
    # so an explicit cache is the only way to compute the (most expensive)
    # explode once. CacheManager keys on the canonicalized plan, so every
    # call (and the curation capstone's reuse of this subtree) shares a
    # single entry rather than stacking copies. At 100 TB the same role
    # is played by materializing the shingle table to scratch storage.
    sh = _track(
        d.select("doc_id", F.explode(S.shingles(F.col("text"))).alias("shingle"))
        .repartition("doc_id")
        .persist()
    )
    sig = S.minhash_from_shingles(
        sh, "doc_id", n_hashes=_N_HASHES, band_size=_BAND_SIZE
    )
    cand = S.lsh_candidate_pairs(sig, "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingle").alias("shingle_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingle").alias("shingle_a"))
    # join b on BOTH (id_b, shingle) as equi-keys: joining on id alone and
    # post-filtering shingle equality materializes |sh_a| x |sh_b| rows
    # per candidate pair (O(pairs x shingles^2) blowup)
    n_shared = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle_a"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    )
    # pairs is tiny (the duplicate rate x N) but costs a candidate-gen +
    # two shingle joins to build; persisting lets the drop query, the
    # cluster query, and the curation capstone all reuse ONE build
    # (CacheManager dedupes across calls by canonical plan, like the
    # shingle cache above).
    pairs = _track(
        n_shared.join(sa, "id_a").join(sb, "id_b")
        .filter(jac >= 0.8)
        .select("id_a", "id_b")
        .persist()
    )
    return d, pairs


@register(
    "doc_near_dedup_end2end",
    _E2E_DEDUP_ORACLE,
    survey="§2.9 dedup-minhash end-to-end (bands -> candidates -> Jaccard verify -> drop)",
)
def q_doc_near_dedup_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, pairs = _near_dup_pairs(spark, sf_dir)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return d.join(dropped, "doc_id", "left_anti").select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Duplicate clusters: transitive closure of the verified near-dup pairs.
# Pairwise drop (above) under-merges: A~B and B~C put {A,B,C} in one
# cluster even when (A,C) never surfaced as a candidate pair. The oracle
# is a recursive CTE (min reachable id per node); the Spark side is the
# iterative connected-components operator.
# ---------------------------------------------------------------------------

_CLUSTERS_ORACLE = "WITH RECURSIVE " + _DEDUP_CTES + """,
pairs AS (SELECT id_a, id_b FROM verified WHERE jac >= 0.8),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
cc AS (
  SELECT src AS node, src AS root FROM edges
  UNION
  SELECT e.dst AS node, cc.root AS root
  FROM cc JOIN edges e ON e.src = cc.node
),
labels AS (SELECT node AS doc_id, min(root) AS cluster_rep FROM cc GROUP BY node),
csize AS (SELECT cluster_rep, count(*) AS cluster_size FROM labels GROUP BY cluster_rep)
SELECT l.doc_id, l.cluster_rep, c.cluster_size
FROM labels l JOIN csize c ON c.cluster_rep = l.cluster_rep
"""


def _dup_cluster_labels(spark: SparkSession, sf_dir: str):
    """(docs, CC labels) shared by the clusters and leakage_split
    sections (r14): each section used to run the iterative large-star /
    small-star contraction loop — eager localCheckpoints plus exact
    convergence counts — on its own, doubling every CC job inside the
    merged row. The label table is deterministic, so sharing it is
    value-neutral."""
    from sec_financial_pipeline_spark.operators.components import (
        connected_components,
    )

    d, pairs = _near_dup_pairs(spark, sf_dir)
    return d, connected_components(pairs, src="id_a", dst="id_b")


def q_doc_dup_clusters_only(
    spark: SparkSession, sf_dir: str, labels: DataFrame | None = None
) -> DataFrame:
    if labels is None:
        _, labels = _dup_cluster_labels(spark, sf_dir)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_rep"),
        "cluster_size",
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split (the `leakage_split` section):
# a naive per-document hash split LEAKS — a doc and its near-duplicate
# land in different splits, so eval rewards memorization. Splitting by
# the CLUSTER REPRESENTATIVE's hash instead assigns every member of a
# near-dup cluster to the same split by construction (zero straddling
# pairs — pinned by tests/test_components.py). Singleton docs (in no
# near-dup pair) are their own representative.
# ---------------------------------------------------------------------------

_SPLIT_SALT = "split1"
_SPLIT_VAL = 0.1  # [0.8, 0.9) -> val
_SPLIT_TEST = 0.1  # [0.9, 1.0) -> test


def _split_expr(ref: str) -> str:
    u = (
        f"('0x' || substr(md5('{_SPLIT_SALT}' || CAST({ref} AS VARCHAR)), 1, 8))"
        f"::BIGINT / 4294967296.0"
    )
    return (
        f"CASE WHEN {u} >= {1.0 - _SPLIT_TEST} THEN 'test' "
        f"WHEN {u} >= {1.0 - _SPLIT_TEST - _SPLIT_VAL} THEN 'val' "
        f"ELSE 'train' END"
    )


_LEAKAGE_SPLIT_ORACLE = "WITH RECURSIVE " + _DEDUP_CTES + f""",
pairs AS (SELECT id_a, id_b FROM verified WHERE jac >= 0.8),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
cc AS (
  SELECT src AS node, src AS root FROM edges
  UNION
  SELECT e.dst AS node, cc.root AS root
  FROM cc JOIN edges e ON e.src = cc.node
),
labels AS (SELECT node AS doc_id, min(root) AS rep FROM cc GROUP BY node),
assigned AS (
  SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep
  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
)
SELECT {_split_expr('rep')} AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters
FROM assigned
GROUP BY 1
"""


def leakage_safe_split(
    docs: DataFrame,
    id_col: str,
    pairs: DataFrame,
    cc_labels: DataFrame | None = None,
) -> DataFrame:
    """Per-document split assignment where every near-dup cluster lands
    whole in one split: label clusters (min-id representative via
    large-star/small-star CC), default singletons to themselves, hash the
    REPRESENTATIVE into train/val/test. Returns docs' ids +
    ``rep`` + ``split``. Scale shape: CC over the (tiny) verified pair
    set + one broadcastable label join + a per-row hash — the corpus
    is never shuffled on anything but the label join key.
    ``cc_labels`` (r14): a caller that already ran CC over the same
    pairs passes its (node, label) table to skip a second contraction
    loop."""
    from sec_financial_pipeline_spark.operators.components import (
        connected_components,
    )
    from sec_financial_pipeline_spark.operators.sampling import hash_uniform

    if cc_labels is None:
        cc_labels = connected_components(pairs, src="id_a", dst="id_b")
    labels = cc_labels.select(
        F.col("node").alias(id_col), F.col("label").alias("rep")
    )
    assigned = (
        docs.select(id_col)
        .join(labels, id_col, "left")
        .withColumn("rep", F.coalesce(F.col("rep"), F.col(id_col)))
    )
    u = hash_uniform(F.col("rep"), _SPLIT_SALT)
    split = (
        F.when(u >= 1.0 - _SPLIT_TEST, "test")
        .when(u >= 1.0 - _SPLIT_TEST - _SPLIT_VAL, "val")
        .otherwise("train")
    )
    return assigned.withColumn("split", split)


def q_doc_leakage_split(
    spark: SparkSession, sf_dir: str, labels: DataFrame | None = None
) -> DataFrame:
    d, pairs = _near_dup_pairs(spark, sf_dir)
    assigned = leakage_safe_split(d, "doc_id", pairs, cc_labels=labels)
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("rep").alias("n_clusters"),
    )


from sec_financial_pipeline_spark.registry.merge import (  # noqa: E402
    union_sections,
    union_sections_sql,
)

_CLUSTER_ROW_SCHEMA = [
    ("doc_id", "bigint"),
    ("cluster_rep", "bigint"),
    ("cluster_size", "bigint"),
    ("split", "string"),
    ("n_docs", "bigint"),
    ("n_clusters", "bigint"),
]


@register(
    "doc_dup_clusters",
    union_sections_sql(
        [
            (
                "clusters",
                _CLUSTERS_ORACLE,
                ["doc_id", "cluster_rep", "cluster_size"],
            ),
            (
                "leakage_split",
                _LEAKAGE_SPLIT_ORACLE,
                ["split", "n_docs", "n_clusters"],
            ),
        ],
        _CLUSTER_ROW_SCHEMA,
    ),
    survey=(
        "§2.9 dedup (transitive closure: connected components over"
        " verified near-dup pairs) + leakage-safe train/val/test split"
        " (split by cluster REPRESENTATIVE hash so a doc and its"
        " near-duplicates always share a split — zero straddling pairs,"
        " pinned by test)"
    ),
)
def q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one CC contraction loop feeds both sections (r14) — see
    # _dup_cluster_labels
    _, labels = _dup_cluster_labels(spark, sf_dir)
    return union_sections(
        [
            ("clusters", q_doc_dup_clusters_only(spark, sf_dir, labels=labels)),
            ("leakage_split", q_doc_leakage_split(spark, sf_dir, labels=labels)),
        ],
        _CLUSTER_ROW_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Near-dedup quality measurement: band-candidate RECALL against the exact
# ground truth (every pair with true Jaccard >= 0.8; the shared-shingle
# generator is complete — jac > 0 requires a shared shingle). Found
# pairs are a subset of true pairs by construction (candidates are
# verified with the exact Jaccard), so precision is 1.0 and the metric
# that can silently degrade is recall — the mirror of emb_ann_recall.
# ---------------------------------------------------------------------------

_DEDUP_RECALL_ORACLE = "WITH " + _DEDUP_CTES + """,
true_pairs AS (
  SELECT s.id_a, s.id_b
  FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  ) s
  JOIN sizes sa ON s.id_a = sa.doc_id
  JOIN sizes sb ON s.id_b = sb.doc_id
  WHERE CAST(s.n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - s.n_shared) >= 0.8
)
SELECT (SELECT count(*) FROM true_pairs) AS n_true,
       (SELECT count(*) FROM verified WHERE jac >= 0.8) AS n_found,
       round((SELECT count(*) FROM verified WHERE jac >= 0.8)
             / greatest((SELECT count(*) FROM true_pairs), 1) * 1.0, 6) AS recall
"""


@register(
    "doc_dedup_recall",
    _DEDUP_RECALL_ORACLE,
    survey="§2.9 dedup quality (MinHash-band candidate recall vs exact all-true-pairs ground truth; precision 1.0 by verify construction)",
)
def q_doc_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, pairs = _near_dup_pairs(spark, sf_dir)
    # identical plan to _near_dup_pairs' shingle cache -> CacheManager
    # serves it from the same entry; no second explode runs
    sh = _track(
        d.select("doc_id", F.explode(S.shingles(F.col("text"))).alias("shingle"))
        .repartition("doc_id")
        .persist()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    shared = (
        sh.select(F.col("doc_id").alias("id_a"), "shingle")
        .join(
            sh.select(F.col("doc_id").alias("id_b"), "shingle"),
            ["shingle"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    )
    true_pairs = (
        shared.join(sa, "id_a").join(sb, "id_b").filter(jac >= 0.8)
    )
    n_true = true_pairs.agg(F.count(F.lit(1)).alias("n_true"))
    n_found = pairs.agg(F.count(F.lit(1)).alias("n_found"))
    return n_true.crossJoin(n_found).select(
        "n_true",
        "n_found",
        F.round(
            F.col("n_found") / F.greatest(F.col("n_true"), F.lit(1)) * 1.0, 6
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# IVF ANN with a TRAINED coarse quantizer: k-means codebook (2 Lloyd
# iterations from fixed seed vectors, exact decimal means, rounded-cosine
# assignment with cluster-id tie-breaks) -> probe top-2 cells -> exact
# cosine re-rank within probed cells. The classic inverted-file trade:
# candidate set shrinks from N to ~N * (n_probe / n_cells).
# ---------------------------------------------------------------------------

_IVF_K = 8
_IVF_SEED_BASE = 16  # seeds = embeddings 16..23 (disjoint from query ids)
_IVF_ITER = 2


def _sql_cos(vec: str, cent: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({vec}.emb)), i -> {vec}.emb[i] * {cent}.cvec[i]))"
        f" / (sqrt(list_sum(list_transform({vec}.emb, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({cent}.cvec, x -> x * x))))"
    )


def _sql_assign(cents: str, src: str = "e") -> str:
    return f"""SELECT vec_id, cluster FROM (
    SELECT {src}.vec_id, c.cluster,
           row_number() OVER (PARTITION BY {src}.vec_id
                              ORDER BY round({_sql_cos(src, 'c')}, 6) DESC,
                                       c.cluster ASC) AS rn
    FROM {src} CROSS JOIN {cents} c
  ) WHERE rn = 1"""


def _sql_update(assign: str, src: str = "e") -> str:
    return f"""SELECT cluster, list(v ORDER BY dim) AS cvec FROM (
    SELECT a.cluster, u.dim AS dim,
           CAST(SUM(CAST(u.v AS DECIMAL(30,6))) AS DOUBLE) / COUNT(u.v) AS v
    FROM {assign} a JOIN {src} ON {src}.vec_id = a.vec_id,
    LATERAL (SELECT generate_subscripts({src}.emb, 1) AS dim, unnest({src}.emb) AS v) u
    GROUP BY a.cluster, u.dim
  ) GROUP BY cluster"""


def _ivf_oracle(n_probe: int = 2) -> str:
    """The trained-IVF top-k as SQL, parameterized by probe count (the
    recall sweep reuses it at several settings)."""
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
c0 AS (
  SELECT CAST(vec_id - {_IVF_SEED_BASE} AS INT) AS cluster, emb AS cvec
  FROM e WHERE vec_id BETWEEN {_IVF_SEED_BASE} AND {_IVF_SEED_BASE + _IVF_K - 1}
),
a1 AS ({_sql_assign('c0')}),
c1 AS ({_sql_update('a1')}),
a2 AS ({_sql_assign('c1')}),
c2 AS ({_sql_update('a2')}),
ranked AS (
  SELECT e.vec_id, c.cluster,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({_sql_cos('e', 'c')}, 6) DESC,
                                     c.cluster ASC) AS rn
  FROM e CROSS JOIN c2 c
),
assign AS (SELECT vec_id, cluster FROM ranked WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cluster FROM ranked WHERE rn <= {n_probe} AND vec_id < 5),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.cluster = p.cluster AND a.vec_id <> p.query_id
),
sims AS (
  SELECT c.query_id, c.neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] * n.emb[i]))
           / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
              * sqrt(list_sum(list_transform(n.emb, x -> x * x)))), 6) AS cosine_sim
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim FROM (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= 5
"""


_IVF_ORACLE = _ivf_oracle(2)


@register(
    "emb_ivf_ann",
    _IVF_ORACLE,
    survey="§2.9 similarity-search (IVF: k-means-trained codebook, 2 Lloyd iterations, 2-probe exact re-rank)",
)
def q_emb_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spark, sf_dir, n_probe=2)


def _ivf_trained(spark: SparkSession, sf_dir: str):
    """Shared IVF training: (cached corpus, collected codebook rows,
    codebook schema). Split out (r14) so the recall sweep trains ONCE
    across its probe settings instead of once per setting."""
    from sec_financial_pipeline_spark.operators import kmeans

    # per-vector norms materialized once (see q_emb_cosine_topk note)
    n_part = max(1, spark.sparkContext.defaultParallelism)
    # persisted: the corpus feeds every Lloyd update pass plus the final
    # probe + re-rank — per-branch pruning defeats ReusedExchange (same
    # rationale as the near-dedup shingle cache), so an explicit cache
    # is what makes training scan the parquet ONCE.
    e = _track(
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .withColumn("nrm", S.norm(F.col("emb")))
        .repartition(n_part)
        .persist()
    )
    seeds = e.filter(
        (F.col("vec_id") >= _IVF_SEED_BASE)
        & (F.col("vec_id") < _IVF_SEED_BASE + _IVF_K)
    ).select(
        (F.col("vec_id") - _IVF_SEED_BASE).cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    # r15 (guide §7.3 driver gaps): materialize=False — lloyd's eager
    # materialization collects the final codebook and re-creates it as
    # a local DataFrame, which the collect_codebook right here would
    # then collect AGAIN (two driver round-trip jobs for one bounded
    # table). Collecting the final update plan directly returns the
    # identical rows (collect_codebook sorts deterministically).
    cents = kmeans.lloyd(e, seeds, n_iter=_IVF_ITER, materialize=False)
    return e, kmeans.collect_codebook(cents), cents.schema


def _ivf_topk(
    spark: SparkSession, sf_dir: str, n_probe: int, trained=None
) -> DataFrame:
    from sec_financial_pipeline_spark.operators import kmeans

    e, rows, cschema = trained or _ivf_trained(spark, sf_dir)
    # r14 (guide §2.4/§8): the codebook is a literal, so the full-corpus
    # assignment is a pure map expression (formerly a crossJoin + two
    # window sorts over N x k rows, executed TWICE — once for the
    # assignment, once for the probes); the probe ranking only ever
    # needed the query vectors, so it sorts a k-element array per query
    # row instead of windowing the corpus. The probe table is bounded by
    # queries x n_probe, so it broadcasts and the assignment side is
    # never exchanged; candidates carry their own (emb, nrm) out of the
    # corpus scan, replacing the former join back onto e.
    scored = kmeans.scored_centroids(rows, cschema)
    assign = e.select(
        "vec_id", "emb", "nrm", F.array_max(scored)["cluster"].alias("cluster")
    )
    # r15 (guide §7.3): ONE broadcast of (query, probe cluster, query
    # vector) instead of two driver-blocking broadcast builds (probes,
    # then the query vectors joined back on query_id). The former
    # two-step join produced, per probe pair, the cluster's members
    # with the query vector attached 1:1 by query_id — attaching the
    # vector to the probe row up front yields the identical tuples
    # (q_emb/q_nrm duplicated n_probe times inside a 10-row broadcast).
    probes = (
        e.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(
                F.slice(F.reverse(F.array_sort(scored)), 1, n_probe)
            ).alias("p"),
        )
        .select(
            "query_id", "q_emb", "q_nrm",
            F.col("p")["cluster"].alias("cluster"),
        )
    )
    cand = (
        assign.join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("emb").alias("n_emb"),
            F.col("nrm").alias("n_nrm"),
            "q_emb",
            "q_nrm",
        )
    )
    sims = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            S.dot(F.col("q_emb"), F.col("n_emb"))
            / (F.col("q_nrm") * F.col("n_nrm")),
            6,
        ).alias("cosine_sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# ANN quality measurement: recall@5 of the trained IVF index against the
# brute-force ground truth, per query, SWEPT over probe counts — the
# textbook IVF evaluation curve (recall rises toward 1.0 as probes
# approach the cell count). Index QUALITY (not just speed) becomes a
# driver-checked, regression-visible number — if a codebook or probe
# change silently degrades the index, this row moves.
# ---------------------------------------------------------------------------

_RECALL_K = 5
_RECALL_PROBES = (1, 2, 4)

_ANN_RECALL_ORACLE = (
    f"""
WITH brute AS ({_COSINE_ORACLE}),
b5 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
    FROM brute
  ) WHERE rn <= {_RECALL_K}
),
"""
    + ",\n".join(f"ivf{p} AS ({_ivf_oracle(p)})" for p in _RECALL_PROBES)
    + "\n"
    + "\nUNION ALL\n".join(
        f"""SELECT {p} AS n_probe, i.query_id,
       round(count(b5.neighbor_id) / {_RECALL_K}.0, 6) AS recall_at_5
FROM ivf{p} i
LEFT JOIN b5 ON b5.query_id = i.query_id AND b5.neighbor_id = i.neighbor_id
GROUP BY i.query_id"""
        for p in _RECALL_PROBES
    )
)


@register(
    "emb_ann_recall",
    _ANN_RECALL_ORACLE,
    survey="§2.9 similarity-search quality (recall@5 vs probe-count curve of trained IVF against brute-force ground truth)",
)
def q_emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    brute = q_emb_cosine_topk(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    b5 = (
        brute.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECALL_K)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    out = None
    trained = _ivf_trained(spark, sf_dir)  # r14: one training, 3 sweeps
    for p in _RECALL_PROBES:
        r = (
            _ivf_topk(spark, sf_dir, n_probe=p, trained=trained)
            .join(b5, ["query_id", "neighbor_id"], "left_outer")
            .groupBy("query_id")
            .agg(
                F.round(F.count("hit") / float(_RECALL_K), 6).alias("recall_at_5")
            )
            .select(F.lit(p).alias("n_probe"), "query_id", "recall_at_5")
        )
        out = r if out is None else out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: split each vector into M subspaces, train
# a small k-means codebook per subspace (operators/kmeans.py), encode every
# vector as M one-byte codes, score queries by asymmetric distance
# computation (ADC: exact query-subvector x centroid dot, summed across
# subspaces), re-rank the top candidates exactly. Completes the
# quantization family (IVF = emb_ivf_ann, scalar = emb_sq_topk).
#
# Scale math: storage per vector drops from d doubles to M bytes (+ the
# shared M x k x (d/M) codebook); ADC scoring is a k x M lookup table per
# query instead of a d-dim dot per pair. Candidate set re-ranked exactly
# is <= PQ_CAND per query (64 = 1.3% of N at sf0.1).
# ---------------------------------------------------------------------------

_PQ_SLICES = ((1, 1, 32), (2, 33, 32))  # (m, start, length); d = 64
_PQ_SEED_BASE = 24  # seeds = embeddings 24..31 (disjoint from queries, IVF seeds)
_PQ_K = 8
_PQ_CAND = 64


def _pq_sub_ctes(m: int, start: int, length: int) -> str:
    end = start + length - 1
    return f"""e{m} AS (SELECT vec_id, emb[{start}:{end}] AS emb FROM e),
s{m} AS (SELECT CAST(vec_id - {_PQ_SEED_BASE} AS INT) AS cluster, emb AS cvec
         FROM e{m} WHERE vec_id BETWEEN {_PQ_SEED_BASE} AND {_PQ_SEED_BASE + _PQ_K - 1}),
a{m} AS ({_sql_assign(f's{m}', f'e{m}')}),
c{m} AS ({_sql_update(f'a{m}', f'e{m}')}),
code{m} AS ({_sql_assign(f'c{m}', f'e{m}')}),
qd{m} AS (
  SELECT q.vec_id AS query_id, c.cluster,
         list_sum(list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] * c.cvec[i])) AS pd
  FROM e{m} q CROSS JOIN c{m} c WHERE q.vec_id < 5
),
part{m} AS (
  SELECT qd{m}.query_id, code{m}.vec_id, qd{m}.pd
  FROM code{m} JOIN qd{m} ON qd{m}.cluster = code{m}.cluster
)"""


_PQ_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
{_pq_sub_ctes(*_PQ_SLICES[0])},
{_pq_sub_ctes(*_PQ_SLICES[1])},
approx AS (
  SELECT p1.query_id, p1.vec_id, p1.pd + p2.pd AS pd
  FROM part1 p1 JOIN part2 p2 ON p1.query_id = p2.query_id AND p1.vec_id = p2.vec_id
),
cand AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(pd, 6) DESC, vec_id ASC) AS rn
    FROM approx WHERE vec_id <> query_id
  ) WHERE rn <= {_PQ_CAND}
),
sims AS (
  SELECT c.query_id, c.neighbor_id,
         round(list_sum(list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] * n.emb[i]))
               / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                  * sqrt(list_sum(list_transform(n.emb, x -> x * x)))), 6) AS cosine_sim
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim FROM (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= 5
"""


def _pq_subspaces(e: DataFrame) -> DataFrame:
    """One row per (vector, subspace) with the sliced vector + norm."""
    return e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("emb", start, length).alias("emb"),
                    )
                    for m, start, length in _PQ_SLICES
                ]
            )
        ).alias("s"),
    ).select(
        "vec_id", F.col("s.m").alias("m"), F.col("s.emb").alias("emb")
    ).withColumn("nrm", S.norm(F.col("emb")))


def _train_pq(spark: SparkSession, sf_dir: str):
    """Batch half of the PQ lifecycle: (persisted corpus, per-subspace
    codebooks, corpus code table). Both codebooks train / encode in a
    single pass over the corpus (kmeans group_cols), not M sequential
    loops — measured ~2x faster and one driver round-trip per iteration
    at any M."""
    from sec_financial_pipeline_spark.operators import kmeans

    n_part = max(1, spark.sparkContext.defaultParallelism)
    # persisted: feeds the subspace pipeline (training + encode + query
    # ADC tables) and the exact re-rank — same rationale as the IVF cache
    e = _track(
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .repartition(n_part)
        .persist()
    )
    sub = _pq_subspaces(e)
    seeds = sub.filter(
        (F.col("vec_id") >= _PQ_SEED_BASE)
        & (F.col("vec_id") < _PQ_SEED_BASE + _PQ_K)
    ).select(
        "m",
        (F.col("vec_id") - _PQ_SEED_BASE).cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    cb = kmeans.lloyd(sub, seeds, n_iter=1, group_cols=["m"])
    code = kmeans.assign_clusters(sub, cb, group_cols=["m"])
    return e, cb, code


def _pq_search(e: DataFrame, cb: DataFrame, code: DataFrame) -> DataFrame:
    """Query half of the PQ lifecycle, shared bit-for-bit by the
    train-in-query row and the serve path: ADC-score every encoded
    vector (query subspace dots against the broadcast codebooks, summed
    across subspaces), take the top ``_PQ_CAND``, exact-re-rank.
    ``cb``/``code`` may be live plans or parquet-loaded (the round-trip
    is exact, so results are identical either way)."""
    qd = (
        _pq_subspaces(e.filter(F.col("vec_id") < 5))
        .join(F.broadcast(cb), "m")
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "cluster",
            S.dot(F.col("emb"), F.col("cvec")).alias("pd"),
        )
    )
    # ADC score = sum of per-subspace dots; pivot to fixed columns so the
    # M-way sum has a deterministic order at any M
    parts = code.join(qd, ["m", "cluster"]).select("query_id", "vec_id", "m", "pd")
    approx = (
        parts.groupBy("query_id", "vec_id")
        .pivot("m", [m for m, _, _ in _PQ_SLICES])
        .agg(F.first("pd"))
        .select(
            "query_id",
            "vec_id",
            sum(
                (F.col(str(m)) for m, _, _ in _PQ_SLICES), F.lit(0.0)
            ).alias("pd"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("pd"), 6).desc(), F.col("vec_id").asc()
    )
    cands = (
        approx.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PQ_CAND)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    full = e.withColumn("nrm", S.norm(F.col("emb")))
    qv = full.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    nv = full.select(
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
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


def q_emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e, cb, code = _train_pq(spark, sf_dir)
    return _pq_search(e, cb, code)


def ensure_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build-once half of the PQ serving lifecycle
    (VERDICT r7 item 1 — the ``ensure_ivfpq_index`` pattern generalized
    to the PQ family): train the per-subspace codebooks, encode the
    corpus, persist both (codes partitioned by ``m`` — the ADC probe's
    leading join key). At 100 TB this is the nightly batch job; every
    search job afterwards pays ZERO training cost."""
    import os

    cfg = f"pq{_PQ_K}s{_PQ_SEED_BASE}sl{_PQ_SLICES}f1"
    path = _artifact_path("sfp_pq_serve_", sf_dir, "embeddings", cfg)
    if not os.path.exists(path):
        _, cb, code = _train_pq(spark, sf_dir)

        def build(p: str) -> None:
            # writer-task count by bytes (guide §6): without it every
            # m-partition dir gets one file per upstream shuffle
            # partition
            n = _store_nparts(sf_dir, "embeddings")
            cb.repartition(1).write.mode("overwrite").parquet(f"{p}/cb")
            code.repartition(n, "m").write.mode("overwrite").partitionBy(
                "m"
            ).parquet(f"{p}/codes")

        _publish_atomically(build, path)
    return path


def q_emb_pq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-ONLY PQ ANN latency: first call builds + persists codebooks
    and codes (absorbed by the bench warm-up, mirroring the batch-train
    job); every later call loads them from parquet and searches — no
    Lloyd pass, no corpus re-encode, no corpus-wide cache. Results are
    bit-identical to ``q_emb_pq_topk`` (asserted by
    tests/test_ivfpq.py::test_pq_serve_path_matches_train_and_query)."""
    path = ensure_pq_index(spark, sf_dir)
    e = _ivfpq_corpus(spark, sf_dir, persist=False).drop("nrm")
    # schema-pinned (r14): skips the footer-inference job per read
    cb = spark.read.schema(
        "m int, cluster int, cvec array<double>, c_nrm double"
    ).parquet(f"{path}/cb")
    code = spark.read.schema("vec_id bigint, cluster int, m int").parquet(
        f"{path}/codes"
    )
    return _pq_search(e, cb, code)


# ---------------------------------------------------------------------------
# IVF-PQ composed index (operators/ivfpq.py) as a driver-checked query:
# build (coarse k-means -> residual-PQ codebooks) -> SAVE to parquet
# (codes cell-partitioned) -> LOAD -> 2-probe ADC search -> exact re-rank.
# The oracle replays the whole lifecycle in SQL: coarse Lloyd pass,
# per-cell residuals, per-subspace residual codebooks, ADC scoring of
# probed cells, bounded exact re-rank. Save/load cannot change results
# (parquet round-trip is exact), so the oracle checks the search math
# while the Spark side additionally exercises persistence.
# ---------------------------------------------------------------------------

_IVFPQ_PROBE = 2
_IVFPQ_RERANK = 50
_IVFPQ_TOP_K = 5


def _sql_cosf(vec: str, cent: str, floor_cent: bool) -> str:
    """Cosine with the member-norm floor of ivfpq._subspaces (1e-12);
    ``floor_cent`` floors the centroid norm too (seed codebooks, whose
    norms come through _subspaces; trained codebooks carry plain norms)."""
    cn = f"sqrt(list_sum(list_transform({cent}.cvec, x -> x * x)))"
    if floor_cent:
        cn = f"greatest({cn}, 1e-12)"
    return (
        f"list_sum(list_transform(generate_series(1, len({vec}.emb)), i -> {vec}.emb[i] * {cent}.cvec[i]))"
        f" / (greatest(sqrt(list_sum(list_transform({vec}.emb, x -> x * x))), 1e-12) * {cn})"
    )


def _sql_assignf(cents: str, src: str, floor_cent: bool) -> str:
    return f"""SELECT vec_id, cluster FROM (
    SELECT {src}.vec_id, c.cluster,
           row_number() OVER (PARTITION BY {src}.vec_id
                              ORDER BY round({_sql_cosf(src, 'c', floor_cent)}, 6) DESC,
                                       c.cluster ASC) AS rn
    FROM {src} CROSS JOIN {cents} c
  ) WHERE rn = 1"""


def _ivfpq_sub_ctes(m: int, start: int, length: int) -> str:
    """Residual-subspace CTEs for subspace ``m``: slice -> seed codebook
    (cluster = rank within the sorted seed list = vec_id - base here) ->
    one Lloyd iteration -> final codes -> per-query ADC partials."""
    end = start + length - 1
    return f"""r{m} AS (SELECT vec_id, resid[{start}:{end}] AS emb FROM resid),
ps{m} AS (SELECT CAST(vec_id - {_PQ_SEED_BASE} AS INT) AS cluster, emb AS cvec
          FROM r{m} WHERE vec_id BETWEEN {_PQ_SEED_BASE} AND {_PQ_SEED_BASE + _PQ_K - 1}),
pa{m} AS ({_sql_assignf(f'ps{m}', f'r{m}', True)}),
pc{m} AS ({_sql_update(f'pa{m}', f'r{m}')}),
code{m} AS ({_sql_assignf(f'pc{m}', f'r{m}', False)}),
qd{m} AS (
  SELECT qr.query_id, qr.cell, c.cluster AS code,
         list_sum(list_transform(generate_series(1, len(qr.emb)), i -> qr.emb[i] * c.cvec[i])) AS pd
  FROM (SELECT query_id, cell, resid[{start}:{end}] AS emb FROM qresid) qr
  CROSS JOIN pc{m} c
)"""


_IVFPQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
c0 AS (
  SELECT CAST(vec_id - {_IVF_SEED_BASE} AS INT) AS cluster, emb AS cvec
  FROM e WHERE vec_id BETWEEN {_IVF_SEED_BASE} AND {_IVF_SEED_BASE + _IVF_K - 1}
),
a1 AS ({_sql_assign('c0')}),
c1 AS ({_sql_update('a1')}),
cellmap AS ({_sql_assign('c1')}),
resid AS (
  SELECT e.vec_id, a.cluster AS cell,
         list_transform(generate_series(1, len(e.emb)), i -> e.emb[i] - c.cvec[i]) AS resid
  FROM e JOIN cellmap a ON a.vec_id = e.vec_id JOIN c1 c ON c.cluster = a.cluster
),
qcos AS (
  SELECT q.vec_id AS query_id, c.cluster AS cell, c.cvec,
         round({_sql_cos('q', 'c')}, 6) AS cos
  FROM e q CROSS JOIN c1 c WHERE q.vec_id < 5
),
probes AS (
  SELECT query_id, cell, cvec FROM (
    SELECT query_id, cell, cvec,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, cell ASC) AS rn
    FROM qcos
  ) WHERE rn <= {_IVFPQ_PROBE}
),
qresid AS (
  SELECT p.query_id, p.cell,
         list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] - p.cvec[i]) AS resid
  FROM probes p JOIN e q ON q.vec_id = p.query_id
),
{_ivfpq_sub_ctes(*_PQ_SLICES[0])},
{_ivfpq_sub_ctes(*_PQ_SLICES[1])},
codes AS (
  SELECT cm.vec_id, cm.cell, 1 AS m, c.cluster AS code
  FROM code1 c JOIN resid cm ON cm.vec_id = c.vec_id
  UNION ALL
  SELECT cm.vec_id, cm.cell, 2 AS m, c.cluster AS code
  FROM code2 c JOIN resid cm ON cm.vec_id = c.vec_id
),
adc AS (
  SELECT query_id, cell, 1 AS m, code, pd FROM qd1
  UNION ALL
  SELECT query_id, cell, 2 AS m, code, pd FROM qd2
),
scores AS (
  SELECT a.query_id, c.vec_id, sum(a.pd) AS approx, count(*) AS n_m
  FROM codes c JOIN adc a ON a.cell = c.cell AND a.m = c.m AND a.code = c.code
  GROUP BY a.query_id, c.vec_id
),
cand AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(approx, 6) DESC, vec_id ASC) AS rn
    FROM scores WHERE n_m = {len(_PQ_SLICES)} AND vec_id <> query_id
  ) WHERE rn <= {_IVFPQ_RERANK}
),
sims AS (
  SELECT c.query_id, c.neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] * n.emb[i]))
           / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
              * sqrt(list_sum(list_transform(n.emb, x -> x * x)))), 6) AS cosine_sim
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim FROM (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= {_IVFPQ_TOP_K}
"""


def _ivfpq_corpus(spark: SparkSession, sf_dir: str, persist: bool = True):
    """Normed corpus view of the embeddings table (optionally cached —
    training makes several passes; a serve-only search does not).

    The explicit repartition rides with ``persist`` (r14, guide §2.4):
    training wants the exchange as a materialization barrier before the
    multi-branch Lloyd passes, but the serve paths (persist=False) only
    re-rank a bounded candidate set — there the round-robin exchange
    cannot serve the re-rank join's hash partitioning and is a pure
    extra full-corpus shuffle per call."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .withColumn("nrm", S.norm(F.col("emb")))
    )
    if not persist:
        return e
    n_part = max(1, spark.sparkContext.defaultParallelism)
    return _track(e.repartition(n_part).persist())


def _train_ivfpq(spark: SparkSession, sf_dir: str):
    """Batch-train half of the index lifecycle: (persisted corpus,
    trained IvfPqIndex) with the fixed seed/slice config every IVF-PQ
    query in this registry shares."""
    from sec_financial_pipeline_spark.operators import ivfpq

    # persisted: feeds coarse training, residual encode, and the exact
    # re-rank (same rationale as the IVF/PQ query caches)
    e = _ivfpq_corpus(spark, sf_dir)
    coarse_seeds = e.filter(
        (F.col("vec_id") >= _IVF_SEED_BASE)
        & (F.col("vec_id") < _IVF_SEED_BASE + _IVF_K)
    ).select(
        (F.col("vec_id") - _IVF_SEED_BASE).cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    index = ivfpq.build_index(
        e,
        coarse_seeds,
        pq_seed_ids=list(range(_PQ_SEED_BASE, _PQ_SEED_BASE + _PQ_K)),
        slices=_PQ_SLICES,
        n_iter=1,
    )
    return e, index


def _ivfpq_search(spark: SparkSession, e: DataFrame, path: str) -> DataFrame:
    """Query half: search against the index LOADED from ``path``."""
    from sec_financial_pipeline_spark.operators import ivfpq

    loaded = ivfpq.load_index(spark, path)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "emb", "nrm"
    )
    return ivfpq.search(
        e,
        queries,
        loaded,
        n_probe=_IVFPQ_PROBE,
        rerank=_IVFPQ_RERANK,
        top_k=_IVFPQ_TOP_K,
    )


def _artifact_path(prefix: str, sf_dir: str, src_table: str, config: str) -> str:
    """Path for a persisted build-once artifact, keyed by sf_dir, the
    source file's mtime (regenerated testdata never hits a stale
    artifact), and the build configuration (a retune of hashes/bands/
    seeds invalidates rather than silently mismatching)."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, f"{src_table}.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    tag = hashlib.md5(f"{sf_dir}@{mtime}@{config}".encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"{prefix}{tag}")


def _store_nparts(
    sf_dir: str, src_table: str, target_bytes: int = 128 << 20
) -> int:
    """File count for a persisted store, derived from the SOURCE
    table's on-disk bytes (r14, guide §6: size output files into the
    128 MB–1 GB band; a core-count-derived file count writes tiny
    files locally AND stays constant as data grows — wrong at both
    ends). Locally this yields 1 file per store component; at 100 TB
    the same rule yields thousands."""
    import math
    import os

    src = os.path.join(sf_dir, f"{src_table}.parquet")
    sz = os.path.getsize(src) if os.path.exists(src) else 0
    return max(1, math.ceil(sz / target_bytes))


def _publish_atomically(build, path: str) -> None:
    """Cross-process-safe build-once: materialize into a unique sibling
    temp dir, then rename into place. Readers (which gate on
    ``os.path.exists(path)``) see either nothing or a complete
    artifact; a concurrent loser discards its build — the winner's is
    equivalent (deterministic pipeline) — instead of overwriting a
    store another process may be mid-read on."""
    import os
    import shutil
    import uuid

    tmp = f"{path}.build-{os.getpid()}-{uuid.uuid4().hex[:6]}"
    build(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


def _ivfpq_index_path(sf_dir: str, suffix: str = "") -> str:
    cfg = (
        f"k{_IVF_K}s{_IVF_SEED_BASE}i{_IVF_ITER}p{_PQ_SEED_BASE}"
        f"q{_PQ_K}sl{_PQ_SLICES}f1"
    )
    return _artifact_path(f"sfp_ivfpq_{suffix}", sf_dir, "embeddings", cfg)


def q_emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators import ivfpq

    e, index = _train_ivfpq(spark, sf_dir)
    # the lifecycle the query certifies: the trained index round-trips
    # through parquet (codes partitioned by cell — a probe prunes files
    # before any shuffle) and search runs against the LOADED copy. The
    # save is published atomically so a concurrent process mid-read on
    # the shared path never sees a half-overwritten index (the loser's
    # build is byte-equivalent — the pipeline is deterministic).
    path = _ivfpq_index_path(sf_dir)
    _publish_atomically(lambda p: ivfpq.save_index(index, p), path)
    return _ivfpq_search(spark, e, path)


def ensure_ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build-once half of the serving lifecycle: train + save
    the IVF-PQ index for ``sf_dir`` unless a persisted copy already
    exists; returns its path. At 100 TB this is the nightly batch job;
    every search job afterwards pays ZERO training cost."""
    import os

    from sec_financial_pipeline_spark.operators import ivfpq

    path = _ivfpq_index_path(sf_dir, suffix="serve_")
    if not os.path.exists(path):
        _, index = _train_ivfpq(spark, sf_dir)
        _publish_atomically(
            lambda p: ivfpq.save_index(
                index, p, nparts=_store_nparts(sf_dir, "embeddings")
            ),
            path,
        )
    return path


def q_emb_ivfpq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-ONLY ANN latency — the number a serving story needs
    (VERDICT r06 item 2). First call builds + persists the index (the
    bench warm-up absorbs it, mirroring the batch-train job); every
    later call loads codebooks/codes from parquet and searches, with no
    Lloyd pass and no corpus-wide cache. Result is bit-identical to
    ``q_emb_ivfpq_topk`` (same seeds/slices/probe/rerank — asserted by
    tests/test_ivfpq.py)."""
    path = ensure_ivfpq_index(spark, sf_dir)
    e = _ivfpq_corpus(spark, sf_dir, persist=False)
    return _ivfpq_search(spark, e, path)


# ---------------------------------------------------------------------------
# IVF-PQ MAINTAINED index (fourth section, r14 — VERDICT r13 item 6,
# mirroring r13's bm25_maint): the served store here is not a one-shot
# build but the survivor of the saved-index maintenance lifecycle —
# build+save over an INITIAL corpus slice → APPEND the remainder
# (encoded under the frozen codebooks, cell-partition parquet append,
# operators/ivfpq.py:186) → DELETE a cross-cutting id set (code-table
# swap_rewrite, ivfpq.py:310; codebooks untouched) → search. The oracle
# replays exactly those semantics from scratch: coarse + residual-PQ
# codebooks trained on the INITIAL slice ONLY (deleted train vectors
# still shaped them — deletion removes codes, not codebook influence),
# codes derived for the LIVE set (initial ∪ appended, minus deleted),
# ADC + bounded exact re-rank as ever. Equality proves append encodes
# identically to build and delete removes candidates exactly.
# ---------------------------------------------------------------------------

#: appended after the initial build; seeds (16..31) and queries (0..4)
#: all sit below 100, so the training slice always contains them
_IVFPQM_APPEND = "vec_id >= 100 AND vec_id % 5 = 2"
#: deleted from the saved store; intersects BOTH the initial and the
#: appended slices (and stays clear of seeds/queries)
_IVFPQM_DELETE = "vec_id >= 100 AND vec_id % 11 = 7"


def _ivfpqm_sub_ctes(m: int, start: int, length: int) -> str:
    """Residual-subspace CTEs for the MAINTAINED index: PQ codebooks
    train on the initial slice's residuals (``residt``), final codes
    cover the live set's residuals (``residl``)."""
    end = start + length - 1
    return f"""rt{m} AS (SELECT vec_id, resid[{start}:{end}] AS emb FROM residt),
rl{m} AS (SELECT vec_id, resid[{start}:{end}] AS emb FROM residl),
ps{m} AS (SELECT CAST(vec_id - {_PQ_SEED_BASE} AS INT) AS cluster, emb AS cvec
          FROM rt{m} WHERE vec_id BETWEEN {_PQ_SEED_BASE} AND {_PQ_SEED_BASE + _PQ_K - 1}),
pa{m} AS ({_sql_assignf(f'ps{m}', f'rt{m}', True)}),
pc{m} AS ({_sql_update(f'pa{m}', f'rt{m}')}),
code{m} AS ({_sql_assignf(f'pc{m}', f'rl{m}', False)}),
qd{m} AS (
  SELECT qr.query_id, qr.cell, c.cluster AS code,
         list_sum(list_transform(generate_series(1, len(qr.emb)), i -> qr.emb[i] * c.cvec[i])) AS pd
  FROM (SELECT query_id, cell, resid[{start}:{end}] AS emb FROM qresid) qr
  CROSS JOIN pc{m} c
)"""


_IVFPQM_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
et AS (SELECT * FROM e WHERE NOT ({_IVFPQM_APPEND})),
c0 AS (
  SELECT CAST(vec_id - {_IVF_SEED_BASE} AS INT) AS cluster, emb AS cvec
  FROM e WHERE vec_id BETWEEN {_IVF_SEED_BASE} AND {_IVF_SEED_BASE + _IVF_K - 1}
),
a1 AS ({_sql_assign('c0', 'et')}),
c1 AS ({_sql_update('a1', 'et')}),
cellmap AS ({_sql_assign('c1', 'e')}),
resid AS (
  SELECT e.vec_id, a.cluster AS cell,
         list_transform(generate_series(1, len(e.emb)), i -> e.emb[i] - c.cvec[i]) AS resid
  FROM e JOIN cellmap a ON a.vec_id = e.vec_id JOIN c1 c ON c.cluster = a.cluster
),
residt AS (SELECT * FROM resid WHERE NOT ({_IVFPQM_APPEND})),
residl AS (SELECT * FROM resid WHERE NOT ({_IVFPQM_DELETE})),
qcos AS (
  SELECT q.vec_id AS query_id, c.cluster AS cell, c.cvec,
         round({_sql_cos('q', 'c')}, 6) AS cos
  FROM e q CROSS JOIN c1 c WHERE q.vec_id < 5
),
probes AS (
  SELECT query_id, cell, cvec FROM (
    SELECT query_id, cell, cvec,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, cell ASC) AS rn
    FROM qcos
  ) WHERE rn <= {_IVFPQ_PROBE}
),
qresid AS (
  SELECT p.query_id, p.cell,
         list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] - p.cvec[i]) AS resid
  FROM probes p JOIN e q ON q.vec_id = p.query_id
),
{_ivfpqm_sub_ctes(*_PQ_SLICES[0])},
{_ivfpqm_sub_ctes(*_PQ_SLICES[1])},
codes AS (
  SELECT cm.vec_id, cm.cell, 1 AS m, c.cluster AS code
  FROM code1 c JOIN residl cm ON cm.vec_id = c.vec_id
  UNION ALL
  SELECT cm.vec_id, cm.cell, 2 AS m, c.cluster AS code
  FROM code2 c JOIN residl cm ON cm.vec_id = c.vec_id
),
adc AS (
  SELECT query_id, cell, 1 AS m, code, pd FROM qd1
  UNION ALL
  SELECT query_id, cell, 2 AS m, code, pd FROM qd2
),
scores AS (
  SELECT a.query_id, c.vec_id, sum(a.pd) AS approx, count(*) AS n_m
  FROM codes c JOIN adc a ON a.cell = c.cell AND a.m = c.m AND a.code = c.code
  GROUP BY a.query_id, c.vec_id
),
cand AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(approx, 6) DESC, vec_id ASC) AS rn
    FROM scores WHERE n_m = {len(_PQ_SLICES)} AND vec_id <> query_id
  ) WHERE rn <= {_IVFPQ_RERANK}
),
sims AS (
  SELECT c.query_id, c.neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] * n.emb[i]))
           / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
              * sqrt(list_sum(list_transform(n.emb, x -> x * x)))), 6) AS cosine_sim
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim FROM (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= {_IVFPQ_TOP_K}
"""


def ensure_ivfpq_maintained_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-once artifact exercising the saved-index maintenance
    lifecycle (see the section comment above); keyed like every
    artifact by (sf_dir, source mtime, config tag), atomic-rename
    published. The append and delete run INSIDE the build so readers
    only ever see the fully-maintained store."""
    import os

    from sec_financial_pipeline_spark.operators import ivfpq

    cfg = (
        f"k{_IVF_K}s{_IVF_SEED_BASE}p{_PQ_SEED_BASE}q{_PQ_K}sl{_PQ_SLICES}"
        "-maint-app5.2-del11.7"
    )
    path = _artifact_path("sfp_ivfpqm_", sf_dir, "embeddings", cfg)
    if not os.path.exists(path):
        e = _ivfpq_corpus(spark, sf_dir)
        init = e.filter(~F.expr(_IVFPQM_APPEND))
        coarse_seeds = init.filter(
            (F.col("vec_id") >= _IVF_SEED_BASE)
            & (F.col("vec_id") < _IVF_SEED_BASE + _IVF_K)
        ).select(
            (F.col("vec_id") - _IVF_SEED_BASE).cast("int").alias("cluster"),
            F.col("emb").alias("cvec"),
            F.col("nrm").alias("c_nrm"),
        )
        index = ivfpq.build_index(
            init,
            coarse_seeds,
            pq_seed_ids=list(range(_PQ_SEED_BASE, _PQ_SEED_BASE + _PQ_K)),
            slices=_PQ_SLICES,
            n_iter=1,
        )

        def build(p: str) -> None:
            ivfpq.save_index(index, p)
            ivfpq.append_to_saved_index(
                spark, p, e.filter(F.expr(_IVFPQM_APPEND))
            )
            ivfpq.delete_from_saved_index(
                spark, p, e.filter(F.expr(_IVFPQM_DELETE)).select("vec_id")
            )

        _publish_atomically(build, path)
    return path


def q_emb_ivfpq_maint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve against the MAINTAINED store: identical probe/rerank/top-k
    search to ``q_emb_ivfpq_serve``, but the loaded code table is the
    append+delete survivor rather than a one-shot build."""
    path = ensure_ivfpq_maintained_index(spark, sf_dir)
    e = _ivfpq_corpus(spark, sf_dir, persist=False)
    return _ivfpq_search(spark, e, path)


# ---------------------------------------------------------------------------
# Consolidated registration for the quantization-family ANN indexes
# (identical (query_id, neighbor_id, cosine_sim) contract): keeps the
# registry inside the driver's 50-row hard-check window without dropping
# any index family's oracle coverage. Each constituent stays a standalone
# function above for bench / plan audits.
# ---------------------------------------------------------------------------

from sec_financial_pipeline_spark.registry.merge import (  # noqa: E402
    union_sections,
    union_sections_sql,
)

_QUANT_SCHEMA = [
    ("query_id", "bigint"),
    ("neighbor_id", "bigint"),
    ("cosine_sim", "double"),
]

_QUANT_COLS = ["query_id", "neighbor_id", "cosine_sim"]


@register(
    "emb_quantized_topk",
    union_sections_sql(
        [
            ("sq", _SQ_ORACLE, _QUANT_COLS),
            ("pq", _PQ_ORACLE, _QUANT_COLS),
            ("ivfpq", _IVFPQ_ORACLE, _QUANT_COLS),
            ("ivfpq_maint", _IVFPQM_ORACLE, _QUANT_COLS),
        ],
        _QUANT_SCHEMA,
    ),
    survey=(
        "§2.9 similarity-search (scalar quantization int8; product"
        " quantization ADC; IVF-PQ composed index with parquet save/load"
        " lifecycle — all with bounded exact re-rank"
        " + saved-index append/delete maintenance: frozen-codebook"
        " encode-and-append, swap-rewrite code deletion; served store =="
        " from-scratch over the surviving vectors)"
    ),
)
def q_emb_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_sections(
        [
            ("sq", q_emb_sq_topk(spark, sf_dir)),
            ("pq", q_emb_pq_topk(spark, sf_dir)),
            ("ivfpq", q_emb_ivfpq_topk(spark, sf_dir)),
            ("ivfpq_maint", q_emb_ivfpq_maint(spark, sf_dir)),
        ],
        _QUANT_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Capstone: the full training-data curation pipeline as one query —
# quality scoring -> near-dup removal -> per-language corpus stats.
# ---------------------------------------------------------------------------

_CURATION_ORACLE = f"""
WITH survivors AS ({_E2E_DEDUP_ORACLE}),
{_CONTAM_SH_CTES},
contaminated AS (
  SELECT e.doc_id
  FROM consh e
  WHERE NOT e.is_eval
    AND e.shingle IN (SELECT shingle FROM consh t WHERE t.is_eval)
  GROUP BY e.doc_id
  HAVING count(*) >= {_CONTAM_MIN_OVERLAP}
),
quality AS (
  SELECT doc_id,
         round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
               + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) * 0.5, 6) AS quality
  FROM documents
)
SELECT s.lang,
       count(*) AS n_docs,
       CAST(SUM(CAST(q.quality AS DECIMAL(30,6))) AS DOUBLE) / COUNT(q.quality) AS mean_quality
FROM survivors s
JOIN quality q ON s.doc_id = q.doc_id
WHERE q.quality >= 0.55
  AND NOT {_contam_split('s.doc_id')}
  AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)
GROUP BY s.lang
"""


# ---------------------------------------------------------------------------
# classifier: model-based quality filtering (operators/classifier.py) —
# hashed-ngram logistic regression trained with 2 unrolled full-batch
# GD steps (weights start at 0, so step 1's errors are exactly +-500
# milli; every order-sensitive sum is BIGINT — the same integer
# firewall as dsir/ppl). The oracle replays both steps in SQL. Labels:
# lang='en' is the curated reference stratum (the GPT-3 quality-
# classifier setup: reference-vs-pool, Brown et al. 2020 §A).
# ---------------------------------------------------------------------------

_CLS_BUCKETS = 256
_CLS_STEPS = 2


def _cls_oracle(steps: int, n_buckets: int) -> str:
    """Unrolled-GD oracle for the hashed logistic-regression classifier
    (operators/classifier.py): step k's CTEs (margin cz{k}, error
    ce{k}, gradient cg{k}, weights cw{k}) are generated mechanically so
    the SQL cannot drift from the step count. The bias is the constant
    bucket -1 feature (x = 1, delta carries the 1e6 unit factor).
    Every float expression mirrors the Spark operator TEXTUALLY (fold
    order); all sums are BIGINT."""
    ctes = [
        "ctoks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)",
        """cgrams AS (
  SELECT doc_id, unnest(w) AS g FROM ctoks
  UNION ALL
  SELECT doc_id, w[i] || ' ' || w[i+1] AS g
  FROM ctoks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
)""",
        "clen AS (SELECT doc_id, len(w) AS ln FROM ctoks)",
        f"""cfeat AS (
  SELECT c.doc_id, c.bucket,
         CAST(trunc(c.cnt * 1000.0 / l.ln) AS BIGINT) AS x
  FROM (SELECT doc_id,
               ('0x' || substr(md5(g), 1, 8))::BIGINT % {n_buckets} AS bucket,
               count(*) AS cnt
        FROM cgrams GROUP BY 1, 2) c
  JOIN clen l USING (doc_id)
  UNION ALL
  SELECT doc_id, CAST(-1 AS BIGINT) AS bucket, CAST(1 AS BIGINT) AS x
  FROM documents
)""",
        ("clab AS (SELECT doc_id, lang, CASE WHEN lang = 'en' THEN 1 ELSE 0"
         " END AS y FROM documents)"),
        "cn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)",
    ]

    def delta(bucket: str, g: str) -> str:
        return (
            f"CASE WHEN {bucket} = -1 THEN"
            f" CAST(trunc(((2.0 * {g}) * 1000000.0) / (SELECT n FROM cn))"
            f" AS BIGINT)"
            f" ELSE CAST(trunc((2.0 * {g}) / (SELECT n FROM cn)) AS BIGINT)"
            f" END"
        )

    for k in range(1, steps + 1):
        if k == 1:
            ctes.append(
                "cz1 AS (SELECT doc_id, CAST(0 AS BIGINT) AS z FROM clab)"
            )
        else:
            ctes.append(f"""cz{k} AS (
  SELECT f.doc_id, CAST(sum(f.x * coalesce(w.w, 0)) AS BIGINT) AS z
  FROM cfeat f LEFT JOIN cw{k - 1} w USING (bucket) GROUP BY f.doc_id
)""")
        ctes.append(f"""ce{k} AS (
  SELECT l.doc_id,
         CAST(round((1.0 / (1.0 + exp(-(CAST(z.z AS DOUBLE)) / 1000000000.0))
                     - l.y) * 1000.0, 0) AS BIGINT) AS err
  FROM clab l JOIN cz{k} z USING (doc_id)
)""")
        ctes.append(f"""cg{k} AS (
  SELECT f.bucket, CAST(sum(f.x * e.err) AS BIGINT) AS g
  FROM cfeat f JOIN ce{k} e USING (doc_id) GROUP BY 1
)""")
        if k == 1:
            ctes.append(
                f"cw1 AS (SELECT bucket, -({delta('bucket', 'g')}) AS w"
                f" FROM cg1)"
            )
        else:
            ctes.append(f"""cw{k} AS (
  SELECT w.bucket, w.w - ({delta('w.bucket', 'coalesce(g.g, 0)')}) AS w
  FROM cw{k - 1} w LEFT JOIN cg{k} g USING (bucket)
)""")
    ctes.append(f"""czf AS (
  SELECT f.doc_id, CAST(sum(f.x * coalesce(w.w, 0)) AS BIGINT) AS z
  FROM cfeat f LEFT JOIN cw{steps} w USING (bucket) GROUP BY f.doc_id
)""")
    ctes.append("ctot AS (SELECT CAST(sum(z) AS BIGINT) AS sz,"
                " CAST(count(*) AS BIGINT) AS nn FROM czf)")
    return "WITH " + ",\n".join(ctes) + """
SELECT l.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN z.z * t.nn >= t.sz THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keep,
       CAST(sum(CASE WHEN z.z * t.nn >= t.sz THEN l.doc_id ELSE 0 END)
            AS BIGINT) AS checksum,
       CAST(sum(z.z) AS BIGINT) AS score_milli
FROM clab l JOIN czf z USING (doc_id) CROSS JOIN ctot t
GROUP BY l.lang
"""


_CLS_ORACLE = _cls_oracle(_CLS_STEPS, _CLS_BUCKETS)

_CURATION_SCHEMA = [
    ("lang", "string"),
    ("n_docs", "bigint"),
    ("mean_quality", "double"),
    ("n_keep", "bigint"),
    ("checksum", "bigint"),
    ("score_milli", "bigint"),
]


def q_doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.classifier import (
        quality_classifier_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    return quality_classifier_stats(
        d, "doc_id", "text", "lang",
        is_positive=F.col("lang") == "en",
        n_buckets=_CLS_BUCKETS, steps=_CLS_STEPS,
    )


@register(
    "doc_curation_pipeline",
    union_sections_sql(
        [
            ("pipeline", _CURATION_ORACLE,
             ["lang", "n_docs", "mean_quality"]),
            ("classifier", _CLS_ORACLE,
             ["lang", "n_docs", "n_keep", "checksum", "score_milli"]),
        ],
        _CURATION_SCHEMA,
    ),
    survey=(
        "§2.9 capstone (quality filter + near-dedup + decontamination +"
        " per-lang corpus stats): the full training-corpus build in one"
        " declarative plan — the eval split is excluded and any training"
        " doc leaking >= 3 eval 5-grams is dropped (GPT-3-style"
        " benchmark decontamination), on top of the r2 quality + MinHash"
        " near-dedup stages"
        " + model-based quality classifier (hashed-ngram logistic"
        " regression, 2 unrolled full-batch GD steps as Spark"
        " aggregations in integer milli-units; reference-vs-pool labels,"
        " per-lang keep counts + margin checksums)"
    ),
)
def q_doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_sections(
        [
            ("pipeline", _q_doc_curation_core(spark, sf_dir)),
            ("classifier", q_doc_quality_classifier(spark, sf_dir)),
        ],
        _CURATION_SCHEMA,
    )


def _q_doc_curation_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.dedup import ngram_contamination
    from sec_financial_pipeline_spark.operators.sampling import hash_uniform

    survivors = q_doc_near_dedup_end2end(spark, sf_dir).select("doc_id", "lang")
    quality = q_doc_quality_score_for_curation(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    is_eval = hash_uniform(F.col("doc_id"), _CONTAM_SALT) < _CONTAM_RATE
    # decontamination, train-side: count each TRAINING doc's distinct
    # 5-gram leaks into the held-out eval split (the operator is
    # direction-agnostic — swap the sides vs the audit query)
    contaminated = (
        ngram_contamination(
            d.filter(~is_eval), d.filter(is_eval), "doc_id", "text",
            k=_CONTAM_K,
        )
        .filter(F.col("n_overlap") >= _CONTAM_MIN_OVERLAP)
        .select("doc_id")
    )
    kept = (
        survivors.join(quality, "doc_id")
        .filter(F.col("quality") >= 0.55)
        .filter(~(hash_uniform(F.col("doc_id"), _CONTAM_SALT) < _CONTAM_RATE))
        .join(contaminated, "doc_id", "left_anti")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("quality").cast("decimal(30,6)")).cast("double")
            / F.count("quality")
        ).alias("mean_quality"),
    )


def q_doc_quality_score_for_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    len_norm = F.least(F.length("text").cast("double") / 400.0, F.lit(1.0))
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    return d.select(
        "doc_id", F.round(len_norm * 0.5 + uniq_ratio * 0.5, 6).alias("quality")
    )


# ---------------------------------------------------------------------------
# Candidate-generator comparison (VERDICT r03 stretch): the SAME
# augmented corpus routed through both candidate generators — banded
# sign-LSH buckets vs trained-IVF coarse cells — with recall measured
# against exact ground truth in two strata: scaled-clone duplicates
# (cos >= 0.999, what near-dedup must catch) and natural moderate
# neighbors (base pairs, cos >= 0.35, what ANN retrieval must catch).
# The two generators trade places across strata: r=16-bit LSH bands are
# tuned for near-1.0 cosine (clone recall ~1, neighbor recall ~0), IVF
# cells catch moderate neighbors but emit ~N^2/k pairs (the n_candidates
# column carries the cost side of the trade). Ground truth is exact
# all-pairs — a measurement harness like doc_dedup_recall, not a scale
# path; the generators under test ARE the scale paths.
# ---------------------------------------------------------------------------

_CAND_NN_TAU = 0.35

#: Tuned multi-probe operating point (sweep recorded in PERF.md round 6):
#: b=8 bands x r=10 bits with Hamming<=1 probes. On the sf0.01 corpus it
#: finds 114/271 natural neighbors (recall 0.421) at 13,517 candidate
#: pairs — beating the trained-IVF generator (105/271 = 0.387 at 17,219
#: pairs) on BOTH recall and cost, while the exact 4x16 bands keep
#: clone-dup recall at 1.0 for 41 pairs.
_MP_BANDS = 8
_MP_BITS = 10


def _sql_pair_cos(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a}.emb)), i -> {a}.emb[i] * {b}.emb[i]))"
        f" / (sqrt(list_sum(list_transform({a}.emb, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({b}.emb, x -> x * x))))"
    )


_CANDIDATE_RECALL_ORACLE = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
aug AS (
  SELECT vec_id, label, emb FROM base
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, label,
         list_transform(emb, x -> x * 1.5) AS emb
  FROM base WHERE vec_id % 20 = 0
),
{_SIGN_CODES_SQL.strip()},
e AS (SELECT vec_id, emb FROM base),
c0 AS (
  SELECT CAST(vec_id - {_IVF_SEED_BASE} AS INT) AS cluster, emb AS cvec
  FROM e WHERE vec_id BETWEEN {_IVF_SEED_BASE} AND {_IVF_SEED_BASE + _IVF_K - 1}
),
a1 AS ({_sql_assign('c0')}),
c1 AS ({_sql_update('a1')}),
a2 AS ({_sql_assign('c1')}),
c2 AS ({_sql_update('a2')}),
ea AS (SELECT vec_id, emb FROM aug),
cells AS ({_sql_assign('c2', 'ea')}),
sims AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_sql_pair_cos('a', 'b')}, 6) AS cos
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
),
truth AS (
  SELECT CASE WHEN cos >= {_NEARDUP_THRESHOLD} THEN 'clone_dup'
              ELSE 'near_neighbor' END AS stratum, id_a, id_b
  FROM sims
  WHERE cos >= {_NEARDUP_THRESHOLD}
     OR (id_a < 10000 AND id_b < 10000 AND cos >= {_CAND_NN_TAU})
),
cand_lsh AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM codes a JOIN codes b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
cand_ivf AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cells a JOIN cells b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
h2 AS (
  SELECT vec_id - {_SIGN_BASE} AS h_id, emb AS h_emb FROM base
  WHERE vec_id BETWEEN {_SIGN_BASE} AND {_SIGN_BASE + _MP_BANDS * _MP_BITS - 1}
),
proj2 AS (
  SELECT a.vec_id, CAST(h2.h_id // {_MP_BITS} AS INT) AS band,
         h2.h_id % {_MP_BITS} AS bit,
         round(list_sum(list_transform(generate_series(1, len(a.emb)),
                                       i -> a.emb[i] * h2.h_emb[i])), 6) AS d
  FROM aug a CROSS JOIN h2
),
codes2 AS (
  SELECT vec_id, band,
         CAST(sum(CASE WHEN d > 0 THEN power(2, bit) ELSE 0 END) AS INT) AS bucket
  FROM proj2 GROUP BY vec_id, band
),
probes2 AS (
  SELECT vec_id, band, bucket FROM codes2
  UNION ALL
  SELECT c.vec_id, c.band,
         CAST(xor(c.bucket, CAST(power(2, g.b) AS INT)) AS INT) AS bucket
  FROM codes2 c CROSS JOIN (SELECT unnest(generate_series(0, {_MP_BITS - 1})) AS b) g
),
cand_mp AS (
  SELECT DISTINCT least(p.vec_id, c.vec_id) AS id_a,
                  greatest(p.vec_id, c.vec_id) AS id_b
  FROM probes2 p JOIN codes2 c
    ON p.band = c.band AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
)
SELECT stratum, 'sign_lsh' AS method, count(*) AS n_true,
       (SELECT count(*) FROM cand_lsh) AS n_candidates,
       count(c.id_a) AS n_hit,
       round(count(c.id_a) * 1.0 / count(*), 6) AS recall
FROM truth t LEFT JOIN cand_lsh c ON c.id_a = t.id_a AND c.id_b = t.id_b
GROUP BY stratum
UNION ALL
SELECT stratum, 'ivf_cell' AS method, count(*) AS n_true,
       (SELECT count(*) FROM cand_ivf) AS n_candidates,
       count(c.id_a) AS n_hit,
       round(count(c.id_a) * 1.0 / count(*), 6) AS recall
FROM truth t LEFT JOIN cand_ivf c ON c.id_a = t.id_a AND c.id_b = t.id_b
GROUP BY stratum
UNION ALL
SELECT stratum, 'sign_lsh_mp' AS method, count(*) AS n_true,
       (SELECT count(*) FROM cand_mp) AS n_candidates,
       count(c.id_a) AS n_hit,
       round(count(c.id_a) * 1.0 / count(*), 6) AS recall
FROM truth t LEFT JOIN cand_mp c ON c.id_a = t.id_a AND c.id_b = t.id_b
GROUP BY stratum
"""


@register(
    "emb_candidate_recall",
    _CANDIDATE_RECALL_ORACLE,
    survey="§2.9 dedup-embedding-cosine + similarity-search quality (sign-LSH bands vs trained-IVF cells as candidate generators: per-stratum recall + candidate-count cost on one corpus)",
)
def q_emb_candidate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators import kmeans

    n_part = max(1, spark.sparkContext.defaultParallelism)
    base = _track(
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .repartition(n_part)
        .persist()
    )
    clones = base.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr("transform(emb, x -> x * 1.5)").alias("emb"),
    )
    aug = _track(base.unionByName(clones).persist())

    codes = S.sign_lsh_bands(aug, "vec_id", _sign_planes(base), _SIGN_BITS)
    ca = codes.select(F.col("vec_id").alias("id_a"), "band", "bucket")
    cb = codes.select(F.col("vec_id").alias("id_b"), "band", "bucket")
    cand_lsh = (
        ca.join(cb, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    e_nrm = base.withColumn("nrm", S.norm(F.col("emb")))
    seeds = e_nrm.filter(
        (F.col("vec_id") >= _IVF_SEED_BASE)
        & (F.col("vec_id") < _IVF_SEED_BASE + _IVF_K)
    ).select(
        (F.col("vec_id") - _IVF_SEED_BASE).cast("int").alias("cluster"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("c_nrm"),
    )
    cents = kmeans.lloyd(e_nrm, seeds, n_iter=_IVF_ITER)
    aug_nrm = aug.withColumn("nrm", S.norm(F.col("emb")))
    proj = aug_nrm.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cluster",
        F.round(
            S.dot(F.col("emb"), F.col("cvec")) / (F.col("nrm") * F.col("c_nrm")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cluster").asc()
    )
    cells = (
        proj.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster")
    )
    cells_a = cells.select(F.col("vec_id").alias("id_a"), "cluster")
    cells_b = cells.select(F.col("vec_id").alias("id_b"), "cluster")
    cand_ivf = (
        cells_a.join(cells_b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )

    # tuned multi-probe generator: fixed-embedding hyperplanes vec_id
    # 8..87 folded as b=8 x r=10 (a SUPERSET of the 4x16 pool 8..71 —
    # like every plane here, the extra 16 are corpus vectors doubling
    # as hyperplanes, the deliberate determinism device both engines
    # replay), candidates at Hamming<=1 per band (_MP_BANDS note above)
    planes_mp = base.filter(
        (F.col("vec_id") >= _SIGN_BASE)
        & (F.col("vec_id") < _SIGN_BASE + _MP_BANDS * _MP_BITS)
    ).select(
        (F.col("vec_id") - _SIGN_BASE).alias("h_id"),
        F.col("emb").alias("h_emb"),
    )
    codes_mp = _track(
        S.sign_lsh_bands(aug, "vec_id", planes_mp, _MP_BITS).persist()
    )
    cand_mp = S.sign_lsh_multiprobe_pairs(codes_mp, "vec_id", _MP_BITS)

    a = aug_nrm.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("ea"), F.col("nrm").alias("na")
    )
    b = aug_nrm.select(
        F.col("vec_id").alias("id_b"), F.col("emb").alias("eb"), F.col("nrm").alias("nb")
    )
    sims = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        F.round(
            S.dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
        ).alias("cos"),
    )
    truth = sims.filter(
        (F.col("cos") >= _NEARDUP_THRESHOLD)
        | (
            (F.col("id_a") < 10000)
            & (F.col("id_b") < 10000)
            & (F.col("cos") >= _CAND_NN_TAU)
        )
    ).select(
        F.when(F.col("cos") >= _NEARDUP_THRESHOLD, "clone_dup")
        .otherwise("near_neighbor")
        .alias("stratum"),
        "id_a",
        "id_b",
    )

    out = None
    for method, cand in (
        ("sign_lsh", cand_lsh),
        ("ivf_cell", cand_ivf),
        ("sign_lsh_mp", cand_mp),
    ):
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        hit = cand.withColumn("hit", F.lit(1))
        r = (
            truth.join(hit, ["id_a", "id_b"], "left_outer")
            .groupBy("stratum")
            .agg(
                F.count(F.lit(1)).alias("n_true"),
                F.count("hit").alias("n_hit"),
                F.round(F.count("hit") / F.count(F.lit(1)), 6).alias("recall"),
            )
            .crossJoin(F.broadcast(n_cand))
            .select(
                "stratum",
                F.lit(method).alias("method"),
                "n_true",
                "n_candidates",
                "n_hit",
                "recall",
            )
        )
        out = r if out is None else out.unionByName(r)
    return out
