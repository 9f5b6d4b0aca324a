"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"):
score raw-pool documents by how target-like their hashed n-gram
distribution is, then sample top-k under Gumbel noise.

Pipeline (all JVM-side, one explode + three aggregations — the same
Σ-tokens cost class as the shingle family):

1. featurize: unigram + bigram OCCURRENCES (counts, not distinct)
   hashed into ``n_buckets`` (md5 -> 32-bit -> mod B, the repo's
   engine-portable hash family);
2. fit two bag-of-hashed-ngrams multinomials — target (the curated
   distribution to match) and raw (the pool) — as B-row count tables;
3. per-bucket importance weight: log p_target(b) - log p_raw(b) with
   +1 smoothing, QUANTIZED TO INTEGER MILLI-NATS:
   ``round(1000 * ((ln(nt+1) - ln(nr+1) - ln(T+B)) + ln(R+B)))``.
   The quantization is the float-determinism firewall: Spark's JVM
   ``ln`` and DuckDB's libm ``ln`` differ by 1 ulp on ~1% of inputs
   (measured), so every downstream quantity here is BIGINT arithmetic
   on milli-nats — order-independent, engine-exact; a 1-ulp input
   difference flips the integer rounding only within ~1e-16 of a
   boundary (~1e-9 expected flips over the whole bucket table);
4. per-doc score: Σ count(gram) * w_milli(bucket) — an exact BIGINT
   sum via a broadcast join of the B-row weight table;
5. Gumbel top-k WITHOUT replacement: key = score_milli +
   gumbel_milli(md5(salt, id)) (the Gumbel-max trick makes top-k by
   perturbed score a weighted sample without replacement), descending
   with doc-id tiebreak, ``orderBy().limit(k)`` — Spark plans
   TakeOrderedAndProject (per-partition top-k + driver merge, no
   global sort/shuffle).

Scale: the weight table is B rows (broadcast); the explode is the
corpus tokenization pass every curation stage shares; the selection
is TakeOrderedAndProject. Nothing is O(table) on the driver.

Reference scope: the reference has no data-selection stage; this is
part of the §2.9 LLM-pipeline family (sampling/selection) the build
adds for training-data curation at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.similarity import token_shingles

_U32 = 4294967296.0


def _bucket(gram: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def doc_gram_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int = 1024
) -> DataFrame:
    """(id, bucket, cnt): unigram + bigram occurrences per document,
    hashed into ``n_buckets``. Occurrences, NOT distinct grams — the
    multinomial the DSIR weights are fit over."""
    toks = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("w")
    )
    grams = toks.select(
        "id",
        F.explode(
            F.concat(
                F.col("w"), token_shingles(F.col("w"), k=2, distinct=False)
            )
        ).alias("gram"),
    )
    return grams.groupBy(
        "id", _bucket(F.col("gram"), n_buckets).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def dsir_bucket_weights(
    target_counts: DataFrame, raw_counts: DataFrame, n_buckets: int = 1024
) -> DataFrame:
    """(bucket, w_milli): smoothed log-ratio weights in integer
    milli-nats. ``target_counts``/``raw_counts`` are per-doc bucket
    tables from :func:`doc_gram_buckets` (they are re-aggregated to
    totals here). Buckets absent from the raw pool are irrelevant (no
    raw doc can hit them), so the join is raw-left."""
    t = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("nt"))
    r = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("nr"))
    t_total = t.agg(F.sum("nt")).collect()[0][0] or 0
    r_total = r.agg(F.sum("nr")).collect()[0][0] or 0
    joined = r.join(t, "bucket", "left").fillna(0, subset=["nt"])
    # association mirrors the oracle SQL TEXTUALLY (left-to-right):
    # (((ln(nt+1) - ln(nr+1)) - ln(T+B)) + ln(R+B)) * 1000 — float
    # addition is non-associative, so both engines must fold in the
    # same order before the milli-nat rounding
    w = (
        (
            F.log(F.col("nt") + 1.0)
            - F.log(F.col("nr") + 1.0)
            - F.log(F.lit(float(t_total + n_buckets)))
            + F.log(F.lit(float(r_total + n_buckets)))
        )
        * 1000.0
    )
    return joined.select(
        "bucket", F.round(w, 0).cast("long").alias("w_milli")
    )


def gumbel_milli(key: Column, salt: str = "dsir") -> Column:
    """Deterministic Gumbel(0,1) noise in integer milli-nats from a
    key hash: u = (h32+1)/2^32 in (0,1), g = -ln(-ln(u)). The Gumbel-
    max trick turns top-k by (score + g) into sampling without
    replacement proportional to exp(score)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (h + 1.0) / F.lit(_U32)
    return F.round((-F.log(-F.log(u))) * 1000.0, 0).cast("long")


def dsir_scores(
    raw_doc_counts: DataFrame, weights: DataFrame, salt: str = "dsir"
) -> DataFrame:
    """(id, score_milli, key_milli): exact BIGINT importance score per
    raw document plus the Gumbel-perturbed selection key. The weight
    table is B rows — broadcast."""
    scored = (
        raw_doc_counts.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("w_milli")).alias("score_milli"))
    )
    return scored.select(
        "id",
        "score_milli",
        (F.col("score_milli") + gumbel_milli(F.col("id"), salt)).alias(
            "key_milli"
        ),
    )


def dsir_select(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target,
    rate: float = 0.25,
    n_buckets: int = 1024,
    salt: str = "dsir",
) -> DataFrame:
    """End-to-end DSIR: fit target vs raw hashed-ngram distributions,
    score the raw pool (rows where ``is_target`` is false), keep the
    top ``floor(rate * |raw|)`` by Gumbel-perturbed score (doc-id
    tiebreak). Returns the selected raw rows + (score_milli,
    key_milli). ``orderBy().limit(k)`` plans TakeOrderedAndProject —
    no global sort."""
    target = docs.filter(is_target)
    raw = docs.filter(~is_target)
    tc = doc_gram_buckets(target, id_col, text_col, n_buckets)
    # rc feeds three consumers (raw totals, the weight join, the score
    # aggregation) — persist so the explode+agg tokenization pass over
    # the raw pool runs once, not three times
    rc = doc_gram_buckets(raw, id_col, text_col, n_buckets).persist()
    w = dsir_bucket_weights(tc, rc, n_buckets)
    scores = dsir_scores(rc, w, salt)
    k = int(raw.count() * rate)
    picked = (
        scores.orderBy(F.col("key_milli").desc(), F.col("id"))
        .limit(k)
        .withColumnRenamed("id", id_col)
    )
    # NO broadcast hint: the selection is rate*|raw| rows — small here,
    # huge at 100 TB; AQE picks broadcast when it actually fits
    return raw.join(picked, id_col)
