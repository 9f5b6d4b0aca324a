"""Model-based quality classifier: hashed-feature logistic regression
trained distributedly with unrolled full-batch gradient steps.

The classifier-filter stage of the published LLM corpus builds (GPT-3
"quality classifier" against a curated reference set, Brown et al.
2020 Appendix A; Llama's fastText filter; PaLM): fit a linear model
that separates a high-quality reference stratum from the general pool
over hashed bag-of-ngram features, then score and gate every document.

Training is K full-batch gradient-descent steps expressed as Spark
aggregations — no MLlib, no Python in the hot path:

1. featurize once: hashed unigram+bigram occurrence counts per doc
   (the same gram family and ``_bucket`` hash the DSIR selector uses,
   fused into a single pass here — see :func:`normalized_features`),
   LENGTH-NORMALIZED to integer milli-units
   ``x = trunc(cnt * 1000 / len)`` (the fastText mean-of-features
   shape: without normalization the margin is dominated by document
   length and the label signal drowns — measured). The bias is the
   classic constant-1 feature, stored as bucket ``-1`` with ``x = 1``
   so each step needs ONE gradient aggregation, not a separate bias
   job. The documents are hash-partitioned by id BEFORE the featurize
   and the feature table is persisted with that partitioning: every
   step's margin groupBy(id) and gradient join-on-id then reuse that
   one exchange instead of re-shuffling the corpus-sized table per
   step.
2. per step: margin ``z_nano_i = Σ_b x_ib * w_b`` via a broadcast join
   with the B-row weight table and one groupBy(doc) — exact BIGINT
   arithmetic; per-doc error ``round((sigmoid(z/1e9) - y) * 1000)``
   (integer milli-units — the float-determinism firewall: ``exp``
   differs by 1 ulp between JVM and libm, so every order-sensitive
   quantity is quantized once, then summed exactly);
3. gradient ``G_b = Σ_i err_i * x_ib`` via one join + groupBy(bucket)
   (map-side partial aggregation into B+1 buckets), update
   ``w_b -= trunc((lr * G_b) / N)`` with lr = 2.0 — the bias bucket's
   delta carries the extra 1e6 unit factor (its x is 1, not milli).
   The truncating double→long conversion is identical on both engines,
   and exact because the quotient is a rational with denominator N:
   when not exactly integral it sits >= 1/N from the truncation
   boundary, far beyond double rounding error at these magnitudes.
   Weights start at ZERO, so step 1's sigmoid is exactly 0.5 and its
   errors exactly ±500 milli — the unrolled replay is bit-stable from
   the first step.

The keep gate is RELATIVE — ``z * N >= Σz`` (margin at or above the
corpus mean, compared in exact integers; at petabyte N the same gate
is one avg() scalar) — because an absolute 0-threshold on a
2-3-step-trained model just measures the base rate.

The (B+1)-row weight table is collected per step (bounded — same class
as the BPE merge loop and the DSIR weight table) and re-broadcast.

Scale shape: one corpus shuffle total (the id-partitioned persist);
per step, one zero-exchange margin aggregation and one gradient
aggregation into B+1 buckets with map-side partials, K a small
constant. Nothing is O(corpus) on the driver.

No reference-repo counterpart (SURVEY §2.9 north-star scope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.selection import _bucket
from sec_financial_pipeline_spark.operators.similarity import token_shingles

#: learning rate of the full-batch steps (folded into the integer
#: update as a multiplier — keep it exactly representable in binary).
LEARNING_RATE = 2.0

#: the bias feature's bucket id (x = 1 for every doc).
BIAS_BUCKET = -1


def _err_milli(z_nano: Column, y: Column) -> Column:
    """round((sigmoid(z_nano/1e9) - y) * 1000) as BIGINT — mirrors the
    oracle SQL textually (float fold order matters)."""
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(z_nano.cast("double")) / F.lit(1.0e9))
    )
    return F.round((p - y.cast("double")) * F.lit(1000.0), 0).cast("long")


def normalized_features(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket, x): length-normalized hashed ngram features in
    integer milli-units, ``x = trunc(cnt * 1000 / n_tokens)``, plus the
    constant bias feature (bucket -1, x = 1) per document.

    r15 (guide §2.3/§2.4): computed in ONE pass over ``docs`` — the
    former shape (doc_gram_buckets' groupBy(id, bucket) exchange, a
    join back onto a per-doc length table, and a union with a third
    scan producing the bias rows) scanned the corpus three times and
    exchanged the feature table once before the classifier's own
    id-repartition. Here the bias feature rides the same explode as a
    NULL marker gram (split/shingles can never produce a null gram),
    the token count rides the groupBy as a functionally-dependent key,
    and the aggregation groups by (id, ..., bucket) — so when the
    caller feeds an id-partitioned input, the whole featurize runs
    with ZERO exchanges and a single scan. The per-(id, bucket) counts
    and the x expression (float fold order included) are identical to
    the former shape."""
    toks = F.split(F.col(text_col), " ")
    grams = F.concat(
        F.array(F.lit(None).cast("string")),
        toks,
        token_shingles(toks, k=2, distinct=False),
    )
    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("__ln"),
        F.explode(grams).alias("gram"),
    )
    bucket = (
        F.when(
            F.col("gram").isNull(), F.lit(int(BIAS_BUCKET)).cast("long")
        )
        .otherwise(_bucket(F.col("gram"), n_buckets))
        .alias("bucket")
    )
    counts = exploded.groupBy("id", "__ln", bucket).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.select(
        "id",
        "bucket",
        F.when(
            F.col("bucket") == BIAS_BUCKET, F.lit(1).cast("long")
        )
        .otherwise(
            (F.col("cnt") * F.lit(1000.0) / F.col("__ln")).cast("long")
        )
        .alias("x"),
    )


def _margins(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(id, z): exact BIGINT nano-margin per doc under the current
    weight table (broadcast; buckets missing from it score 0; the bias
    rides as the bucket -1 feature)."""
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0))).alias("z"))
    )


def _delta_py(bucket: int, g: int, n: float) -> int:
    """Per-bucket weight decrement from the summed gradient ``g`` —
    the bias bucket carries the 1e6 unit factor (nano vs micro).
    Driver-side Python floats ARE IEEE doubles, so the fold order
    ``trunc(((lr * g) * 1e6) / n)`` / ``trunc((lr * g) / n)`` is
    bit-identical to the former in-plan expression (long→double cast,
    two multiplies, divide, truncate toward zero — int() and Spark's
    double→long cast agree on every finite in-range value)."""
    if bucket == BIAS_BUCKET:
        return int(((LEARNING_RATE * g) * 1.0e6) / n)
    return int((LEARNING_RATE * g) / n)


def train_logreg_milli(
    feats: DataFrame,
    labels: DataFrame,
    n_docs: int | None = None,
    steps: int = 3,
) -> dict[int, int]:
    """Train integer micro-unit weights (nano-unit bias at bucket -1)
    over the normalized features. ``feats`` = (id, bucket, x) — persist
    it id-partitioned, each step reads it twice; ``labels`` = (id, y)
    with y in {0, 1}. Returns the weight dict.

    ``n_docs=None`` (r15, guide §7.3): the document count is read off
    the FIRST gradient aggregation instead of a separate count job —
    the bias feature contributes exactly one (id, -1, 1) row per doc
    and the gradient join keeps every feats row (labels cover all
    docs), so the bias bucket's row count IS n_docs."""
    spark = feats.sparkSession
    w: dict[int, int] = {}
    n = float(n_docs) if n_docs is not None else None
    for _ in range(steps):
        if not w:
            # r14 (guide §1.2 step 1: don't compute what you can prove):
            # with every weight zero the margin is EXACTLY 0 for every
            # doc (the bias feature's w is zero too), so sigmoid(0)=0.5
            # and err = round((0.5 - y) * 1000) — +-500 milli, the very
            # invariant the module docstring relies on for bit-stable
            # replay. Skipping the margin pass saves a full scan of the
            # corpus-sized feature table plus its aggregation and join
            # on the first step, with a bit-identical gradient.
            err = labels.select(
                "id", _err_milli(F.lit(0), F.col("y")).alias("err")
            )
        else:
            wdf = spark.createDataFrame(
                sorted(w.items()), "bucket long, w long"
            )
            z = _margins(feats, wdf)
            err = labels.join(z, "id", "left").select(
                "id",
                _err_milli(
                    F.coalesce(F.col("z"), F.lit(0)), F.col("y")
                ).alias("err"),
            )
        # shuffle_hash on the N-row error side: the corpus-sized feats
        # side is already id-partitioned (zero exchange) and a hash
        # build of the per-doc errors avoids re-SORTING feats for a
        # sort-merge join every step; stays scale-sane where a
        # broadcast of N rows would not
        grad_rows = (
            feats.join(err.hint("shuffle_hash"), "id")
            .groupBy("bucket")
            .agg(
                F.sum(F.col("x") * F.col("err")).alias("g"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .collect()
        )
        if n is None and grad_rows:
            n = float(
                next(r["cnt"] for r in grad_rows if r["bucket"] == BIAS_BUCKET)
            )
        for r in grad_rows:
            w[r["bucket"]] = w.get(r["bucket"], 0) - _delta_py(
                r["bucket"], r["g"], n
            )
    return w


def quality_classifier_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    stratum: str,
    is_positive: Column,
    n_buckets: int = 256,
    steps: int = 3,
) -> DataFrame:
    """End-to-end classifier stage, reported per stratum: train on
    ``is_positive`` as the reference label, score every document, keep
    those at or above the corpus-mean margin. Output columns: stratum,
    ``n_docs`` (corpus rows), ``n_keep``, ``checksum`` (sum of kept ids
    — pins the exact keep set), ``score_milli`` (exact BIGINT sum of
    nano-margins — pins the trained model)."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(stratum).alias("s"),
        F.col(text_col).alias("t"),
        is_positive.cast("int").alias("y"),
    )
    # one corpus exchange total: repartitioning the DOCUMENTS by id
    # BEFORE the featurize (r15) — hash(id) satisfies the featurize
    # groupBy's ClusteredDistribution (its keys are a superset of id),
    # so the feature table is born id-partitioned with zero exchanges
    # of its own, and every step's groupBy(id) and join-on-id reuse
    # that one exchange (persisted like dsir_select's raw-count table;
    # the CacheManager dedupes re-invocations on the same corpus).
    # The former shape repartitioned the FEATURE table after its own
    # groupBy(id, bucket) exchange — two exchanges plus a lens join
    # and a bias-union (three corpus scans) where one exchange and one
    # scan suffice.
    feats = (
        normalized_features(
            base.select("id", "t").repartition("id"), "id", "t", n_buckets
        )
        .persist()
    )
    # n_docs rides the first gradient aggregation (bias-bucket row
    # count) — no separate count job (r15, guide §7.3)
    w = train_logreg_milli(feats, base.select("id", "y"), steps=steps)
    wdf = feats.sparkSession.createDataFrame(
        sorted(w.items()) or [(None, None)], "bucket long, w long"
    ).filter(F.col("bucket").isNotNull())
    # r14: persist the trained margins — they are consumed twice (the
    # corpus-mean collect below, then the returned per-stratum agg), and
    # without the cache each consumer re-runs the full margin pass over
    # the feature table. N rows of (id, z) — same lifecycle as ``feats``.
    z = _margins(feats, wdf).persist()
    scored = base.join(z, "id", "left").withColumn(
        "z", F.coalesce(F.col("z"), F.lit(0))
    )
    tot = scored.agg(
        F.sum("z").alias("sz"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    kept = F.col("z") * F.lit(int(tot["n"])) >= F.lit(int(tot["sz"]))
    return scored.groupBy(F.col("s").alias(stratum)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("long")).alias("n_keep"),
        F.sum(F.when(kept, F.col("id")).otherwise(0)).alias("checksum"),
        F.sum("z").alias("score_milli"),
    )
