"""Count-based bigram language-model scoring — the CCNet-style
perplexity filter (Wenzek et al. 2020 train a KenLM on a target corpus
and bucket raw documents by perplexity; the same discipline here with
a Laplace-smoothed bigram LM, which Spark can train and score as plain
joins + aggregations, no UDF).

Scoring is in integer MILLI-NATS like the DSIR weights
(operators/selection.py): JVM and libm ``ln`` differ by 1 ulp on ~1%
of inputs (measured), so each bigram's negative log-likelihood
``ln(c1 + V) - ln(c2 + 1)`` is rounded to an integer once, and the
per-document total is an exact BIGINT sum — order-independent and
engine-identical, which is what lets the DuckDB oracle replay the
whole pipeline bit-for-bit. (c2 <= c1 and V >= 1 make every term
nonnegative, so integer division for the per-bigram average is
truncation-safe on both engines.)

Scale shape: training is two aggregations over the target corpus'
token stream (the tokenization explode every curation stage shares);
scoring joins each document's bigram occurrences against the count
tables — shuffled hash joins keyed by the gram text, partial
aggregation before the per-doc sum. Nothing collects to the driver
but the vocabulary size scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.similarity import token_shingles


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, bigram) — one row per adjacent-token OCCURRENCE."""
    toks = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("w")
    )
    return toks.select(
        "id",
        F.explode(token_shingles(F.col("w"), k=2, distinct=False)).alias(
            "bigram"
        ),
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))


def train_bigram_lm(
    train: DataFrame, text_col: str
) -> tuple[DataFrame, DataFrame, int]:
    """Fit the count tables on the target corpus: returns
    (unigram_counts(w1, c1), bigram_counts(bigram, c2), V) where V is
    the train vocabulary size (distinct tokens — the Laplace
    denominator)."""
    toks = train.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
    # persist: the vocabulary-size action below and the scoring join
    # both consume this aggregation — one tokenization pass, not two
    uni = toks.groupBy(F.col("w").alias("w1")).agg(
        F.count(F.lit(1)).alias("c1")
    ).persist()
    v = uni.count()
    bi = (
        _doc_bigrams(
            train.select(F.monotonically_increasing_id().alias("__i"), text_col),
            "__i",
            text_col,
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    return uni, bi, int(v)


def doc_nll_milli(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    bi: DataFrame,
    v: int,
) -> DataFrame:
    """(id, ppl_milli, n_bigrams): total negative log-likelihood of the
    document's bigrams under the trained LM, in integer milli-nats.
    Per bigram: ``round(1000 * (ln(c1 + V) - ln(c2 + 1)))`` with train
    counts (0 when unseen) — Laplace P(w2|w1) = (c2+1)/(c1+V). Exact
    BIGINT sum per document; documents with < 2 tokens don't appear."""
    grams = _doc_bigrams(docs, id_col, text_col)
    scored = (
        grams.join(bi, "bigram", "left")
        .join(uni, "w1", "left")
        .select(
            "id",
            F.round(
                (
                    F.log(
                        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(v))
                    )
                    - F.log(F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
                )
                * 1000.0,
                0,
            )
            .cast("long")
            .alias("nll_milli"),
        )
    )
    return scored.groupBy("id").agg(
        F.sum("nll_milli").alias("ppl_milli"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


def perplexity_bucket(avg_milli, good: int, mid: int):
    """head/middle/tail bucketing on the integer per-bigram average
    (CCNet's tercile discipline with fixed thresholds): < good ->
    'head', < mid -> 'middle', else 'tail'."""
    return (
        F.when(avg_milli < good, "head")
        .when(avg_milli < mid, "middle")
        .otherwise("tail")
    )


def score_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    train: DataFrame,
    good: int = 3400,
    mid: int = 3500,
) -> DataFrame:
    """End-to-end: train on ``train``, score every document, bucket on
    the integer per-bigram average (milli-nats; exp(avg/1000) is the
    conventional perplexity). Returns (id, ppl_milli, n_bigrams,
    avg_milli, ppl_bucket)."""
    uni, bi, v = train_bigram_lm(train, text_col)
    nll = doc_nll_milli(docs, id_col, text_col, uni, bi, v)
    # integer division: both terms nonnegative, so floor == truncate
    # (DuckDB // and Spark div agree)
    avg = F.expr("ppl_milli div n_bigrams")
    return nll.select(
        "id",
        "ppl_milli",
        "n_bigrams",
        avg.alias("avg_milli"),
        perplexity_bucket(avg, good, mid).alias("ppl_bucket"),
    )
