"""Corpus distribution-drift monitoring: Population Stability Index
over hashed n-gram buckets — the standing data-quality check a
continuously-ingesting training-data pipeline runs between corpus
snapshots (yesterday's distribution vs today's, source A vs source B).

PSI = Σ_b (p_b - q_b) · ln(p_b / q_b) over feature buckets, with the
conventional reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
major shift. Buckets are the same hashed unigram+bigram space the
DSIR selector uses (operators/selection.py), counts are Laplace-
smoothed so empty buckets are defined.

Engine-exactness: IEEE division is correctly rounded (deterministic
across engines), so the only fuzzy primitive is ``ln`` — each
bucket's PSI term is therefore quantized ONCE to integer MICRO-units
(``round(1e6 · term)``) and everything downstream is exact BIGINT
summation, the same firewall as DSIR/perplexity (JVM vs libm ln
differ by 1 ulp on ~1% of inputs, measured).

Scale: two aggregations over the token explode + one B-row join —
the report is O(corpus) scan and O(B) state, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.selection import doc_gram_buckets


def psi_bucket_terms(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 512,
) -> DataFrame:
    """(bucket, ca, cb, psi_micro): per-bucket PSI contribution of
    corpus ``b`` relative to baseline ``a``, in integer micro-units.
    Term: (p_b - q_b) · ln(p_b/q_b) with p = (ca+1)/(A+B'), q =
    (cb+1)/(B+B') — symmetric in sign, every term >= 0."""
    ca = (
        doc_gram_buckets(a, id_col, text_col, n_buckets)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("ca"))
    )
    cb = (
        doc_gram_buckets(b, id_col, text_col, n_buckets)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cb"))
    )
    a_tot = ca.agg(F.sum("ca")).collect()[0][0] or 0
    b_tot = cb.agg(F.sum("cb")).collect()[0][0] or 0
    at = float(a_tot + n_buckets)
    bt = float(b_tot + n_buckets)
    joined = (
        ca.join(cb, "bucket", "outer")
        .fillna(0, subset=["ca", "cb"])
    )
    # association mirrors the oracle TEXTUALLY; ln of integer-exact
    # doubles, division correctly rounded — the round() is the firewall
    p = (F.col("ca") + 1.0) / F.lit(at)
    q = (F.col("cb") + 1.0) / F.lit(bt)
    lnr = (
        F.log(F.col("ca") + 1.0)
        - F.log(F.col("cb") + 1.0)
        - F.log(F.lit(at))
        + F.log(F.lit(bt))
    )
    return joined.select(
        "bucket",
        "ca",
        "cb",
        F.round((p - q) * lnr * 1000000.0, 0).cast("long").alias("psi_micro"),
    )


def psi_total(terms: DataFrame) -> DataFrame:
    """One-row rollup: total PSI in micro-units plus the bucket count —
    exact BIGINT sums; psi_micro/1e6 is the conventional PSI."""
    return terms.agg(
        F.sum("psi_micro").alias("psi_micro"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
