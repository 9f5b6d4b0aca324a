"""64-bit SimHash — the 100 TB deployment contract made real.

The 32-bit signature concentrates on vocabulary-sharing corpora (the
sf0.1 sweep measured >50% of all pairs within Hamming 10), so the
operator docstring promises 64-bit signatures with d <= 6 at scale.
These tests prove that contract: the pigeonhole block join over 64-bit
signatures is EXACTLY equivalent to the brute-force Hamming filter
(including bit 63 = the long sign bit, which corrupts block extraction
under arithmetic shifts), and 64 bits genuinely concentrate less than
32 at matched thresholds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import similarity as S
from sec_financial_pipeline_spark.sources.testdata import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _brute_pairs(sig, max_distance):
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("d", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("d") <= max_distance)
        .select("id_a", "id_b")
    )


def test_simhash64_uses_sign_bit(spark, sf_dir):
    """Some signature must set bit 63 (negative long) — otherwise the
    sign-bit path below isn't actually exercised."""
    sig = S.simhash(_docs(spark, sf_dir), "doc_id", "text", n_bits=64)
    assert sig.filter(F.col("simhash") < 0).count() > 0


def test_simhash64_blocking_equals_bruteforce(spark, sf_dir):
    """Pigeonhole block join == brute-force Hamming filter, bit 63
    included. (An arithmetic shiftright in block extraction fails this
    the moment any signature is negative.)"""
    sig = S.simhash(_docs(spark, sf_dir), "doc_id", "text", n_bits=64).persist()
    try:
        blocked = set(
            (r["id_a"], r["id_b"])
            for r in S.hamming_pairs(
                sig, "doc_id", max_distance=6, n_bits=64
            ).collect()
        )
        brute = set(
            (r["id_a"], r["id_b"]) for r in _brute_pairs(sig, 6).collect()
        )
        assert blocked == brute
    finally:
        sig.unpersist()


def test_simhash64_concentrates_less_than_32(spark, sf_dir):
    """At matched per-block widths (32-bit d=3 -> 8-bit blocks; 64-bit
    d=6 -> ~9-bit blocks) the 64-bit signature must pass a smaller
    fraction of the pair space — the reason it is the scale contract."""
    d = _docs(spark, sf_dir)
    n = d.count()
    total_pairs = n * (n - 1) / 2
    sig32 = S.simhash(d, "doc_id", "text", n_bits=32)
    sig64 = S.simhash(d, "doc_id", "text", n_bits=64)
    n32 = S.hamming_pairs(sig32, "doc_id", max_distance=3).count()
    n64 = S.hamming_pairs(sig64, "doc_id", max_distance=6, n_bits=64).count()
    assert n64 / total_pairs < n32 / total_pairs, (n32, n64)
