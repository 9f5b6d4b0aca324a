"""Gopher/C4 heuristic rule battery (operators/quality_rules.py).

Each rule is exercised at its boundary with a hand-built document that
fails EXACTLY that rule (all other rules passing), so a threshold or
comparison-direction regression localizes to one test case. Documents
are built from DISTINCT filler tokens — a repeated filler word would
repeat trigrams and trip the repetition rule as a side effect. The
driver-facing integration (doc_profile's n_rule_violations /
gopher_keep columns) is oracle-checked by test_oracle_parity.py; this
file pins the per-rule semantics the compact verdict pair compresses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import quality_rules as qr

# 60 distinct tokens (zero repeated trigrams), two required words,
# mean word length (3+2+58*6)/60 = 5.88, one short token: passes all
_GOOD = "the of " + " ".join(f"word{i:02d}" for i in range(58))


def _fillers(n: int) -> list[str]:
    return [f"word{i:02d}" for i in range(n)]


def _eval(spark, text: str) -> dict:
    df = spark.createDataFrame([(text,)], "text string").select(
        F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    # standalone dup-trigram signal (mirrors doc_profile's expression)
    from sec_financial_pipeline_spark.operators.similarity import (
        token_shingles,
    )

    tri = token_shingles(toks, k=3, distinct=False)
    dup = (
        F.when(
            F.size(toks) >= 3,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(tri)).cast("double") / F.size(tri),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
    )
    rules = qr.rule_columns(toks, dup)
    viol, keep = qr.violations_and_keep(toks, dup)
    row = df.select(
        *[rules[n].alias(n) for n in qr.RULE_NAMES], viol, keep
    ).collect()[0]
    return row.asDict()


def test_good_document_passes_every_rule(spark):
    r = _eval(spark, _GOOD)
    assert r["n_rule_violations"] == 0 and r["gopher_keep"] == 1
    assert all(r[n] for n in qr.RULE_NAMES)


def test_word_count_floor(spark):
    words = ["the", "of"] + _fillers(98)
    r = _eval(spark, " ".join(words[:49]))
    assert not r["word_count"]
    assert r["n_rule_violations"] == 1 and r["gopher_keep"] == 0
    # one more word crosses the floor
    assert _eval(spark, " ".join(words[:50]))["word_count"]


def test_mean_word_len_bounds(spark):
    # 60 two-char words: mean < 3 fails mean_word_len AND short_words
    text = "the of " + " ".join(["ab"] * 58)
    r = _eval(spark, text)
    assert not r["mean_word_len"] and not r["short_words"]
    # long words push the mean over 10 without any single word > 15
    text = "the of " + " ".join(["abcdefghijklmno"] * 58)
    r = _eval(spark, text)
    assert not r["mean_word_len"]
    assert r["long_words"], "15-char words are exactly at the ceiling"


def test_required_stopword_floor(spark):
    # only ONE distinct required word ('the') -> fails stopwords only
    text = "the " + " ".join(_fillers(59))
    r = _eval(spark, text)
    assert not r["stopwords"]
    assert r["n_rule_violations"] == 1
    # a second distinct required word rescues it
    r2 = _eval(spark, "the of " + " ".join(_fillers(58)))
    assert r2["stopwords"] and r2["n_rule_violations"] == 0


def test_repetition_ceiling(spark):
    # one trigram repeated 20x: dup ratio near 1 -> repetition fails
    # (and nothing else: 62 words, mean 4.27, required pair present)
    text = "the of " + " ".join(["spark", "rows", "fast"] * 20)
    r = _eval(spark, text)
    assert not r["repetition"]
    assert r["word_count"] and r["mean_word_len"] and r["stopwords"]


def test_long_word_ceiling(spark):
    text = _GOOD + " " + "x" * 16
    r = _eval(spark, text)
    assert not r["long_words"]
    assert r["n_rule_violations"] == 1 and r["gopher_keep"] == 0


def test_short_word_ratio_boundary(spark):
    # alternate 'ab' with distinct fillers so no trigram repeats.
    # 100 tokens, 40 short (39x 'ab' + 'of'): exactly 0.40 passes.
    inter = [w for i, f in enumerate(_fillers(39)) for w in ("ab", f + "z")]
    base = inter + ["of", "the"] + [f + "qrst" for f in _fillers(20)]
    assert len(base) == 100
    r = _eval(spark, " ".join(base))
    assert r["short_words"], "0.40 is inclusive"
    # swap one long filler for a short token: 41/100 > 0.40 fails
    worse = list(base)
    worse[worse.index("word20z")] = "cd"
    r2 = _eval(spark, " ".join(worse))
    assert not r2["short_words"]


@pytest.mark.parametrize("n", [0, 1, 2])
def test_violation_count_is_a_sum(spark, n):
    texts = {
        0: _GOOD,
        1: _GOOD + " " + "y" * 16,  # long_words only
        # long word kept up front so the 49-token truncation still
        # carries it: word_count + long_words
        2: " ".join((("y" * 16) + " " + _GOOD).split()[:49]),
    }
    r = _eval(spark, texts[n])
    assert r["n_rule_violations"] == n
    assert r["gopher_keep"] == (1 if n == 0 else 0)
