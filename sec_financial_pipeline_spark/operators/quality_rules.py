"""Heuristic document-quality rule filter — the Gopher/C4 rule family.

The published web-corpus curation recipes gate documents on cheap
per-document statistics before any model-based scoring:

- Gopher (Rae et al. 2021, arXiv:2112.11446, Table A1): word-count
  bounds, mean-word-length bounds, a required-stopword floor, and
  internal-repetition ceilings.
- C4 (Raffel et al. 2020, arXiv:1910.10683 §2.2): line/punctuation
  heuristics plus degenerate-token screens.

This module implements the subset of those rules that is well-defined
on a whitespace-tokenized corpus (the `documents` table carries no
line structure or punctuation, so the line-terminal-punctuation and
symbol-ratio rules are vacuous here; the short-token-fraction rule
stands in for Gopher's "fraction of words with an alphabetic
character" screen — both catch degenerate-token floods). Every rule is
a JVM-side expression over one token array: the whole rule battery
rides the same single corpus scan as the rest of the profile row and
stays inside whole-stage codegen — the 100 TB shape (no second pass,
no Python).

Rule semantics (a document is kept iff EVERY rule passes):

==================  =======================================================
rule                pass condition
==================  =======================================================
word_count          ``MIN_WORDS <= n_tokens <= MAX_WORDS``
mean_word_len       ``MEAN_LEN_LO <= mean token length <= MEAN_LEN_HI``
stopwords           ``>= MIN_REQUIRED distinct`` of :data:`REQUIRED_WORDS`
repetition          duplicate-trigram ratio ``<= MAX_DUP_TRIGRAM``
short_words         fraction of tokens of length <= 2 is
                    ``<= MAX_SHORT_RATIO``
long_words          longest token ``<= MAX_WORD_LEN`` chars
==================  =======================================================

No reference-repo counterpart (this is SURVEY §2.9 north-star
territory); thresholds follow Gopher's published values where the
corpus makes them meaningful.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Gopher Table A1 word-count window (50 .. 100k words).
MIN_WORDS = 50
MAX_WORDS = 100_000
#: Gopher mean-word-length window (3 .. 10 characters).
MEAN_LEN_LO = 3.0
MEAN_LEN_HI = 10.0
#: Gopher requires >= 2 distinct words of a small required list.
REQUIRED_WORDS = ("the", "a", "and", "of", "to", "in")
MIN_REQUIRED = 2
#: ceiling on the duplicate-trigram ratio (Gopher's duplicate-n-gram
#: family; the profile row already computes the trigram signal).
MAX_DUP_TRIGRAM = 0.30
#: ceiling on the fraction of 1-2 char tokens (degenerate-token screen).
MAX_SHORT_RATIO = 0.40
#: C4-style longest-token ceiling (code/url junk screen).
MAX_WORD_LEN = 15

#: ordered rule names — the bit order of :func:`rule_columns`.
RULE_NAMES = (
    "word_count",
    "mean_word_len",
    "stopwords",
    "repetition",
    "short_words",
    "long_words",
)


def mean_word_len(toks: Column) -> Column:
    """Mean token length in characters (exact integer sum, one IEEE
    division — deterministic cross-engine)."""
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return total.cast("double") / F.size(toks)


def short_word_ratio(toks: Column) -> Column:
    """Fraction of tokens of length <= 2."""
    n_short = F.size(F.filter(toks, lambda w: F.length(w) <= 2))
    return n_short.cast("double") / F.size(toks)


def rule_columns(toks: Column, dup_trigram: Column) -> dict[str, Column]:
    """The six rule verdicts as boolean Columns, keyed by
    :data:`RULE_NAMES`. ``dup_trigram`` is the caller's (already
    computed, already rounded) duplicate-trigram ratio so the rule and
    the reported signal can never diverge."""
    n = F.size(toks)
    mwl = F.round(mean_word_len(toks), 6)
    swr = F.round(short_word_ratio(toks), 6)
    n_req = F.size(
        F.array_distinct(F.filter(toks, lambda w: w.isin(*REQUIRED_WORDS)))
    )
    longest = F.array_max(F.transform(toks, F.length))
    return {
        "word_count": (n >= MIN_WORDS) & (n <= MAX_WORDS),
        "mean_word_len": (mwl >= MEAN_LEN_LO) & (mwl <= MEAN_LEN_HI),
        "stopwords": n_req >= MIN_REQUIRED,
        "repetition": dup_trigram <= MAX_DUP_TRIGRAM,
        "short_words": swr <= MAX_SHORT_RATIO,
        "long_words": longest <= MAX_WORD_LEN,
    }


def violations_and_keep(
    toks: Column, dup_trigram: Column
) -> tuple[Column, Column]:
    """``(n_rule_violations, gopher_keep)`` — the compact verdict pair:
    how many of the six rules fail, and 1 iff none do."""
    rules = rule_columns(toks, dup_trigram)
    viol = None
    for name in RULE_NAMES:
        bit = (~rules[name]).cast("int")
        viol = bit if viol is None else viol + bit
    return viol.alias("n_rule_violations"), (viol == 0).cast("int").alias(
        "gopher_keep"
    )
