"""Distributed BPE (byte-pair encoding) tokenizer training — the
canonical ITERATIVE algorithm a training-data pipeline needs, done
Spark-first (SURVEY §2.9 north star; the reference pipeline counts
tokens but cannot learn a vocabulary).

Why this shape scales to 100 TB:

- **Training runs on the word-frequency table, not the corpus.** The
  classic reduction (Sennrich et al. 2016): BPE statistics depend only
  on ``(word, freq)``; a 100 TB corpus collapses to its distinct-word
  table (tens of millions of rows) via one shuffled groupBy-count, and
  every subsequent iteration touches ONLY that table.
- **Per-iteration work is one shuffled aggregation.** Adjacent-pair
  counts come from a posexplode + groupBy(pair).sum(freq); the argmax
  pair is a 1-row driver collect (the only driver state is the merge
  list itself — tiny, bounded by vocab size).
- **Merges apply as JVM-side array folds.** Greedy left-to-right pair
  merging inside a word is inherently sequential, but over a SMALL
  bounded sequence — exactly what ``F.aggregate`` (whole-stage-codegen
  HOF) expresses. No Python UDF in the training loop.
- **Lineage is bounded.** The symbols table re-persists every
  iteration and truncates its plan via localCheckpoint every
  ``checkpoint_every`` merges, so 1000-merge training does not build a
  1000-layer plan (the standard iterative-algorithm discipline on
  Spark, same as the star-contraction CC operator).

Application to a corpus (``apply_bpe``) uses an Arrow-batched pandas
UDF with the ranked merge table broadcast — the documented legitimate
Python path: per-word ranked-merge application is data-dependent
branching that HOFs cannot express without materializing one plan node
per merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Pre-tokenization: split on whitespace; words keep punctuation glued
#: (GPT-2-style pre-tokenizers refine this; the training loop is
#: agnostic to the word regex).
_WORD_SPLIT = r"\s+"

#: End-of-word marker appended as a final symbol so merges cannot cross
#: word boundaries and the tokenization is reversible (Sennrich-style).
EOW = "▁"


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """``(word, freq)`` over the corpus — the one corpus-wide shuffle
    BPE training ever does."""
    return (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), _WORD_SPLIT)
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Each word as its character-symbol array, with the end-of-word
    marker appended to the final character."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """freq-weighted adjacent-pair counts: posexplode + self-zip, one
    shuffled aggregation."""
    pairs = syms.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                F.slice(F.col("syms"), 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").alias("n")
    )


def _merge_fold(a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b as a
    codegen'd fold over the symbol array. Matches reference BPE
    semantics including overlap handling (after merging positions
    (i, i+1), position i+1 cannot start a merge)."""
    merged = a + b
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list ``[(a, b), ...]`` — the entire model.

    Deterministic: the winning pair each round maximizes
    ``(count, -lexicographic(a, b))`` — count descending, pair
    ascending on ties — replicated exactly by the pure-Python witness
    in tests. Stops early when no pair reaches ``min_pair_freq``."""
    syms = _initial_symbols(word_freq_table(df, text_col)).persist()
    syms.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    try:
        for i in range(n_merges):
            top = (
                _pair_counts(syms)
                .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_pair_freq:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = syms.withColumn("syms", _merge_fold(a, b))
            if (i + 1) % checkpoint_every == 0:
                # truncate lineage so the plan depth stays bounded
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return merges


def apply_bpe(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: adds ``tokens``
    (array<string>) and ``n_bpe_tokens`` columns.

    Arrow-batched pandas UDF with the merge list broadcast — the
    documented Python path: per-word merge application branches on data
    per step, which a HOF could only express as one plan node per
    merge (plan explosion at vocab sizes). Application replicates the
    TRAINING procedure exactly — each merge, in learned order, applied
    as the same greedy left-to-right fold — so train and apply can
    never disagree on a word either saw. Within a batch the work runs
    per DISTINCT word, memoized — cost scales with distinct words per
    batch, not tokens."""
    from pyspark.sql.types import ArrayType, StringType

    spark = df.sparkSession
    b_merges = spark.sparkContext.broadcast(list(merges))

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(texts):
        import pandas as pd

        mlist = b_merges.value
        memo: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w) + [EOW]
            for a, b in mlist:
                if len(syms) < 2:
                    break
                folded: list[str] = []
                for sym in syms:
                    if folded and folded[-1] == a and sym == b:
                        folded[-1] = a + b
                    else:
                        folded.append(sym)
                syms = folded
            memo[w] = syms
            return syms

        # split EXACTLY like training's Java regex \s+ (ASCII whitespace
        # only): Python str.split() matches Unicode whitespace (U+00A0,
        # U+2009, ...), which would cut words training fused — the
        # trained merges would then never apply to them
        import re as _re

        _ws = _re.compile(r"[ \t\n\x0b\f\r]+")

        out = []
        for t in texts:
            toks: list[str] = []
            for w in _ws.split(t or ""):
                if w:
                    toks.extend(word_tokens(w))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn("tokens", _tok(F.col(text_col))).withColumn(
        "n_bpe_tokens", F.size("tokens")
    )
