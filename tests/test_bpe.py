"""Distributed BPE training/application (operators/bpe.py): the merge
sequence must EXACTLY match a pure-Python reference implementation of
Sennrich-style BPE (same tie-breaking), and application must invert to
the original text."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import bpe


# ---------------------------------------------------------- witness


def _witness_train(texts, n_merges, min_pair_freq=2):
    """Reference BPE on word frequencies: argmax pair by (count desc,
    pair asc); greedy left-to-right merge with overlap rule."""
    freqs = Counter(w for t in texts for w in t.split() if w)
    words = {w: list(w) + [bpe.EOW] for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w, syms in words.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            words[w] = out
    return merges, words


_CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the quick brown fox the the",
    "lowest and newest are the widest",
]


def test_train_matches_pure_python_witness(spark):
    df = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    got = bpe.train_bpe(df, "text", n_merges=20)
    want, _ = _witness_train(_CORPUS, 20)
    assert got == want
    assert len(got) == 20  # corpus supports at least 20 merges


def test_train_early_stop_on_min_freq(spark):
    df = spark.createDataFrame([("ab cd",)], "text string")
    # every pair occurs once; min_pair_freq=2 stops immediately
    assert bpe.train_bpe(df, "text", n_merges=5) == []
    got = bpe.train_bpe(df, "text", n_merges=50, min_pair_freq=1)
    want, _ = _witness_train(["ab cd"], 50, min_pair_freq=1)
    assert got == want


def test_apply_matches_training_state_and_inverts(spark):
    df = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    merges = bpe.train_bpe(df, "text", n_merges=15)
    _, witness_words = _witness_train(_CORPUS, 15)
    toks = bpe.apply_bpe(df, "text", merges).collect()
    for r in toks:
        # reversible: concatenating tokens (dropping EOW) restores text
        joined = "".join(r.tokens).replace(bpe.EOW, " ").strip()
        assert joined == " ".join(r.text.split())
        assert r.n_bpe_tokens == len(r.tokens)
        # per-word tokenization equals the witness's post-training state
        out_words, cur = [], []
        for tok in r.tokens:
            cur.append(tok)
            if tok.endswith(bpe.EOW):
                out_words.append(cur)
                cur = []
        src_words = r.text.split()
        assert len(out_words) == len(src_words)
        for w, got_syms in zip(src_words, out_words):
            assert got_syms == witness_words[w], w
    # checkpointing path: same merges with a tiny checkpoint interval
    merges_ck = bpe.train_bpe(df, "text", n_merges=15, checkpoint_every=2)
    assert merges_ck == merges


def test_train_on_documents_table(spark, sf_dir):
    """End-to-end on the driver corpus: trains real merges, and the
    learned tokenization never splits the corpus' most frequent words
    it has fully merged."""
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    merges = bpe.train_bpe(d, "text", n_merges=30)
    assert len(merges) == 30
    toked = bpe.apply_bpe(d, "text", merges)
    row = toked.agg(
        F.sum("n_bpe_tokens").alias("n_bpe"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n_words"),
    ).collect()[0]
    # BPE tokens are at most chars+1 per word and at least 1; with 30
    # merges on a real corpus the token count sits strictly between
    # word count and character count
    assert row.n_bpe > row.n_words


def test_apply_splits_words_exactly_like_training(spark):
    """Java \\s+ (training) does NOT match U+00A0; Python str.split()
    does. The apply path must mirror training's ASCII-only split, or
    words the trainer fused would be cut and their merges never apply
    (review finding, reproduced live)."""
    text = "net income rose net income fell net income up"
    df = spark.createDataFrame([(text,)], "text string")
    wf = {r.word: r.freq for r in bpe.word_freq_table(df, "text").collect()}
    assert "net income" in wf and wf["net income"] == 3
    merges = bpe.train_bpe(df, "text", n_merges=12, min_pair_freq=2)
    toked = bpe.apply_bpe(df, "text", merges).collect()[0]
    # the fused word must round-trip as ONE word (exactly one EOW token
    # boundary per corpus word, 6 words total)
    assert sum(1 for t in toked.tokens if t.endswith(bpe.EOW)) == 6
    joined = "".join(toked.tokens)
    assert "net income" + bpe.EOW in joined or any(
        "net income" in t for t in toked.tokens
    )
