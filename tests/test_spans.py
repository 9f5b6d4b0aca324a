"""Exact-substring (duplicate-span) dedup — operators/spans.py.

Witnesses: a planted shared passage, full-clone coverage, a pure-Python
re-implementation over a randomized corpus, and the fixed-point
property (after keep-first removal no cross-document duplicate span
survives)."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.spans import (
    duplicate_span_stats,
    remove_duplicate_spans,
)

_P = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"  # 12-token shared passage


def _docs(spark):
    rows = [
        (0, f"a1 a2 a3 {_P} b1 b2 b3"),
        (1, f"c1 c2 c3 c4 {_P} d1 d2"),
        (2, "u1 u2 u3 u4 u5 u6 u7 u8"),
        (3, "u1 u2 u3 u4 u5 u6 u7 u8"),  # exact clone of doc 2
        (4, "lonely text with no duplication at all here"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_passage_and_clone_coverage(spark):
    stats = {
        r["doc_id"]: (r["total_tokens"], r["dup_tokens"], r["n_spans"])
        for r in duplicate_span_stats(_docs(spark), width=5).collect()
    }
    # docs 0/1: exactly the 12 passage tokens, one maximal span (the
    # boundary-crossing grams contain unique tokens and never repeat)
    assert stats[0] == (18, 12, 1)
    assert stats[1] == (18, 12, 1)
    # clones: every gram duplicated -> full coverage, one span
    assert stats[2] == (8, 8, 1)
    assert stats[3] == (8, 8, 1)
    assert 4 not in stats  # unique doc: no row


def _py_stats(rows, width, min_docs=2):
    occ = {}
    toks = {d: t.split(" ") for d, t in rows}
    for d, t in toks.items():
        for i in range(len(t) - width + 1):
            occ.setdefault(" ".join(t[i:i + width]), []).append((d, i + 1))
    dup = {g for g, o in occ.items() if len({d for d, _ in o}) >= min_docs}
    out = {}
    for d, t in toks.items():
        cov, spans, pmax = 0, 0, 0
        for i in range(len(t) - width + 1):
            if " ".join(t[i:i + width]) not in dup:
                continue
            s, e = i + 1, i + width
            if s > pmax:
                spans += 1
            cov += max(0, e - max(s, pmax + 1) + 1)
            pmax = max(pmax, e)
        if spans:
            out[d] = (len(t), cov, spans)
    return out


def test_matches_pure_python_witness_on_random_corpus(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    shared = [" ".join(rng.choices(vocab, k=rng.randint(6, 12)))
              for _ in range(4)]
    rows = []
    for d in range(25):
        parts = [" ".join(rng.choices(vocab, k=rng.randint(3, 20)))]
        for s in shared:
            if rng.random() < 0.4:
                parts.append(s)
                parts.append(" ".join(rng.choices(vocab, k=3)))
        rows.append((d, " ".join(parts)))
    got = {
        r["doc_id"]: (r["total_tokens"], r["dup_tokens"], r["n_spans"])
        for r in duplicate_span_stats(
            spark.createDataFrame(rows, "doc_id bigint, text string"),
            width=5,
        ).collect()
    }
    assert got == _py_stats(rows, 5)


def test_keep_first_removal_reaches_a_duplicate_free_fixed_point(spark):
    docs = _docs(spark)
    out = remove_duplicate_spans(docs, width=5)
    got = {r["doc_id"]: (r["text"], r["n_removed"]) for r in out.collect()}
    # doc 0 holds the corpus-first occurrence of the passage: untouched
    assert got[0] == (f"a1 a2 a3 {_P} b1 b2 b3", 0)
    # doc 1 loses exactly the passage tokens
    assert got[1] == ("c1 c2 c3 c4 d1 d2", 12)
    # clone pair: 2 survives, 3 empties out
    assert got[2][1] == 0 and got[3] == ("", 8)
    assert got[4][1] == 0
    # fixed point: no cross-document duplicate span survives removal
    rebuilt = spark.createDataFrame(
        [(k, v[0]) for k, v in got.items()], "doc_id bigint, text string"
    )
    assert duplicate_span_stats(rebuilt, width=5).count() == 0


def test_width_longer_than_any_doc_yields_nothing(spark):
    docs = _docs(spark)
    assert duplicate_span_stats(docs, width=50).count() == 0
    out = {r["doc_id"]: r["n_removed"]
           for r in remove_duplicate_spans(docs, width=50).collect()}
    assert set(out.values()) == {0}
