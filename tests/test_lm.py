"""Bigram-LM perplexity scoring (operators/lm.py): the CCNet-style
quality filter in integer milli-nats."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import lm


def _corpus(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the rug", "en"),
        (3, "the cat ate the fish", "en"),
        (4, "zorp blix quux flarn zorp blix", "xx"),
        (5, "the cat sat on the mat", "xx"),  # en-like text, xx label
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_scores_match_pure_python_replication(spark):
    """Three-engine agreement: the Spark milli-nat totals replicate in
    pure Python (math.log) bigram-for-bigram."""
    docs = _corpus(spark)
    train_rows = [r.text for r in docs.filter("lang = 'en'").collect()]
    uni = Counter(w for t in train_rows for w in t.split(" "))
    bi = Counter(
        f"{a} {b}"
        for t in train_rows
        for a, b in zip(t.split(" "), t.split(" ")[1:])
    )
    v = len(uni)
    got = {
        r.id: (r.ppl_milli, r.n_bigrams)
        for r in lm.score_documents(
            docs, "doc_id", "text", docs.filter("lang = 'en'")
        ).collect()
    }
    for r in docs.collect():
        ws = r.text.split(" ")
        want = sum(
            round(
                (math.log(uni.get(a, 0) + float(v))
                 - math.log(bi.get(f"{a} {b}", 0) + 1.0)) * 1000.0
            )
            for a, b in zip(ws, ws[1:])
        )
        assert got[r.doc_id] == (want, len(ws) - 1), r.doc_id


def test_target_like_text_scores_lower(spark):
    """An en-like document under an en-trained LM must score a lower
    per-bigram NLL than alien-vocabulary text (every unseen bigram
    pays the full ln(V) smoothing penalty)."""
    docs = _corpus(spark)
    out = {
        r.id: r.avg_milli
        for r in lm.score_documents(
            docs, "doc_id", "text", docs.filter("lang = 'en'")
        ).collect()
    }
    assert out[5] < out[4]  # en-like text beats alien vocab
    assert out[1] < out[4]


def test_bucketing_and_determinism(spark):
    docs = _corpus(spark)
    a = lm.score_documents(
        docs, "doc_id", "text", docs.filter("lang = 'en'"),
        good=2000, mid=4000,
    )
    b = lm.score_documents(
        docs, "doc_id", "text", docs.filter("lang = 'en'"),
        good=2000, mid=4000,
    )
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    assert dict(a.dtypes)["ppl_milli"] == "bigint"
    assert set(r[-1] for r in ra) <= {"head", "middle", "tail"}
    # avg is the integer quotient
    for r in ra:
        assert r[3] == r[1] // r[2]


def test_single_token_docs_are_absent(spark):
    docs = spark.createDataFrame(
        [(1, "word"), (2, "two words")], "doc_id bigint, text string"
    )
    out = lm.score_documents(docs, "doc_id", "text", docs)
    ids = [r.id for r in out.collect()]
    assert ids == [2]  # no bigrams in a 1-token doc
