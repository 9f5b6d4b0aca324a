"""Hashed logistic-regression quality classifier
(operators/classifier.py).

The driver-facing integration (the `classifier` section of
doc_curation_pipeline) is oracle-checked against the mechanically
unrolled SQL replay; this file pins the training arithmetic against an
independent pure-Python witness (same integer scheme, independently
coded), partitioning invariance, and the property that actually makes
the stage useful: the reference stratum's keep rate exceeds the
pool's.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.classifier import (
    LEARNING_RATE,
    quality_classifier_stats,
)

_B = 64


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % _B


def _round_half_up(v: float) -> int:
    # Spark F.round semantics (ties away from zero), not Python's
    # banker's rounding
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _witness(rows, steps):
    """Independent replay: rows = [(id, stratum, text, y)]. The bias is
    the constant bucket -1 feature with x = 1 (nano units; its delta
    carries the extra 1e6 factor)."""
    feats, lens = {}, {}
    for i, _, t, _ in rows:
        w = t.split(" ")
        lens[i] = len(w)
        grams = w + [w[j] + " " + w[j + 1] for j in range(len(w) - 1)]
        c: dict[int, int] = {}
        for g in grams:
            b = _bucket(g)
            c[b] = c.get(b, 0) + 1
        feats[i] = {b: int(cnt * 1000.0 / lens[i]) for b, cnt in c.items()}
        feats[i][-1] = 1
    n = float(len(rows))
    w: dict[int, int] = {}
    for _ in range(steps):
        errs = {}
        for i, _, _, y in rows:
            z = sum(x * w.get(b, 0) for b, x in feats[i].items())
            p = 1.0 / (1.0 + math.exp(-(float(z)) / 1.0e9))
            errs[i] = _round_half_up((p - y) * 1000.0)
        grad: dict[int, int] = {}
        for i, _, _, _ in rows:
            for b, x in feats[i].items():
                grad[b] = grad.get(b, 0) + x * errs[i]
        for b, g in grad.items():
            if b == -1:
                w[b] = w.get(b, 0) - int((LEARNING_RATE * g) * 1.0e6 / n)
            else:
                w[b] = w.get(b, 0) - int((LEARNING_RATE * g) / n)
    out = {}
    zs = {
        i: sum(x * w.get(b, 0) for b, x in feats[i].items())
        for i, _, _, _ in rows
    }
    sz, nn = sum(zs.values()), len(rows)
    for i, s, _, y in rows:
        st = out.setdefault(s, {"n_docs": 0, "n_keep": 0, "checksum": 0,
                                "score_milli": 0})
        st["n_docs"] += 1
        st["score_milli"] += zs[i]
        if zs[i] * nn >= sz:
            st["n_keep"] += 1
            st["checksum"] += i
    return out


def _corpus():
    # two strata with overlapping vocab plus stratum-marker words —
    # the lang-ID-ish shape the real corpus has
    rows = []
    common = ["alpha", "bravo", "tables", "query", "scan", "merge",
              "joins", "group"]
    for i in range(60):
        marker = ["good", "clean"] if i % 3 == 0 else ["noisy", "crawl"]
        words = [common[(i + j) % len(common)] for j in range(20)] + marker * 3
        rows.append((i, "ref" if i % 3 == 0 else "pool",
                     " ".join(words), 1 if i % 3 == 0 else 0))
    return rows


def test_matches_independent_witness_and_partitioning_invariant(spark):
    rows = _corpus()
    want = _witness(rows, steps=3)
    for n_part in (3, 13):
        df = spark.createDataFrame(
            [(i, s, t) for i, s, t, _ in rows],
            "doc_id long, src string, text string",
        ).repartition(n_part)
        got = {
            r["src"]: r.asDict()
            for r in quality_classifier_stats(
                df, "doc_id", "text", "src",
                is_positive=F.col("src") == "ref",
                n_buckets=_B, steps=3,
            ).collect()
        }
        for s, wv in want.items():
            gv = got[s]
            for k in ("n_docs", "n_keep", "checksum", "score_milli"):
                assert gv[k] == wv[k], (n_part, s, k, gv[k], wv[k])


def test_single_step_matches_witness(spark):
    # steps=1 isolates the zero-weight first step, which since r14 skips
    # the margin pass entirely (z == 0 exactly when all weights are
    # zero) — the shortcut must replay bit-identically to the witness's
    # explicit z computation
    rows = _corpus()
    want = _witness(rows, steps=1)
    df = spark.createDataFrame(
        [(i, s, t) for i, s, t, _ in rows],
        "doc_id long, src string, text string",
    )
    got = {
        r["src"]: r.asDict()
        for r in quality_classifier_stats(
            df, "doc_id", "text", "src",
            is_positive=F.col("src") == "ref",
            n_buckets=_B, steps=1,
        ).collect()
    }
    for s, wv in want.items():
        for k in ("n_docs", "n_keep", "checksum", "score_milli"):
            assert got[s][k] == wv[k], (s, k, got[s][k], wv[k])


def test_reference_stratum_keeps_more(spark):
    rows = _corpus()
    df = spark.createDataFrame(
        [(i, s, t) for i, s, t, _ in rows],
        "doc_id long, src string, text string",
    )
    got = {
        r["src"]: r.asDict()
        for r in quality_classifier_stats(
            df, "doc_id", "text", "src",
            is_positive=F.col("src") == "ref",
            n_buckets=_B, steps=3,
        ).collect()
    }
    ref_rate = got["ref"]["n_keep"] / got["ref"]["n_docs"]
    pool_rate = got["pool"]["n_keep"] / got["pool"]["n_docs"]
    assert ref_rate > pool_rate, (ref_rate, pool_rate)


def test_zero_steps_keeps_everything(spark):
    # untrained model: every margin is 0, the mean is 0, the relative
    # gate keeps all — the degenerate case stays well-defined
    rows = _corpus()
    df = spark.createDataFrame(
        [(i, s, t) for i, s, t, _ in rows],
        "doc_id long, src string, text string",
    )
    got = quality_classifier_stats(
        df, "doc_id", "text", "src",
        is_positive=F.col("src") == "ref", n_buckets=_B, steps=0,
    ).collect()
    for r in got:
        assert r["n_keep"] == r["n_docs"] and r["score_milli"] == 0


def test_featurize_single_pass_and_exchange_free_when_id_partitioned(spark):
    """r15 plan + value gate: normalized_features computes counts,
    length normalization AND the bias feature in one pass — fed an
    id-partitioned input, its physical plan carries exactly ONE
    exchange (the caller's repartition; hash(id) satisfies the
    groupBy's ClusteredDistribution), and the values match a
    hand-computed witness including the bias rows."""
    from sec_financial_pipeline_spark.operators.classifier import (
        normalized_features,
    )

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "x"), (3, "a b a")],
        "id long, t string",
    )
    feats = normalized_features(docs.repartition("id"), "id", "t", _B)
    plan = feats._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re as _re

    n_ex = len(_re.findall(r"^\(\d+\) Exchange", plan, _re.M))
    assert n_ex == 1, plan

    got = {(r["id"], r["bucket"]): r["x"] for r in feats.collect()}
    # witness: doc 1/3 = tokens [a,b,a] + bigrams ["a b","b a"], ln=3;
    # doc 2 = [x], ln=1; bias bucket -1 with x=1 for every doc
    def x(cnt, ln):
        return int(cnt * 1000.0 / ln)

    want = {}
    for d, grams, ln in (
        (1, ["a", "b", "a", "a b", "b a"], 3),
        (3, ["a", "b", "a", "a b", "b a"], 3),
        (2, ["x"], 1),
    ):
        cnts: dict[int, int] = {}
        for g in grams:
            cnts[_bucket(g)] = cnts.get(_bucket(g), 0) + 1
        for b, c in cnts.items():
            want[(d, b)] = x(c, ln)
        want[(d, -1)] = 1
    assert got == want


def test_train_derives_n_docs_from_bias_rows(spark):
    """r15: with n_docs omitted, train_logreg_milli reads the doc
    count off the first gradient aggregation (the bias bucket's row
    count) — the weights must be identical to an explicit n_docs."""
    from sec_financial_pipeline_spark.operators.classifier import (
        normalized_features,
        train_logreg_milli,
    )

    rows = _corpus()
    docs = spark.createDataFrame(
        [(i, t) for i, _, t, _ in rows], "id long, t string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, _, y in rows], "id long, y int"
    )
    feats = normalized_features(
        docs.repartition("id"), "id", "t", _B
    ).persist()
    try:
        w_auto = train_logreg_milli(feats, labels, steps=2)
        w_explicit = train_logreg_milli(
            feats, labels, n_docs=len(rows), steps=2
        )
    finally:
        feats.unpersist()
    assert w_auto == w_explicit and w_auto
