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
