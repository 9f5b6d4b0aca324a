"""DSIR importance resampling (operators/selection.py): hashed-ngram
log-ratio scoring in integer milli-nats, Gumbel top-k selection."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import selection as S


def _corpus(spark):
    """Target language is 'alpha beta gamma ...'; half the raw pool
    speaks it, half speaks a disjoint 'zeta eta theta ...' vocab —
    the selection must strongly prefer the target-like half."""
    alpha = "alpha beta gamma delta epsilon kappa"
    zeta = "zeta eta theta iota lambda sigma"
    rows = []
    for i in range(40):  # target corpus
        rows.append((i, f"{alpha} {alpha} {alpha}", "t"))
    for i in range(100, 140):  # raw, target-like
        rows.append((i, f"{alpha} {alpha} {alpha}", "r"))
    for i in range(200, 240):  # raw, alien vocab
        rows.append((i, f"{zeta} {zeta} {zeta}", "r"))
    return spark.createDataFrame(rows, "doc_id bigint, text string, pool string")


def test_dsir_selects_target_like_documents(spark):
    docs = _corpus(spark)
    sel = S.dsir_select(
        docs, "doc_id", "text", is_target=F.col("pool") == "t",
        rate=0.5, n_buckets=256, salt="s1",
    )
    picked = sorted(r.doc_id for r in sel.collect())
    assert len(picked) == 40  # floor(0.5 * 80)
    target_like = sum(1 for i in picked if 100 <= i < 140)
    # log-ratio weights dwarf the Gumbel noise on this separation:
    # the target-like half is picked essentially wholesale
    assert target_like >= 38, f"only {target_like}/40 target-like picked"


def test_dsir_scores_are_deterministic_and_integer(spark):
    docs = _corpus(spark)
    a = S.dsir_select(
        docs, "doc_id", "text", is_target=F.col("pool") == "t",
        rate=0.25, n_buckets=128, salt="s2",
    )
    b = S.dsir_select(
        docs, "doc_id", "text", is_target=F.col("pool") == "t",
        rate=0.25, n_buckets=128, salt="s2",
    )
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    assert dict(a.dtypes)["score_milli"] == "bigint"
    assert dict(a.dtypes)["key_milli"] == "bigint"
    # a different Gumbel salt may change the picked set (noise is real)
    c = S.dsir_select(
        docs, "doc_id", "text", is_target=F.col("pool") == "t",
        rate=0.25, n_buckets=128, salt="s3",
    )
    assert c.count() == a.count() == 20


def test_bucket_weights_match_python_replication(spark):
    """Milli-nat weights replicate in pure Python (math.log) — the
    three-engine agreement (JVM / DuckDB / CPython) is the strongest
    evidence the integer quantization firewall holds."""
    docs = _corpus(spark)
    B = 64
    tc = S.doc_gram_buckets(
        docs.filter("pool = 't'"), "doc_id", "text", B
    )
    rc = S.doc_gram_buckets(
        docs.filter("pool = 'r'"), "doc_id", "text", B
    )
    w = {r.bucket: r.w_milli for r in S.dsir_bucket_weights(tc, rc, B).collect()}
    nt = {r.bucket: r.n for r in tc.groupBy("bucket").agg(F.sum("cnt").alias("n")).collect()}
    nr = {r.bucket: r.n for r in rc.groupBy("bucket").agg(F.sum("cnt").alias("n")).collect()}
    T, R = sum(nt.values()), sum(nr.values())
    for b_, got in w.items():
        want = round(
            (math.log(nt.get(b_, 0) + 1.0) - math.log(nr[b_] + 1.0)
             - math.log(T + B) + math.log(R + B)) * 1000.0
        )
        assert got == want, (b_, got, want)


def test_gumbel_milli_distribution_sane(spark):
    """Hash-Gumbel noise: deterministic per key, roughly Gumbel-shaped
    (median near ~0.367's ppf = 0.3665, heavy right tail)."""
    df = spark.range(0, 20000).select(
        S.gumbel_milli(F.col("id"), "g1").alias("g")
    )
    rows = sorted(r.g for r in df.collect())
    med = rows[len(rows) // 2] / 1000.0
    assert 0.25 < med < 0.5  # Gumbel(0,1) median = -ln(ln 2) = 0.3665
    assert rows[-1] > 5000  # right tail reaches past 5 nats
    assert rows[0] > -3000  # left tail bounded (~ -ln(ln(2^32)))


def test_dsir_selection_plan_uses_take_ordered(spark):
    """orderBy().limit(k) must plan TakeOrderedAndProject — the
    distributed top-k — not a global sort."""
    docs = _corpus(spark)
    sel = S.dsir_select(
        docs, "doc_id", "text", is_target=F.col("pool") == "t",
        rate=0.25, n_buckets=64, salt="s4",
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [key_milli" not in plan


def test_psi_drift_detects_planted_shift(spark):
    """PSI drift monitor: identical corpora score ~0; a vocabulary
    shift scores large; totals replicate in pure Python (three-engine
    agreement via the micro-unit quantization)."""
    import math
    from collections import Counter

    from sec_financial_pipeline_spark.operators import drift

    same = [(i, "alpha beta gamma delta " * 5) for i in range(30)]
    shifted = [(i, "zeta eta theta iota " * 5) for i in range(100, 130)]
    a = spark.createDataFrame(same, "doc_id bigint, text string")
    b_same = spark.createDataFrame(
        [(i + 500, t) for i, t in same], "doc_id bigint, text string"
    )
    b_shift = spark.createDataFrame(shifted, "doc_id bigint, text string")
    B = 64
    t_same = drift.psi_total(
        drift.psi_bucket_terms(a, b_same, "doc_id", "text", B)
    ).collect()[0]
    t_shift = drift.psi_total(
        drift.psi_bucket_terms(a, b_shift, "doc_id", "text", B)
    ).collect()[0]
    assert t_same.psi_micro < 10_000       # < 0.01 PSI: stable
    assert t_shift.psi_micro > 250_000     # > 0.25 PSI: major shift
    # pure-Python replication of the shifted report
    def grams(text):
        w = text.split(" ")
        return w + [f"{x} {y}" for x, y in zip(w, w[1:])]
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
    ca = Counter(bucket(g) for _, t in same for g in grams(t))
    cb = Counter(bucket(g) for _, t in shifted for g in grams(t))
    at = float(sum(ca.values()) + B)
    bt = float(sum(cb.values()) + B)
    want = sum(
        round((((ca.get(k, 0) + 1.0) / at - (cb.get(k, 0) + 1.0) / bt)
               * (math.log(ca.get(k, 0) + 1.0) - math.log(cb.get(k, 0) + 1.0)
                  - math.log(at) + math.log(bt))) * 1000000.0)
        for k in set(ca) | set(cb)
    )
    assert t_shift.psi_micro == want
