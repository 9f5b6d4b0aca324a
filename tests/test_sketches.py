"""Engine-independent HLL (operators/sketches.py): registers and
estimates replicated by a pure-Python witness, mergeability
(sketch(A∪B) == merge(sketch(A), sketch(B))), and the standard-error
bound over a cardinality sweep."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import sketches


def _py_registers(keys, b=6):
    regs = {}
    width = 32 - b
    for k in keys:
        h32 = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        bucket = h32 >> width
        rest = h32 & ((1 << width) - 1)
        rho = width + 1 - (rest.bit_length() if rest else 0)
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_estimate(regs, b=6):
    m = 1 << b
    z = (m - len(regs)) + sum(2.0 ** -v for v in regs.values())
    return round(0.709 * m * m / z, 4) if m == 64 else None


def test_registers_and_estimate_match_python_witness(spark):
    keys = [f"user-{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got_regs = {
        (r.bucket): r.M
        for r in sketches.hll_registers(df, "k").collect()
    }
    assert got_regs == _py_registers(keys)
    est = sketches.hll_distinct(df, "k").collect()[0]
    assert est.hll_distinct == _py_estimate(_py_registers(keys))
    assert est.n_registers == len(_py_registers(keys))
    assert est.n_zero == 64 - est.n_registers


def test_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(f"u{i}",) for i in range(300)], "k string")
    b_ = spark.createDataFrame([(f"u{i}",) for i in range(200, 600)], "k string")
    ra = sketches.hll_registers(a, "k")
    rb = sketches.hll_registers(b_, "k")
    merged = {
        r.bucket: r.M for r in sketches.hll_merge(ra, rb).collect()
    }
    union = {
        r.bucket: r.M
        for r in sketches.hll_registers(a.unionByName(b_), "k").collect()
    }
    assert merged == union


@pytest.mark.parametrize("n", [100, 1000, 10000])
def test_error_within_theory_bound(spark, n):
    """Raw-HLL relative error stays within 4 standard errors
    (1.04/sqrt(64) ~ 13%) at cardinalities past the small-range
    regime."""
    df = spark.range(n).select(F.concat(F.lit("id-"), "id").alias("k"))
    est = sketches.hll_distinct(df, "k").collect()[0].hll_distinct
    rel = abs(est - n) / n
    assert rel < 4 * 1.04 / math.sqrt(64), (n, est, rel)


def test_grouped_sketch_partial_aggregable(spark):
    """Grouped sketches equal per-group sketches, independent of
    partitioning (the map-side-combine property)."""
    rows = [(f"g{i % 3}", f"u{i % 700}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, k string")
    whole = {
        (r.g, r.bucket): r.M
        for r in sketches.hll_registers(df, "k", ["g"]).collect()
    }
    whole2 = {
        (r.g, r.bucket): r.M
        for r in sketches.hll_registers(
            df.repartition(17), "k", ["g"]
        ).collect()
    }
    assert whole == whole2
    for g in ("g0", "g1", "g2"):
        solo = _py_registers([k for gg, k in rows if gg == g])
        assert {b: m for (gg, b), m in whole.items() if gg == g} == solo


# ------------------------------------------------------------- Count-Min


def _py_cms(keys, d=4, w=256):
    cnt = {}
    for k in keys:
        for i in range(d):
            c = int(hashlib.md5(f"{i}#{k}".encode()).hexdigest()[:8], 16) % w
            cnt[(i, c)] = cnt.get((i, c), 0) + 1
    return cnt


def _py_cms_est(cnt, k, d=4, w=256):
    return min(
        cnt.get(
            (i, int(hashlib.md5(f"{i}#{k}".encode()).hexdigest()[:8], 16) % w),
            0,
        )
        for i in range(d)
    )


def test_cms_counters_and_lookup_match_python_witness(spark):
    keys = [f"k{i % 40}" for i in range(2000)]  # skewed: k0.. repeat
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    counters = sketches.cms_counters(df, "k")
    got = {(r.row, r.counter): r.cnt for r in counters.collect()}
    assert got == _py_cms(keys)
    probes = spark.createDataFrame([(f"k{i}",) for i in range(45)], "k string")
    est = {
        r.k: r.cms_est
        for r in sketches.cms_lookup(counters, probes, "k").collect()
    }
    for i in range(45):
        assert est[f"k{i}"] == _py_cms_est(_py_cms(keys), f"k{i}")
    # one-sided error: never under the true count
    true = {f"k{i}": keys.count(f"k{i}") for i in range(45)}
    assert all(est[k] >= true[k] for k in true)


def test_cms_one_sided_error_under_forced_collisions(spark):
    """w=16 with 500 distinct keys FORCES collisions: estimates must
    overcount (never undercount), bounded by the collision mass."""
    from pyspark.sql import functions as F

    df = spark.range(500).select(F.concat(F.lit("u"), "id").alias("k"))
    counters = sketches.cms_counters(df, "k", d=4, w=16)
    probes = df.limit(50)
    est = sketches.cms_lookup(counters, probes, "k", d=4, w=16)
    rows = est.collect()
    assert all(r.cms_est >= 1 for r in rows)
    assert any(r.cms_est > 1 for r in rows)  # collisions really happened
    assert all(r.cms_est <= 500 for r in rows)


def test_cms_merge_equals_sketch_of_union(spark):
    from pyspark.sql import functions as F

    a = spark.range(300).select(F.concat(F.lit("x"), "id").alias("k"))
    b = spark.range(100, 700).select(F.concat(F.lit("x"), "id").alias("k"))
    merged = {
        (r.row, r.counter): r.cnt
        for r in sketches.cms_merge(
            sketches.cms_counters(a, "k"), sketches.cms_counters(b, "k")
        ).collect()
    }
    union = {
        (r.row, r.counter): r.cnt
        for r in sketches.cms_counters(a.unionByName(b), "k").collect()
    }
    assert merged == union


# ------------------------------------------------------------------ KMV


def _py_kmv(keys, k=64):
    hs = sorted({int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)
                 for x in keys})
    return hs[:k]


def test_kmv_sketch_matches_python_witness(spark):
    from pyspark.sql import functions as F

    df = spark.range(5000).select(F.concat(F.lit("v"), "id").alias("k"))
    got = [r.h for r in sketches.kmv_sketch(df, "k").collect()]
    assert sorted(got) == _py_kmv([f"v{i}" for i in range(5000)])


def test_kmv_overlap_estimates_partial_intersection(spark):
    """A = 0..5999, B = 3000..8999: true Jaccard 1/3, intersection
    3000, union 9000 — estimates within 4 standard errors
    (~1/sqrt(k-2) ~ 12.7%) of truth."""
    from pyspark.sql import functions as F

    a = spark.range(0, 6000).select(F.col("id").alias("k"))
    b = spark.range(3000, 9000).select(F.col("id").alias("k"))
    est = sketches.kmv_overlap(
        sketches.kmv_sketch(a, "k"), sketches.kmv_sketch(b, "k")
    ).collect()[0]
    se = 4 * 1.0 / (62 ** 0.5)
    assert est.k_used == 64
    assert abs(est.est_union - 9000) / 9000 < se, est
    assert abs(est.est_jaccard - 1 / 3) < se, est
    assert abs(est.est_intersection - 3000) / 3000 < 2 * se, est


def test_kmv_unsaturated_sets_are_exact(spark):
    """Union smaller than k: the sketch IS the set — union exact,
    Jaccard exact."""
    from pyspark.sql import functions as F

    a = spark.range(0, 30).select(F.col("id").alias("k"))
    b = spark.range(20, 50).select(F.col("id").alias("k"))
    est = sketches.kmv_overlap(
        sketches.kmv_sketch(a, "k"), sketches.kmv_sketch(b, "k")
    ).collect()[0]
    assert est.k_used == 50 and est.est_union == 50.0
    assert est.est_jaccard == round(10 / 50, 4)
    assert est.est_intersection == 10.0


# ---------------------------------------------------------------------------
# HDR log-bucket quantile histogram
# ---------------------------------------------------------------------------


def test_hdr_bucket_spark_matches_python_mirror(spark):
    import random

    random.seed(11)
    vals = [random.randint(-(10**12), 10**12) for _ in range(2000)] + [
        0, 1, 2, 31, 32, 33, 63, 64, 65, -1, -32, -64,
    ]
    df = spark.createDataFrame([(v,) for v in set(vals)], "v long")
    got = {
        r.v: r.b
        for r in df.select(
            "v", sketches.hdr_bucket(F.col("v")).alias("b")
        ).collect()
    }
    for v, b in got.items():
        assert b == sketches.hdr_bucket_py(v), v
        lo, hi = sketches.hdr_bounds(b)
        assert lo <= v <= hi, (v, b, lo, hi)


def test_hdr_bucket_order_and_exact_small_values():
    # bucket order == value order; values below 2^6 map one-per-bucket
    vals = sorted(set(list(range(-80, 81)) + [10**k for k in range(1, 13)]))
    bs = [sketches.hdr_bucket_py(v) for v in vals]
    assert bs == sorted(bs)
    small = [v for v in vals if 0 <= v < 64]
    assert len({sketches.hdr_bucket_py(v) for v in small}) == len(small)
    for v in small:
        assert sketches.hdr_bounds(sketches.hdr_bucket_py(v)) == (v, v)


def test_hdr_merge_equals_union(spark):
    a = spark.range(0, 5000).select((F.col("id") * 37 % 9973).alias("v"))
    b = spark.range(0, 3000).select((F.col("id") * 91 + 10**6).alias("v"))
    ha = sketches.hdr_histogram(a, "v")
    hb = sketches.hdr_histogram(b, "v")
    merged = {
        r.hdr_bucket: r.hdr_cnt
        for r in sketches.hdr_merge(ha, hb).collect()
    }
    union = {
        r.hdr_bucket: r.hdr_cnt
        for r in sketches.hdr_histogram(a.unionAll(b), "v").collect()
    }
    assert merged == union


def test_hdr_quantiles_within_relative_bucket_error(spark):
    # heavy-tailed values — the case equi-width histograms lose
    vals = [int(1.5**k) + j for k in range(1, 40) for j in range(3)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    state = [
        (r.hdr_bucket, r.hdr_cnt)
        for r in sketches.hdr_histogram(df, "v").collect()
    ]
    assert len(state) <= 64 * 32  # bounded regardless of input size
    qs = [0.1, 0.5, 0.9, 0.99]
    est = sketches.hdr_quantiles(state, qs)
    exact = sorted(vals)
    for q, e in zip(qs, est):
        true = exact[min(len(exact) - 1, max(0, math.ceil(q * len(exact)) - 1))]
        assert e <= true  # lower-bound estimate
        assert true <= e * (1 + 2 ** -5) + 1, (q, e, true)


def test_hdr_partitioning_invariant(spark):
    vals = [(v,) for v in range(1, 4001)]
    one = sketches.hdr_histogram(
        spark.createDataFrame(vals, "v long").coalesce(1), "v"
    ).collect()
    many = sketches.hdr_histogram(
        spark.createDataFrame(vals, "v long").repartition(13), "v"
    ).collect()
    assert {(r.hdr_bucket, r.hdr_cnt) for r in one} == {
        (r.hdr_bucket, r.hdr_cnt) for r in many
    }
