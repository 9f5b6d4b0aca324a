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
