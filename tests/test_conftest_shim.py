"""The conftest fast-createDataFrame shim must be a pure accelerator:
row-for-row identical to the classic list path on every type the suite
uses, and it must step aside (classic path) for the shapes Arrow
handles differently."""

from __future__ import annotations

import datetime
from decimal import Decimal

from tests.conftest import _install_fast_create_dataframe


def _classic(spark, data, schema):
    # the original bound method survives as the closure's `orig`; call
    # Spark's implementation directly through the class to compare
    from pyspark.sql import SparkSession

    return SparkSession.createDataFrame(spark, data, schema)


def test_shim_matches_classic_on_nasty_rows(spark):
    data = [
        (1, None, None, None, None, None),
        (None, 2.5, "émoji ✨|pipe", datetime.datetime(2024, 1, 2, 3, 4, 5),
         [1, 2, None], Decimal("12345.678900")),
        ((1 << 62), -0.0, "", datetime.datetime(1969, 12, 31, 23, 59, 59),
         [], Decimal("-0.000001")),
    ]
    schema = (
        "a bigint, b double, c string, d timestamp, e array<bigint>, "
        "f decimal(30,6)"
    )
    got = sorted(map(str, spark.createDataFrame(data, schema).collect()))
    want = sorted(map(str, _classic(spark, data, schema).collect()))
    assert got == want
    # dtypes too, not just rendering
    assert spark.createDataFrame(data, schema).dtypes == _classic(
        spark, data, schema
    ).dtypes


def test_shim_falls_back_for_nan_rows_and_dicts(spark):
    # NaN: Arrow would null it; the classic path keeps it — the shim
    # must detect and defer
    nan = float("nan")
    rows = spark.createDataFrame([(1, nan)], "k int, v double").collect()
    assert rows[0].v != rows[0].v  # still NaN, not NULL
    # Row / dict inputs and schema-less calls just work (classic path)
    out = spark.createDataFrame([{"k": 1, "v": 2.0}]).collect()
    assert out[0].k == 1 and out[0].v == 2.0


def test_shim_handles_empty_partitions_and_downstream_ops(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(30)], "k int, v double"
    )
    agg = {
        r.k: r.s
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert agg == {0: sum(float(i) for i in range(30) if i % 3 == 0),
                   1: sum(float(i) for i in range(30) if i % 3 == 1),
                   2: sum(float(i) for i in range(30) if i % 3 == 2)}
    # repartition / write round-trip (tmp-less: localCheckpoint)
    assert df.repartition(7).localCheckpoint(eager=True).count() == 30


def test_shim_is_installed_and_idempotent(spark):
    # the session fixture installed it; installing again must not stack
    # python-level wrappers into misbehavior
    before = spark.createDataFrame
    _install_fast_create_dataframe(spark)
    out = spark.createDataFrame([(1, "x")], "a int, b string").collect()
    assert [(r.a, r.b) for r in out] == [(1, "x")]
    spark.createDataFrame = before
