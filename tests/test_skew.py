"""Salted aggregation: skew-safe two-phase sums equal the plain plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_sum_matches_plain(spark, sf_dir):
    from sec_financial_pipeline_spark.functions.deterministic import dsum
    from sec_financial_pipeline_spark.operators.skew import salted_sum
    from sec_financial_pipeline_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: r.total
        for r in li.groupBy("l_returnflag")
        .agg(dsum("l_extendedprice").alias("total"))
        .collect()
    }
    salted = {
        r.l_returnflag: r.total
        for r in salted_sum(
            li,
            ["l_returnflag"],
            F.col("l_extendedprice"),
            "total",
            n_salts=16,
            salt_source="l_orderkey",
        ).collect()
    }
    # exact decimal partials compose exactly: bit-identical results
    assert salted == plain
