"""Bucketing: co-located joins without a shuffle (PERF.md rule 1 /
pyspark guide "Partitioning & shuffle"). At 100 TB the repeated
fact⨝dim and fact⨝fact joins should be bucket-co-located so only the
first write pays the shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    from sec_financial_pipeline_spark.sources.testdata import load_table

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/warehouse'"
    )
    try:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        (
            o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("bkt.orders_b")
        )
        (
            li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable("bkt.lineitem_b")
        )

        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ob = spark.table("bkt.orders_b")
            lb = spark.table("bkt.lineitem_b")
            joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
                "o_orderpriority"
            ).agg(F.count(F.lit(1)).alias("n"))
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # the join itself must not re-shuffle either bucketed side:
            # the only Exchange allowed is the one feeding the final
            # groupBy on o_orderpriority
            join_part = plan.split("HashAggregate")[-1]
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning(o_orderkey" not in plan
            assert "Exchange hashpartitioning(l_orderkey" not in plan
            # and it still computes the right answer
            n_total = sum(r.n for r in joined.collect())
            assert n_total == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")
