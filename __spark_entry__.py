"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``sec_financial_pipeline_spark.registry`` — one named
entry per implemented operator from SURVEY.md §2 (the ``survey`` field on
each registration says which rows it exercises).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sec_financial_pipeline_spark.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's §3.1 serving plan end-to-end: parquet scan -> unit /
    period / null-key filters -> broadcast alias join (tag coalescing) ->
    windowed argmax-abs dedup -> projection.
    """
    from sec_financial_pipeline_spark.registry.sec_domain import metric_series

    return metric_series(spark, SMOKE_SF_DIR, "revenue", dedup="argmax_abs")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible query."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
