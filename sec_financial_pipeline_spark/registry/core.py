"""Registry plumbing.

Determinism contract for every registered query (SURVEY §7.3f):

- the result *set* is a pure function of the input tables — every window
  and every ``limit`` is backed by a total order (explicit tie-breakers);
- floating-point aggregates go through the deterministic-decimal path
  (``functions.deterministic``) so values are bit-stable across engines,
  partition counts, and runs;
- column names are aliased identically in the Spark plan and the oracle
  SQL (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

#: Submodules that contribute queries (imported lazily by all_queries).
_MODULES = (
    "sec_financial_pipeline_spark.registry.sec_domain",
    "sec_financial_pipeline_spark.registry.relational",
    "sec_financial_pipeline_spark.registry.llm_text",
    "sec_financial_pipeline_spark.registry.similarity",
    "sec_financial_pipeline_spark.registry.events",
    "sec_financial_pipeline_spark.registry.pipeline",
    "sec_financial_pipeline_spark.registry.advanced",
)


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => rows-only driver check
    survey: str = ""  # SURVEY §2 operator ids this query exercises


def register(name: str, oracle: str | None, survey: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, survey=survey)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    for mod in _MODULES:
        importlib.import_module(mod)
    return dict(sorted(_REGISTRY.items()))
