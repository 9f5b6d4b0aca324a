"""Oracle result-TYPE parity — the lint that kills a three-round bug class.

The driver hashes rendered cell values, so an oracle column whose DuckDB
type differs in *kind* from the Spark column hashes differently even when
every value is numerically identical (r2: VARCHAR coercion; r3+r5: DuckDB
``sum(BIGINT)`` -> HUGEINT rendering ``23`` vs ``23.0``). Neither the
value-parity sweep (compares after Python coercion) nor the determinism
gate (Spark-vs-Spark) can see this, so it is checked here at the type
level:

- binding every oracle in DuckDB must produce NO HUGEINT / UHUGEINT /
  DECIMAL column — integer aggregates must be ``CAST(... AS BIGINT)``;
- per column name, the DuckDB type category (int / float / string / bool /
  date / timestamp / nested) must equal the Spark type category.

Binding (``con.sql(...)``) resolves types without executing, so the DuckDB
side is free; the Spark side only needs plan analysis via ``q.fn``.
"""

from __future__ import annotations

import pytest

from sec_financial_pipeline_spark.registry import all_queries

QUERIES = all_queries()

_BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

_DUCK_CATEGORY = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp",
}

_SPARK_CATEGORY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "string",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def _duck_cat(t: str) -> str:
    t = str(t).upper()
    for b in _BANNED:
        if t.startswith(b):
            return "banned"
    return _DUCK_CATEGORY.get(t, "nested")


def _spark_cat(t: str) -> str:
    return _SPARK_CATEGORY.get(t, "nested")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_types_match_spark(name, spark, duck, sf_dir):
    q = QUERIES[name]
    if q.oracle is None:
        pytest.skip("rows-only query, no oracle to type-check")

    rel = duck.sql(q.oracle)
    oracle_types = dict(zip(rel.columns, (str(t) for t in rel.types)))

    banned = {c: t for c, t in oracle_types.items() if _duck_cat(t) == "banned"}
    assert not banned, (
        f"{name}: oracle emits driver-hash-unsafe types {banned} — "
        f"wrap the expression in CAST(... AS BIGINT/DOUBLE)"
    )

    spark_types = {
        f.name: f.dataType.simpleString() for f in q.fn(spark, sf_dir).schema.fields
    }

    assert sorted(c.lower() for c in oracle_types) == sorted(
        c.lower() for c in spark_types
    ), f"{name}: column sets differ {sorted(oracle_types)} vs {sorted(spark_types)}"

    oracle_by_lower = {c.lower(): t for c, t in oracle_types.items()}
    mismatches = {
        c: (oracle_by_lower[c.lower()], t)
        for c, t in spark_types.items()
        if _duck_cat(oracle_by_lower[c.lower()]) != _spark_cat(t)
    }
    assert not mismatches, (
        f"{name}: oracle/Spark type-category drift (oracle, spark): {mismatches}"
    )
