"""Section-tagged query merging.

The round driver hard-checks only the first 50 registered names in
sorted order, so the registry must stay within that window WITHOUT
dropping operator coverage. The established consolidation pattern
(round 2): union the exact constituent result sets under a ``section``
tag, padding each constituent to a shared superset schema with typed
NULLs. Every constituent row survives bit-identically — the merged
query's oracle is the UNION ALL of the constituents' oracles wrapped as
derived tables (DuckDB allows a full ``WITH ... SELECT`` inside a
subquery), so nothing about the per-operator semantics is weakened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Spark simpleString type -> DuckDB type for NULL padding casts.
_DUCK_TYPES = {
    "string": "VARCHAR",
    "double": "DOUBLE",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "date": "DATE",
    "boolean": "BOOLEAN",
}

Schema = list[tuple[str, str]]  # [(column, spark type)]


def pad_section(df: DataFrame, tag: str, schema: Schema) -> DataFrame:
    """Project ``df`` onto the superset ``schema`` with a leading
    ``section`` tag; columns the constituent lacks become typed NULLs."""
    cols = [F.lit(tag).alias("section")]
    for name, typ in schema:
        if name in df.columns:
            cols.append(F.col(name).cast(typ).alias(name))
        else:
            cols.append(F.lit(None).cast(typ).alias(name))
    return df.select(*cols)


def union_sections(parts: list[tuple[str, DataFrame]], schema: Schema) -> DataFrame:
    out = None
    for tag, df in parts:
        p = pad_section(df, tag, schema)
        out = p if out is None else out.unionByName(p)
    return out


def pad_section_sql(oracle: str, tag: str, cols: list[str], schema: Schema) -> str:
    """The SQL twin of :func:`pad_section`: wrap a full oracle (its WITH
    prelude included) as a derived table and project the superset."""
    sel = [f"'{tag}' AS section"]
    for name, typ in schema:
        if name in cols:
            sel.append(f'CAST("{name}" AS {_DUCK_TYPES[typ]}) AS "{name}"')
        else:
            sel.append(f'CAST(NULL AS {_DUCK_TYPES[typ]}) AS "{name}"')
    return "SELECT " + ",\n       ".join(sel) + f"\nFROM (\n{oracle}\n)"


def union_sections_sql(
    parts: list[tuple[str, str, list[str]]], schema: Schema
) -> str:
    """``parts`` = [(tag, oracle_sql, constituent_columns)]."""
    return "\nUNION ALL\n".join(
        pad_section_sql(oracle, tag, cols, schema) for tag, oracle, cols in parts
    )
