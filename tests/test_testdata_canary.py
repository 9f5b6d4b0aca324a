"""Testdata schema-drift canary (the round-4 failure mode: the driver
regenerated the parquet between rounds and events.ts changed wire
format, erroring 15 queries and crashing bench). Every table at every
scale factor must load through ``load_table`` with the column types the
engine assumes — if a regeneration changes a schema again, THIS fails
first with a readable diff instead of 15 opaque AnalysisExceptions."""

from __future__ import annotations

import os

import pytest

from sec_financial_pipeline_spark.schemas import TESTDATA_TABLES
from sec_financial_pipeline_spark.sources.testdata import load_table

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

#: Column -> Spark typeName the engine's queries rely on, post-load.
EXPECTED = {
    "events": {"event_id": "long", "ts": "timestamp", "user_id": "long",
               "event_type": "string", "value": "double", "props": "string"},
    "documents": {"doc_id": "long", "text": "string", "lang": "string",
                  "source": "string"},
    "embeddings": {"vec_id": "long", "embedding": "array", "label": "integer"},
    "orders": {"o_orderkey": "long", "o_custkey": "long",
               "o_totalprice": "double"},
    "lineitem": {"l_orderkey": "long", "l_quantity": "double",
                 "l_extendedprice": "double"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(TESTDATA_TABLES))
def test_table_loads_with_expected_types(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    got = {f.name: f.dataType.typeName() for f in df.schema.fields}
    for col, typ in EXPECTED.get(table, {}).items():
        assert col in got, f"{sf_dir}/{table}: column {col} disappeared"
        assert got[col] == typ, (
            f"{sf_dir}/{table}.{col}: engine expects {typ}, parquet now "
            f"decodes as {got[col]} — a testdata regeneration changed the "
            f"wire format (see sources/testdata.py for the adaptation point)"
        )
    # every table must actually produce rows
    assert df.limit(1).count() == 1, f"{sf_dir}/{table}: empty"
