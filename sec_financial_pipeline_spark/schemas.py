"""Canonical schemas.

The atom of the reference system is the long-format XBRL *financial fact*
(reference: ``src/core/models.py:33-52``, parquet layout documented at
``README_PIPELINE.md:318-331``). We fix two reference defects by design:

- dates are real ``DateType`` columns (the reference stores ISO strings,
  ``src/etl/data_manager.py:137-140``);
- the schema is explicit (no inference) so a 100 TB scan never pays
  schema-merge costs and always gets column pruning.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Long-format financial fact table (reference models.py:33-52).
FACTS_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("cik", T.StringType(), True),
        T.StructField("taxonomy", T.StringType(), True),
        T.StructField("tag", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("start_date", T.DateType(), True),
        T.StructField("end_date", T.DateType(), True),
        T.StructField("instant_date", T.DateType(), True),
        T.StructField("form", T.StringType(), True),
        T.StructField("fiscal_year", T.IntegerType(), True),
        T.StructField("fiscal_period", T.StringType(), True),
        T.StructField("frame", T.StringType(), True),
    ]
)

#: Company dimension (reference models.py:55-74) — broadcast-joined.
COMPANIES_SCHEMA = T.StructType(
    [
        T.StructField("cik", T.StringType(), False),
        T.StructField("ticker", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("industry", T.StringType(), True),
        T.StructField("sector", T.StringType(), True),
        T.StructField("exchange", T.StringType(), True),
    ]
)

#: Metric alias map — the semantic layer (reference main.py:32-145):
#: friendly metric name -> ordered candidate XBRL tags (priority 0 first).
ALIAS_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("tag", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

#: Driver-generated synthetic tables (see TESTDATA.md / FIXTURES.md §A).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
