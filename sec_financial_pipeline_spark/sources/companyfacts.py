"""Nested companyfacts-JSON ingest (SURVEY §2.1 S1/S3, §3.2).

The reference walks the SEC ``companyfacts`` payload with a triple-nested
Python loop (``src/core/sec_client.py:196-252``: taxonomy -> concept ->
unit -> entries) building row objects one at a time. Spark-first, the
same flatten is a chain of ``explode`` over map columns — fully
declarative, so it parallelizes per input file and stays in the JVM.

Payload shape (FIXTURES.md §B3):

    {"cik": 320193, "entityName": "...",
     "facts": {"us-gaap": {"<Tag>": {"label": ..., "description": ...,
        "units": {"USD": [{"val": ..., "start": ..., "end": ...,
                           "fy": ..., "fp": ..., "form": ..., "frame": ...},
                          ...]}}}}}

The JSON is schema-on-read with *dynamic keys* (taxonomy, tag, unit), so
the scan schema uses ``MapType`` at those levels and ``explode`` turns
keys into rows. Malformed dates parse to NULL (tolerant path,
``sec_client.py:254-262``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: One fact entry as it appears in the JSON `units` arrays.
ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("val", T.DoubleType(), True),
        T.StructField("start", T.StringType(), True),
        T.StructField("end", T.StringType(), True),
        T.StructField("instant", T.StringType(), True),
        T.StructField("fy", T.IntegerType(), True),
        T.StructField("fp", T.StringType(), True),
        T.StructField("form", T.StringType(), True),
        T.StructField("frame", T.StringType(), True),
    ]
)

CONCEPT_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField(
            "units", T.MapType(T.StringType(), T.ArrayType(ENTRY_SCHEMA)), True
        ),
    ]
)

COMPANYFACTS_SCHEMA = T.StructType(
    [
        T.StructField("cik", T.LongType(), True),
        T.StructField("entityName", T.StringType(), True),
        T.StructField(
            "facts",
            T.MapType(T.StringType(), T.MapType(T.StringType(), CONCEPT_SCHEMA)),
            True,
        ),
    ]
)

#: form string -> canonical filing type (reference sec_client.py:264-275;
#: unmapped forms stay NULL there — we preserve the raw form and add the
#: canonical tag alongside).
_FORM_CANON = {"10-K": "10-K", "10-K/A": "10-K", "10-Q": "10-Q", "10-Q/A": "10-Q", "8-K": "8-K"}


def read_companyfacts_json(spark: SparkSession, path: str) -> DataFrame:
    """Read one-or-many companyfacts JSON files (multiline) with the
    explicit schema — no inference pass over 100 TB of JSON."""
    return spark.read.schema(COMPANYFACTS_SCHEMA).option("multiLine", True).json(path)


def flatten_companyfacts(raw: DataFrame, ticker_dim: DataFrame | None = None) -> DataFrame:
    """Triple explode: taxonomy map -> tag map -> unit map -> entry array,
    projecting the canonical FACTS_SCHEMA columns (§1.1).

    ``ticker_dim`` (cik, ticker) is broadcast-joined when provided
    (reference resolves ticker via the downloaded mapping, J1).
    """
    tax = raw.select(
        F.col("cik"),
        F.col("entityName"),
        F.explode("facts").alias("taxonomy", "concepts"),
    )
    tags = tax.select(
        "cik",
        "entityName",
        "taxonomy",
        F.explode("concepts").alias("tag", "concept"),
    )
    units = tags.select(
        "cik",
        "entityName",
        "taxonomy",
        "tag",
        F.col("concept.label").alias("label"),
        F.col("concept.description").alias("description"),
        F.explode("concept.units").alias("unit", "entries"),
    )
    entries = units.select(
        "cik",
        "entityName",
        "taxonomy",
        "tag",
        "label",
        "description",
        "unit",
        F.explode("entries").alias("e"),
    )
    form_canon = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _FORM_CANON.items() for x in kv]
        ),
        F.col("e.form"),
    )
    facts = entries.select(
        F.lpad(F.col("cik").cast("string"), 10, "0").alias("cik"),
        F.col("entityName").alias("entity_name"),
        "taxonomy",
        "tag",
        "label",
        "description",
        F.col("e.val").alias("value"),
        "unit",
        # try_to_date: malformed date strings become NULL instead of
        # failing the job under ANSI mode (tolerant-parse path,
        # reference sec_client.py:254-262).
        F.try_to_date("e.start").alias("start_date"),
        F.try_to_date("e.end").alias("end_date"),
        F.try_to_date("e.instant").alias("instant_date"),
        F.col("e.form").alias("form"),
        form_canon.alias("form_type"),
        F.col("e.fy").alias("fiscal_year"),
        F.col("e.fp").alias("fiscal_period"),
        F.col("e.frame").alias("frame"),
    )
    if ticker_dim is not None:
        facts = facts.join(
            F.broadcast(ticker_dim.select("cik", "ticker")), "cik", "left"
        )
    return facts
