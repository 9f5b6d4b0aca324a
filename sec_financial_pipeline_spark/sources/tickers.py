"""Ticker-dimension ingest (SURVEY §2.1 S2).

The SEC publishes ``company_tickers.json`` in two wire formats
(reference ``src/core/sec_client.py:118-161``):

1. indexed dict: ``{"0": {"cik_str": 320193, "ticker": "AAPL",
   "title": "Apple Inc."}, ...}``
2. fields/data arrays: ``{"fields": ["cik", "ticker", "title"],
   "data": [[320193, "AAPL", "Apple Inc."], ...]}``

Both normalize to the broadcastable (cik, ticker, name) dimension with
the reference's canonicalization: 10-digit zero-padded CIK
(``models.py:64-69``), uppercased ticker (``models.py:71-74``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sec_financial_pipeline_spark.functions.scalar import cik_pad, norm_ticker

_ENTRY = T.StructType(
    [
        T.StructField("cik_str", T.LongType(), True),
        T.StructField("ticker", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
    ]
)

INDEXED_SCHEMA = T.MapType(T.StringType(), _ENTRY)

FIELDS_SCHEMA = T.StructType(
    [
        T.StructField("fields", T.ArrayType(T.StringType()), True),
        T.StructField("data", T.ArrayType(T.ArrayType(T.StringType())), True),
    ]
)


def _normalize(cik: F.Column, ticker: F.Column, title: F.Column) -> list:
    return [
        cik_pad(cik).alias("cik"),
        norm_ticker(ticker).alias("ticker"),
        title.alias("name"),
    ]


def read_tickers_indexed(spark: SparkSession, path: str) -> DataFrame:
    """Wire format 1: top-level object as a map keyed by row index."""
    # read as whole-file text then from_json: the payload's top level IS
    # the map, which spark.read.json would interpret as one column per
    # index key (unbounded schema).
    raw = spark.read.text(path, wholetext=True)
    parsed = raw.select(
        F.from_json(F.col("value"), INDEXED_SCHEMA).alias("m")
    ).filter(F.col("m").isNotNull())
    entries = parsed.select(F.explode("m").alias("idx", "e"))
    return entries.select(
        *_normalize(F.col("e.cik_str"), F.col("e.ticker"), F.col("e.title"))
    )


def read_tickers_fields(spark: SparkSession, path: str) -> DataFrame:
    """Wire format 2: parallel fields/data arrays."""
    raw = spark.read.schema(FIELDS_SCHEMA).option("multiLine", True).json(path)
    pos = raw.select(
        F.expr("array_position(fields, 'cik')").cast("int").alias("i_cik"),
        F.expr("array_position(fields, 'ticker')").cast("int").alias("i_ticker"),
        F.expr("array_position(fields, 'title')").cast("int").alias("i_title"),
        F.explode("data").alias("row"),
    )
    return pos.select(
        *_normalize(
            F.element_at("row", F.col("i_cik")).cast("long"),
            F.element_at("row", F.col("i_ticker")),
            F.element_at("row", F.col("i_title")),
        )
    )
