"""sec_financial_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference ``jasonwu001t/sec-financial-pipeline``
(SEC EDGAR financial-data ETL + query/analytics service). See SURVEY.md
for the full operator inventory this package implements.

Layout
------
- ``session``    : SparkSession factory tuned for the target environment.
- ``schemas``    : canonical StructTypes (facts, companies, test tables).
- ``sources``    : readers/writers — parquet scan/sink, nested-JSON
                   companyfacts explode ingest, ticker-dim normalization.
- ``operators``  : composable DataFrame -> DataFrame transforms — filters,
                   joins, aggregation/dedup policies, window/time-series,
                   text analytics, near-dup (MinHash/SimHash), similarity
                   search, multimodal column plumbing.
- ``functions``  : scalar helpers + deterministic-aggregation utilities
                   (decimal-summation so results are bit-stable across
                   partitionings and engines — required for oracle parity).
- ``plans``      : end-to-end query plans mirroring the reference's entry
                   points (metric series, statements, ratios, trends,
                   comparisons).
- ``streaming``  : Structured Streaming / incremental-batch analogs
                   (watermarked windowed aggs, CDC-style merge).
"""

__version__ = "0.1.0"
