"""Incremental-pipeline operators (SURVEY §2.7 T1/T2/T4) as oracle-checked
queries: change detection, merge-upsert, freshness + staleness policy.

The "stored" table is the derived facts; the "batch" is the same
derivation with a deterministic perturbation (amended values for a
subset of keys, plus rows only present in later years) — so the
anti-join / merge semantics are observable and exactly reproducible in
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.plans import domain
from sec_financial_pipeline_spark.registry.core import register
from sec_financial_pipeline_spark.streaming import incremental

_KEY = ("ticker", "tag", "unit", "fiscal_year", "fiscal_period", "end_date", "instant_date", "fact_id")
_VALUE = ("value", "form")

#: The perturbed re-fetch batch: facts for fiscal_year >= 1999 where 10%
#: of rows (fact_id % 10 = 4) carry a restated value.
_BATCH_SQL_SUFFIX = """
SELECT ticker, tag, unit, fiscal_year, fiscal_period, end_date, instant_date,
       fact_id,
       CASE WHEN fact_id % 10 = 4 THEN value * 1.01 ELSE value END AS value,
       form
FROM facts
WHERE fiscal_year >= 1999
"""

_STORED_COLS = "ticker, tag, unit, fiscal_year, fiscal_period, end_date, instant_date, fact_id, value, form"


def _stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain.facts_df(spark, sf_dir).select(*(_KEY + _VALUE)).select(
        "ticker", "tag", "unit", "fiscal_year", "fiscal_period",
        "end_date", "instant_date", "fact_id", "value", "form",
    )


def _batch_from(stored: DataFrame) -> DataFrame:
    return stored.filter(F.col("fiscal_year") >= 1999).withColumn(
        "value",
        F.when(F.col("fact_id") % 10 == 4, F.col("value") * 1.01).otherwise(
            F.col("value")
        ),
    )


def _batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _batch_from(_stored(spark, sf_dir))


@register(
    "pipe_incremental",
    domain.duck_prelude(
        f"stored AS (SELECT {_STORED_COLS} FROM facts)",
        f"batch AS ({_BATCH_SQL_SUFFIX})",
    )
    + f"""
SELECT 'changed' AS action, {', '.join('b.' + c for c in (_KEY + _VALUE))} FROM (
  SELECT *, md5(concat_ws(chr(31),
      CAST(ticker AS STRING), CAST(tag AS STRING), CAST(unit AS STRING),
      CAST(fiscal_year AS STRING), CAST(fiscal_period AS STRING),
      CAST(end_date AS STRING), CAST(instant_date AS STRING),
      CAST(fact_id AS STRING), CAST(value AS STRING), CAST(form AS STRING))) AS h
  FROM batch) b
WHERE b.h NOT IN (
  SELECT DISTINCT md5(concat_ws(chr(31),
      CAST(ticker AS STRING), CAST(tag AS STRING), CAST(unit AS STRING),
      CAST(fiscal_year AS STRING), CAST(fiscal_period AS STRING),
      CAST(end_date AS STRING), CAST(instant_date AS STRING),
      CAST(fact_id AS STRING), CAST(value AS STRING), CAST(form AS STRING)))
  FROM stored)
UNION ALL
SELECT 'merged' AS action, {_STORED_COLS} FROM stored
WHERE fact_id NOT IN (SELECT fact_id FROM batch)
UNION ALL
SELECT 'merged' AS action, {_STORED_COLS} FROM batch
""",
    survey="T2 T4 (md5 content-hash change detection via anti-join; merge-upsert replacing matched keys)",
)
def q_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deliberately NOT materialized: the stored table feeds four subtrees
    # (hash side, merge kept/keys, batch perturbation), but the derivation
    # is a codegen'd projection off one parquet scan — measured at sf0.1:
    # recompute 8.5s end-to-end vs persist() 12-15s vs localCheckpoint
    # 22s+. Caching 1.6M wide rows costs more than re-deriving them; the
    # sf-scaling story is the same (derivation is scan-bound, cache is
    # memory-bandwidth-bound on wider-than-input rows).
    stored = _stored(spark, sf_dir)
    batch = _batch_from(stored)
    changed = incremental.detect_changes(
        stored, batch, key_cols=_KEY, value_cols=_VALUE
    ).select(F.lit("changed").alias("action"), *(_KEY + _VALUE))
    # fact_id alone is the row identity in the derived model; the full
    # FACT_KEY composite is exercised by the change-detection branch.
    merged = incremental.merge_upsert(stored, batch, key_cols=("fact_id",)).select(
        F.lit("merged").alias("action"), *(_KEY + _VALUE)
    )
    return changed.unionByName(merged)


@register(
    "pipe_freshness_policy",
    domain.duck_prelude()
    + """
SELECT cik,
       last_filing_date,
       n_facts,
       n_years,
       CASE WHEN datediff('day', last_filing_date, DATE '2002-01-15') < 30 THEN 1
            WHEN datediff('day', last_filing_date, DATE '2002-01-15') < 90 THEN 3
            ELSE 7 END AS check_interval_days,
       datediff('day', last_filing_date, DATE '2002-01-15') >=
       CASE WHEN datediff('day', last_filing_date, DATE '2002-01-15') < 30 THEN 1
            WHEN datediff('day', last_filing_date, DATE '2002-01-15') < 90 THEN 3
            ELSE 7 END AS needs_update
FROM (
  SELECT cik,
         max(coalesce(end_date, instant_date)) AS last_filing_date,
         count(*) AS n_facts,
         CAST(count(DISTINCT fiscal_year) AS BIGINT) AS n_years
  FROM facts
  GROUP BY cik
)
""",
    survey="T1 (freshness watermark + tiered staleness policy)",
)
def q_freshness_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = domain.facts_df(spark, sf_dir)
    fresh = incremental.freshness(facts, entity_col="cik")
    return incremental.staleness_policy(fresh, as_of="2002-01-15")
