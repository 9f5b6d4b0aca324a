"""Incremental-batch ETL (SURVEY §2.7 T1-T4): freshness watermarks,
change detection, merge, full refresh.

The reference's incremental pipeline (``src/etl/pipeline.py``) keeps a
JSON ledger of per-ticker freshness and re-fetches on a tiered staleness
policy. The Spark-native equivalents here are pure DataFrame transforms
over the stored facts + a candidate batch, so they run as one job each:

- **freshness** (T1): per-entity watermark = max observation date +
  covered-period set, straight off the stored table (no side ledger —
  the data is the ledger).
- **staleness policy** (T1): tiered re-fetch cadence as a column
  expression (daily < 30d after latest filing, 3-day < 90d, weekly
  else — ``pipeline.py:222-251``).
- **change detection** (T2): md5 content-hash anti-join — only rows
  whose (key, content) pair is unseen survive (``sec_client.py:315-318``
  computes the same md5-of-content idea per company).
- **merge** (T2/T4): upsert = delete-matching-keys + union, the
  Delta-MERGE shape emulated with an anti-join (no Delta jars in this
  environment; the call site is a one-line swap for ``MERGE INTO``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Canonical identity of one fact observation (reference dedupes
#: restatements *after* load; ingest identity excludes value).
FACT_KEY = ("cik", "taxonomy", "tag", "unit", "fiscal_year", "fiscal_period", "end_date", "instant_date")


def content_hash(df: DataFrame, cols: Sequence[str]) -> Column:
    """md5 over the canonical string form of ``cols`` (T2)."""
    return F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    )


def detect_changes(
    stored: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str] = FACT_KEY,
    value_cols: Sequence[str] = ("value",),
) -> DataFrame:
    """T2 — rows of ``batch`` that are new or changed vs ``stored``.

    One left-anti join on (key-hash, content-hash): map-side hashing,
    single shuffle, no full-row comparison network traffic at scale.

    r14 shuffle-byte diet (guide §2.3): the join key is the RAW md5
    (``unhex`` — 16 bytes) instead of the 32-char hex string (hex is
    injective, so the anti-join result is bit-identical), and the
    stored side is NOT ``.distinct()``-ed first — a left-anti join is
    an existence test, so duplicate hashes on the build side cannot
    change the result, while the aggregate cost a full hash build on
    both sides of its exchange for zero byte savings (content hashes
    are near-unique by construction).
    """
    all_cols = list(key_cols) + list(value_cols)
    b = batch.withColumn("__h", F.unhex(content_hash(batch, all_cols)))
    s = stored.select(F.unhex(content_hash(stored, all_cols)).alias("__h"))
    # shuffled-hash over sort-merge (guide §3.1): the build side is the
    # 16-byte hash column only, so the per-partition hash table is tiny
    # and stays bounded at scale (partition count grows with the data);
    # skipping both sides' sorts is pure win for an existence probe.
    return b.join(s.hint("shuffle_hash"), "__h", "left_anti").drop("__h")


def merge_upsert(
    stored: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str] = FACT_KEY,
) -> DataFrame:
    """T2/T4 — upsert ``changes`` into ``stored`` by key: stored rows
    whose key appears in the change set are replaced (anti-join + union
    — the MERGE INTO shape without Delta).

    The key side is deliberately NOT ``.distinct()``-ed (r14): the
    anti-join tests existence, so duplicate change keys cannot alter
    which stored rows are kept, and the aggregate added a full
    hash-build stage per call; when change batches DO carry heavy key
    duplication at scale, the exchange's map-side partial aggregation
    is re-enabled by distinct-ing at the call site."""
    keys = changes.select(*key_cols)
    # shuffled-hash build over the narrow key projection (guide §3.1):
    # bounded per partition at scale, and the wide stored side skips
    # its sort entirely.
    kept = stored.join(keys.hint("shuffle_hash"), list(key_cols), "left_anti")
    return kept.unionByName(changes.select(*stored.columns))


def freshness(
    stored: DataFrame,
    entity_col: str = "cik",
    date_cols: Sequence[str] = ("end_date", "instant_date"),
) -> DataFrame:
    """T1 — per-entity freshness watermark (``data_manager.py:304-331``)."""
    latest = F.max(F.coalesce(*[F.col(c) for c in date_cols]))
    return stored.groupBy(entity_col).agg(
        latest.alias("last_filing_date"),
        F.count(F.lit(1)).alias("n_facts"),
        F.countDistinct("fiscal_year").alias("n_years"),
    )


def staleness_policy(
    fresh: DataFrame,
    as_of: str,
    last_checked_col: str = "last_filing_date",
) -> DataFrame:
    """T1 — tiered re-fetch policy (``pipeline.py:222-251``): entities
    filed <30d ago re-check daily, <90d every 3 days, else weekly.
    Returns the input plus ``check_interval_days`` and ``needs_update``.
    """
    age = F.datediff(F.lit(as_of).cast("date"), F.col(last_checked_col))
    interval = (
        F.when(age < 30, 1).when(age < 90, 3).otherwise(7)
    )
    return fresh.select(
        "*",
        interval.alias("check_interval_days"),
        (age >= interval).alias("needs_update"),
    )
