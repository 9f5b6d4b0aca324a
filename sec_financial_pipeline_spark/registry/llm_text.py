"""LLM-data-pipeline text operators on the `documents` table
(SURVEY §2.9 / north star): exact dedup, text statistics & quality
scoring, language-ID heuristic, document fingerprinting, token counting.

All built from JVM-side expressions (split / filter / aggregate on
arrays) — no Python in the hot path — so they scale linearly with
partitions and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.dedup import exact_dedup
from sec_financial_pipeline_spark.registry.core import register
from sec_financial_pipeline_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Exact dedup — normalize -> hash -> keep deterministic representative
# ---------------------------------------------------------------------------


@register(
    "doc_exact_dedup",
    """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
""",
    survey="§2.9 dedup-exact (hash-group, keep min doc_id)",
)
def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "text_hash", F.md5("text")
    )
    kept = exact_dedup(d, ["text_hash"], keep_min_of="doc_id")
    return kept.select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# Text statistics & quality score
# ---------------------------------------------------------------------------

_STOPWORDS = ("a", "the", "and", "of", "to", "in")
_SW_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "doc_text_stats",
    f"""
SELECT doc_id, lang,
       CAST(length(text) AS INT) AS len_chars,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_filter(string_split(text, ' '), w -> w IN ({_SW_LIST}))) AS INT) AS n_stopwords,
       round(CAST(len(list_filter(string_split(text, ' '), w -> w IN ({_SW_LIST}))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stopword_ratio,
       round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_token_len
FROM documents
""",
    survey="§2.9 text-analysis (token counts, stopword ratio, quality signals)",
)
def q_doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sw = F.filter(toks, lambda w: w.isin(*_STOPWORDS))
    n_tokens = F.size(toks)
    n_sw = F.size(sw)
    return d.select(
        "doc_id",
        "lang",
        F.length("text").alias("len_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        n_sw.cast("int").alias("n_stopwords"),
        F.round(n_sw.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(F.length("text").cast("double") / n_tokens, 6).alias(
            "avg_token_len"
        ),
    )


# ---------------------------------------------------------------------------
# Quality scoring + classification (length / repetition signals)
# ---------------------------------------------------------------------------


@register(
    "doc_quality_score",
    """
SELECT doc_id,
       round(len_norm * 0.5 + uniq_ratio * 0.5, 6) AS quality,
       CASE WHEN len_norm * 0.5 + uniq_ratio * 0.5 >= 0.55 THEN 'keep'
            ELSE 'filter' END AS verdict
FROM (
  SELECT doc_id,
         least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) AS len_norm,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS uniq_ratio
  FROM documents
)
""",
    survey="§2.9 quality-scoring (length + lexical-diversity composite)",
)
def q_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    len_norm = F.least(F.length("text").cast("double") / 400.0, F.lit(1.0))
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    score = len_norm * 0.5 + uniq_ratio * 0.5
    return d.select(
        "doc_id",
        F.round(score, 6).alias("quality"),
        F.when(score >= 0.55, "keep").otherwise("filter").alias("verdict"),
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic (marker-token votes)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("datos", "tabla", "consulta", "fila"),
    "de": ("daten", "tabelle", "abfrage", "zeile"),
    "fr": ("données", "table", "requête", "ligne"),
    "zh": ("数据", "表", "查询", "行"),
}


def _marker_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({words})))"


@register(
    "doc_lang_id",
    f"""
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN {_marker_sql('es')} > {_marker_sql('en')} THEN 'es'
            WHEN {_marker_sql('de')} > {_marker_sql('en')} THEN 'de'
            WHEN {_marker_sql('fr')} > {_marker_sql('en')} THEN 'fr'
            WHEN {_marker_sql('zh')} > {_marker_sql('en')} THEN 'zh'
            WHEN {_marker_sql('en')} > 0 THEN 'en'
            ELSE 'unknown' END AS predicted_lang
FROM documents
""",
    survey="§2.9 language-ID (marker-token n-gram heuristic)",
)
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def votes(lang: str):
        return F.size(F.filter(toks, lambda w: w.isin(*_LANG_MARKERS[lang])))

    pred = (
        F.when(votes("es") > votes("en"), "es")
        .when(votes("de") > votes("en"), "de")
        .when(votes("fr") > votes("en"), "fr")
        .when(votes("zh") > votes("en"), "zh")
        .when(votes("en") > 0, "en")
        .otherwise("unknown")
    )
    return d.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    )


# ---------------------------------------------------------------------------
# Document fingerprint (normalized content hash)
# ---------------------------------------------------------------------------


@register(
    "doc_fingerprint",
    """
SELECT doc_id,
       md5(lower(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) AS fingerprint
FROM documents
""",
    survey="§2.9 fingerprinting (normalized md5 content fingerprint)",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace("text", "[^a-z0-9 ]", ""))
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))
