"""LLM-data-pipeline text operators on the `documents` table
(SURVEY §2.9 / north star): exact dedup plus the per-document profile —
text statistics, quality scoring, language-ID heuristic, fingerprinting,
and regex (BPE-ish) token counting — computed in ONE scan.

All built from JVM-side expressions (split / filter / aggregate on
arrays) — no Python in the hot path — so they scale linearly with
partitions and stay inside whole-stage codegen. Folding every
per-document feature into a single projection is the 100 TB shape: one
pass over the corpus emits the full feature row, instead of N feature
jobs re-reading N x the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.dedup import exact_dedup
from sec_financial_pipeline_spark.operators.similarity import token_shingles
from sec_financial_pipeline_spark.registry.core import register
from sec_financial_pipeline_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Exact dedup — normalize -> hash -> keep deterministic representative
# ---------------------------------------------------------------------------


_EXACT_ORACLE = """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
"""


def q_doc_exact_dedup_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "text_hash", F.md5("text")
    )
    kept = exact_dedup(d, ["text_hash"], keep_min_of="doc_id")
    return kept.select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# Corpus-level boilerplate removal (CCNet/Gopher line dedup; VERDICT r7
# item 3): lines recurring across >= _BOILER_MIN_DOCS documents are
# dropped and the text reassembled in line order. The synthetic corpus
# has no newline structure, so "lines" are non-overlapping
# _BOILER_LINE_W-token segments (the operator's real-corpus path splits
# on \n — operators/dedup.py::line_table). Output is per-document:
# counts plus the md5 fingerprint of the reassembled text, which pins
# the reassembly order deterministically against the oracle's
# string_agg(... ORDER BY line_no).
# ---------------------------------------------------------------------------

_BOILER_LINE_W = 3  # tokens per segment (sf0.01: 7460 distinct lines)
_BOILER_MIN_DOCS = 3  # a line in >= 3 docs is boilerplate (231 at sf0.01)

_BOILER_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
lines AS (
  SELECT doc_id, i - 1 AS line_no,
         array_to_string(w[(i-1)*{_BOILER_LINE_W}+1 : least(i*{_BOILER_LINE_W}, len(w))], ' ') AS line
  FROM toks,
  LATERAL (SELECT unnest(generate_series(1,
             CAST(ceil(len(w) / {_BOILER_LINE_W}.0) AS BIGINT))) AS i)
),
freq AS (SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line),
boiler AS (SELECT line FROM freq WHERE nd >= {_BOILER_MIN_DOCS}),
kept AS (
  SELECT l.* FROM lines l WHERE l.line NOT IN (SELECT line FROM boiler)
),
clean AS (
  SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
nl AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT d.doc_id,
       CAST(nl.n_lines AS BIGINT) AS n_lines,
       CAST(coalesce(c.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(length(coalesce(c.clean_text, '')) AS INT) AS clean_len,
       md5(coalesce(c.clean_text, '')) AS clean_fp
FROM documents d
JOIN nl ON nl.doc_id = d.doc_id
LEFT JOIN clean c ON c.doc_id = d.doc_id
"""


def q_doc_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.dedup import (
        drop_boilerplate_lines,
        reassemble_lines,
        token_segment_lines,
    )

    d = load_table(spark, sf_dir, "documents")
    lines = token_segment_lines(d, "doc_id", "text", _BOILER_LINE_W)
    kept = drop_boilerplate_lines(lines, "doc_id", _BOILER_MIN_DOCS)
    clean = reassemble_lines(kept, "doc_id", sep=" ")
    n_lines = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        d.select("doc_id")
        .join(n_lines, "doc_id")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.length(F.coalesce(F.col("clean_text"), F.lit("")))
            .cast("int")
            .alias("clean_len"),
            F.md5(F.coalesce(F.col("clean_text"), F.lit(""))).alias("clean_fp"),
        )
    )


_DEDUP_ROW_SCHEMA = [
    ("doc_id", "bigint"),
    ("lang", "string"),
    ("source", "string"),
    ("n_chars", "bigint"),
    ("n_lines", "bigint"),
    ("n_kept", "bigint"),
    ("clean_len", "int"),
    ("clean_fp", "string"),
    ("ppl_milli", "bigint"),
    ("n_bigrams", "bigint"),
    ("avg_milli", "bigint"),
    ("ppl_bucket", "string"),
    ("total_tokens", "bigint"),
    ("dup_tokens", "bigint"),
    ("n_spans", "bigint"),
]

# ---------------------------------------------------------------------------
# spandup: exact-substring duplicate spans (Lee et al. 2021) — cross-
# document 10-token grams merged to maximal spans by the islands pass
# (operators/spans.py). Positions are unique per document, so the
# running-max window ordering is total and the coverage/span counts
# are exact integers on both engines.
# ---------------------------------------------------------------------------

_SPAN_W = 10
_SPAN_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id, i AS s, i + {_SPAN_W - 1} AS e,
         array_to_string(list_slice(t, i, i + {_SPAN_W - 1}), ' ') AS g,
         len(t) AS ntok
  FROM toks, LATERAL (
    SELECT unnest(range(1, greatest(len(t) - {_SPAN_W - 1}, 0) + 1)) AS i
  )
),
dupg AS (SELECT g FROM occ GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
iv AS (
  SELECT doc_id, ntok, s, e,
         coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pmax
  FROM occ WHERE g IN (SELECT g FROM dupg)
)
SELECT doc_id, CAST(any_value(ntok) AS BIGINT) AS total_tokens,
       CAST(SUM(greatest(0, e - greatest(s, pmax + 1) + 1)) AS BIGINT)
         AS dup_tokens,
       CAST(SUM(CASE WHEN s > pmax THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
FROM iv GROUP BY doc_id
"""


def q_doc_spandup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.spans import (
        duplicate_span_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    return duplicate_span_stats(d, "doc_id", "text", width=_SPAN_W)

# ---------------------------------------------------------------------------
# ppl: CCNet-style LM perplexity filter (Wenzek et al. 2020) — a
# Laplace-smoothed bigram LM trained on the en subset scores EVERY
# document's bigram stream; per-bigram negative log-likelihood
# ln(c1+V) - ln(c2+1) is quantized to integer milli-nats (the same
# JVM-vs-libm ln firewall as DSIR) so the per-doc total and the
# integer per-bigram average are exact BIGINT on both engines, then
# head/middle/tail bucketing on fixed thresholds.
# ---------------------------------------------------------------------------

_PPL_GOOD = 3400
_PPL_MID = 3500

_PPL_ORACLE = f"""
WITH train_toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents WHERE lang = 'en'
),
uni AS (SELECT w AS w1, count(*) AS c1 FROM train_toks GROUP BY w),
vv AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM train_toks),
doc_toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS bigram
  FROM doc_toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
train_grams AS (
  SELECT w[i] || ' ' || w[i+1] AS bigram
  FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE lang = 'en') t,
  LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
bi AS (SELECT bigram, count(*) AS c2 FROM train_grams GROUP BY bigram),
nll AS (
  SELECT doc_id,
         CAST(round((ln(coalesce(c1, 0) + v)
                     - ln(coalesce(c2, 0) + 1.0)) * 1000.0, 0) AS BIGINT) AS m
  FROM grams LEFT JOIN bi USING (bigram) LEFT JOIN uni USING (w1), vv
),
agg AS (
  SELECT doc_id, CAST(sum(m) AS BIGINT) AS ppl_milli,
         CAST(count(*) AS BIGINT) AS n_bigrams
  FROM nll GROUP BY doc_id
)
SELECT doc_id, ppl_milli, n_bigrams,
       CAST(ppl_milli // n_bigrams AS BIGINT) AS avg_milli,
       CASE WHEN ppl_milli // n_bigrams < {_PPL_GOOD} THEN 'head'
            WHEN ppl_milli // n_bigrams < {_PPL_MID} THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM agg
"""


def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.lm import score_documents

    d = load_table(spark, sf_dir, "documents")
    return score_documents(
        d, "doc_id", "text", d.filter(F.col("lang") == "en"),
        good=_PPL_GOOD, mid=_PPL_MID,
    ).withColumnRenamed("id", "doc_id")

from sec_financial_pipeline_spark.registry.merge import (  # noqa: E402
    union_sections as _union_sections,
    union_sections_sql as _union_sections_sql,
)


@register(
    "doc_exact_dedup",
    _union_sections_sql(
        [
            ("exact", _EXACT_ORACLE, ["doc_id", "lang", "source", "n_chars"]),
            (
                "boilerplate",
                _BOILER_ORACLE,
                ["doc_id", "n_lines", "n_kept", "clean_len", "clean_fp"],
            ),
            (
                "ppl",
                _PPL_ORACLE,
                ["doc_id", "ppl_milli", "n_bigrams", "avg_milli",
                 "ppl_bucket"],
            ),
            (
                "spandup",
                _SPAN_ORACLE,
                ["doc_id", "total_tokens", "dup_tokens", "n_spans"],
            ),
        ],
        _DEDUP_ROW_SCHEMA,
    ),
    survey=(
        "§2.9 dedup-exact (hash-group, keep min doc_id) + corpus-level"
        " boilerplate removal (CCNet/Gopher line dedup: explode to"
        " normalized lines, drop lines recurring in >= 3 docs,"
        " reassemble in line order — determinism pinned by the"
        " reassembled-text md5)"
        " + CCNet LM perplexity filter (Wenzek et al. 2020: Laplace"
        " bigram LM trained on the en subset, per-doc NLL in integer"
        " milli-nats — engine-exact — with head/middle/tail bucketing)"
        " + exact-substring duplicate spans (Lee et al. 2021: cross-doc"
        " 10-token grams merged to maximal spans via the islands pass;"
        " keep-first span REMOVAL with a fixed-point witness lives in"
        " operators/spans.py::remove_duplicate_spans)"
    ),
)
def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _union_sections(
        [
            ("exact", q_doc_exact_dedup_only(spark, sf_dir)),
            ("boilerplate", q_doc_boilerplate(spark, sf_dir)),
            ("ppl", q_doc_perplexity(spark, sf_dir)),
            ("spandup", q_doc_spandup(spark, sf_dir)),
        ],
        _DEDUP_ROW_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Per-document profile: stats + quality + lang-ID + fingerprint + tokens
# ---------------------------------------------------------------------------

_STOPWORDS = ("a", "the", "and", "of", "to", "in")
_SW_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)

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


#: Gopher/C4 rule battery (operators/quality_rules.py) — DuckDB twins.
#: The inner query exposes the shared signals; the outer derives the
#: six rule bits. Thresholds MUST mirror quality_rules constants.
_QR_REQUIRED_SQL = ", ".join(f"'{w}'" for w in ("the", "a", "and", "of", "to", "in"))

_PROFILE_ORACLE = rf"""
SELECT doc_id, lang, len_chars, n_tokens, n_stopwords, stopword_ratio,
       avg_token_len, quality, verdict, predicted_lang, fingerprint,
       n_bpe_tokens, n_word_tokens, n_number_tokens, dup_trigram_ratio,
       mean_word_len, short_word_ratio,
       CAST((CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 0 ELSE 1 END)
          + (CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 0 ELSE 1 END)
          + (CASE WHEN n_required >= 2 THEN 0 ELSE 1 END)
          + (CASE WHEN dup_trigram_ratio <= 0.30 THEN 0 ELSE 1 END)
          + (CASE WHEN short_word_ratio <= 0.40 THEN 0 ELSE 1 END)
          + (CASE WHEN longest_word <= 15 THEN 0 ELSE 1 END) AS INT)
         AS n_rule_violations,
       CAST(CASE WHEN n_tokens BETWEEN 50 AND 100000
                  AND mean_word_len BETWEEN 3.0 AND 10.0
                  AND n_required >= 2
                  AND dup_trigram_ratio <= 0.30
                  AND short_word_ratio <= 0.40
                  AND longest_word <= 15 THEN 1 ELSE 0 END AS INT)
         AS gopher_keep
FROM (
SELECT doc_id, lang,
       CAST(length(text) AS INT) AS len_chars,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_filter(string_split(text, ' '), w -> w IN ({_SW_LIST}))) AS INT) AS n_stopwords,
       round(CAST(len(list_filter(string_split(text, ' '), w -> w IN ({_SW_LIST}))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stopword_ratio,
       round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_token_len,
       round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
             + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) * 0.5, 6) AS quality,
       CASE WHEN least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
                 + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) * 0.5 >= 0.55 THEN 'keep'
            ELSE 'filter' END AS verdict,
       CASE WHEN {_marker_sql('es')} > {_marker_sql('en')} THEN 'es'
            WHEN {_marker_sql('de')} > {_marker_sql('en')} THEN 'de'
            WHEN {_marker_sql('fr')} > {_marker_sql('en')} THEN 'fr'
            WHEN {_marker_sql('zh')} > {_marker_sql('en')} THEN 'zh'
            WHEN {_marker_sql('en')} > 0 THEN 'en'
            ELSE 'unknown' END AS predicted_lang,
       md5(lower(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) AS fingerprint,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_word_tokens,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_number_tokens,
       round(CASE WHEN len(w) >= 3 THEN
         1.0 - CAST(len(list_distinct(list_transform(
                 generate_series(1, len(w) - 2),
                 i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS DOUBLE)
               / (len(w) - 2)
         ELSE 0.0 END, 6) AS dup_trigram_ratio,
       round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
             / len(w), 6) AS mean_word_len,
       round(CAST(len(list_filter(w, x -> length(x) <= 2)) AS DOUBLE)
             / len(w), 6) AS short_word_ratio,
       len(list_distinct(list_filter(w, x -> x IN ({_QR_REQUIRED_SQL}))))
         AS n_required,
       list_max(list_transform(w, x -> length(x))) AS longest_word
FROM (SELECT *, string_split(text, ' ') AS w FROM documents) t
)
"""


@register(
    "doc_profile",
    _PROFILE_ORACLE,
    survey="§2.9 text-analysis + quality-scoring + language-ID + fingerprinting + token-counting + repetition scoring + Gopher/C4 heuristic rule battery (single-scan per-doc feature row; word-count/mean-word-length/required-stopword/repetition/short-token/long-token rules with per-doc violation count and keep verdict — operators/quality_rules.py)",
)
def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.sources.testdata import spread_scan

    # r14 (guide §2.5): this query is a pure per-row feature map — no
    # downstream exchange at all — so over a single-split scan the WHOLE
    # rule battery ran as one serial task. Spreading the scan is the
    # only way to parallelize it, and the one exchange it adds carries
    # the raw text once (a no-op on real multi-file inputs).
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    # Hoist the token split into its own projection: split() is not a
    # "cheap" expression, so CollapseProject keeps the two selects
    # separate and every downstream feature reads the materialized
    # array instead of re-splitting the text (the language-vote chain
    # alone references the tokens ~9 times).
    base = d.select(
        "doc_id",
        "lang",
        "text",
        F.split(F.col("text"), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    sw = F.filter(toks, lambda w: w.isin(*_STOPWORDS))
    n_tokens = F.size(toks)
    n_sw = F.size(sw)
    len_norm = F.least(F.length("text").cast("double") / 400.0, F.lit(1.0))
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    score = len_norm * 0.5 + uniq_ratio * 0.5

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
    normalized = F.lower(F.regexp_replace("text", "[^a-z0-9 ]", ""))
    # Gopher-style internal-repetition signal (Rae et al. 2021 §A1.1):
    # fraction of the doc's trigrams that are repeats of an earlier one.
    # Trigrams come from the zip_with shift-chain (token_shingles), NOT
    # transform(sequence)+try_element_at: expressions referenced inside
    # an HOF lambda are re-evaluated per element, so the index form is
    # O(tokens^2) per document — the exact trap shingles() documents.
    tri = token_shingles(toks, k=3, distinct=False)
    # the rounded repetition signal feeds BOTH the output column and the
    # Gopher repetition rule, so the two can never diverge
    dup_tri = (
        F.when(
            n_tokens >= 3,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(tri)).cast("double") / F.size(tri),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
    )
    from sec_financial_pipeline_spark.operators.quality_rules import (
        mean_word_len,
        short_word_ratio,
        violations_and_keep,
    )

    viol, keep = violations_and_keep(toks, dup_tri)
    return base.select(
        "doc_id",
        "lang",
        F.length("text").alias("len_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        n_sw.cast("int").alias("n_stopwords"),
        F.round(n_sw.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(F.length("text").cast("double") / n_tokens, 6).alias(
            "avg_token_len"
        ),
        F.round(score, 6).alias("quality"),
        F.when(score >= 0.55, "keep").otherwise("filter").alias("verdict"),
        pred.alias("predicted_lang"),
        F.md5(normalized).alias("fingerprint"),
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("int")
        .alias("n_bpe_tokens"),
        F.regexp_count("text", F.lit("[a-z]+")).cast("int").alias("n_word_tokens"),
        F.regexp_count("text", F.lit("[0-9]+")).cast("int").alias("n_number_tokens"),
        dup_tri.alias("dup_trigram_ratio"),
        F.round(mean_word_len(toks), 6).alias("mean_word_len"),
        F.round(short_word_ratio(toks), 6).alias("short_word_ratio"),
        viol,
        keep,
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling — the corpus-mixing primitive
# (operators/sampling.py). The keep decision is a content-hash filter,
# so the SAME documents are kept on any engine / partitioning / run;
# the per-language rate table is the mixing-weights config.
# ---------------------------------------------------------------------------

_MIX_RATES = {"en": 0.5, "zh": 0.3, "de": 0.2}  # others -> default 0.1
_MIX_DEFAULT = 0.1
_MIX_SALT = "mix1"

#: oversampling half of corpus mixing: rates may exceed 1 (repeat the
#: curated stratum, thin the crawl); expected multiplicity == rate
_UP_RATES = {"en": 2.5, "zh": 1.25}  # others -> 0.5
_UP_DEFAULT = 0.5
_UP_SALT = "up1"

#: deterministic epoch shuffle (dataloader ordering): shard count + seed
_SHUF_SHARDS = 8
_SHUF_SEED = "epoch1"

_MIX_ORACLE = f"""
WITH rates AS (
  SELECT * FROM (VALUES {", ".join(f"('{k}', {v})" for k, v in _MIX_RATES.items())})
  AS r(lang, rate)
),
scored AS (
  SELECT d.doc_id, d.lang, d.source,
         ('0x' || substr(md5('{_MIX_SALT}' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u,
         coalesce(CAST(r.rate AS DOUBLE), {_MIX_DEFAULT}) AS rate
  FROM documents d LEFT JOIN rates r ON d.lang = r.lang
),
uprates AS (
  SELECT * FROM (VALUES {", ".join(f"('{k}', {v})" for k, v in _UP_RATES.items())})
  AS r(lang, rate)
),
upscored AS (
  SELECT d.lang,
         ('0x' || substr(md5('{_UP_SALT}' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u,
         coalesce(CAST(ur.rate AS DOUBLE), {_UP_DEFAULT}) AS r
  FROM documents d LEFT JOIN uprates ur ON d.lang = ur.lang
),
upagg AS (
  SELECT lang,
         CAST(sum(CAST(floor(r) AS BIGINT)
                  + CASE WHEN u < r - floor(r) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_upsampled,
         round(max(r), 6) AS up_rate
  FROM upscored GROUP BY lang
)
SELECT s.lang, s.n_kept, s.rate, u.n_upsampled, u.up_rate
FROM (
  SELECT lang, count(*) AS n_kept, round(max(rate), 6) AS rate
  FROM scored WHERE u < rate GROUP BY lang
) s JOIN upagg u ON s.lang = u.lang
"""

# Epoch-shuffle section oracle: the same md5-derived shard + per-shard
# rank the Spark operator computes; checksum = sum(doc_id * pos) pins
# the full within-shard permutation, first_doc pins its head. The sum
# is cast to BIGINT (DuckDB sums BIGINT into HUGEINT, which the
# oracle-type lint bans).
_SHUF_ORACLE = f"""
WITH h AS (
  SELECT doc_id, md5('{_SHUF_SEED}' || CAST(doc_id AS VARCHAR)) AS hh
  FROM documents
),
sharded AS (
  SELECT doc_id, hh,
         ('0x' || substr(hh, 1, 8))::BIGINT % {_SHUF_SHARDS} AS shard
  FROM h
),
ordered AS (
  SELECT shard, doc_id,
         row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS pos
  FROM sharded
)
SELECT shard, count(*) AS n_docs,
       CAST(max(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS first_doc,
       CAST(sum(doc_id * pos) AS BIGINT) AS checksum
FROM ordered GROUP BY shard
"""

_SAMPLE_SCHEMA = [
    ("lang", "string"),
    ("n_kept", "bigint"),
    ("rate", "double"),
    ("n_upsampled", "bigint"),
    ("up_rate", "double"),
    ("shard", "bigint"),
    ("n_docs", "bigint"),
    ("first_doc", "bigint"),
    ("checksum", "bigint"),
    ("threshold", "bigint"),
    ("n_selected", "bigint"),
]

#: temperature mixture (Conneau & Lample 2019 resampling): alpha + salt
_TEMP_ALPHA = 0.7
_TEMP_SALT = "temp1"

_TEMP_ORACLE = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(sum(n_docs) AS DOUBLE) AS total,
         sum(pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA})) AS S
  FROM counts
),
th AS (
  SELECT lang, n_docs,
         CAST(floor(4294967296.0 * total
                    * pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA} - 1.0) / S)
              AS BIGINT) AS threshold
  FROM counts, tot
),
sel AS (
  SELECT d.lang, th.threshold, th.n_docs,
         (th.threshold // 4294967296)
         + CASE WHEN ('0x' || substr(md5('{_TEMP_SALT}' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                     < th.threshold % 4294967296
                THEN 1 ELSE 0 END AS copies
  FROM documents d JOIN th ON d.lang = th.lang
)
SELECT lang, CAST(max(n_docs) AS BIGINT) AS n_docs,
       CAST(max(threshold) AS BIGINT) AS threshold,
       CAST(sum(copies) AS BIGINT) AS n_selected
FROM sel GROUP BY lang
"""


def q_doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.sampling import (
        temperature_mixture,
        temperature_mixture_thresholds,
    )

    d = load_table(spark, sf_dir, "documents")
    # one thresholds build, shared by the report columns and the
    # selection (localCheckpoint: the tiny table would otherwise
    # recompute its corpus count in both branches)
    th = temperature_mixture_thresholds(d, "lang", _TEMP_ALPHA).localCheckpoint(
        eager=True
    )
    picked = temperature_mixture(
        d, key="doc_id", stratum="lang", alpha=_TEMP_ALPHA, salt=_TEMP_SALT,
        thresholds=th,
    )
    sel = picked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected")
    )
    return th.join(sel, "lang", "left").select(
        "lang",
        F.col("n_docs").cast("bigint"),
        F.col("threshold").cast("bigint"),
        F.coalesce(F.col("n_selected"), F.lit(0)).cast("bigint")
        .alias("n_selected"),
    )

from sec_financial_pipeline_spark.registry.merge import (  # noqa: E402
    union_sections,
    union_sections_sql,
)


# ---------------------------------------------------------------------------
# dsir: DSIR-style importance resampling (Xie et al. 2023) — select the
# raw-pool (non-en) documents whose hashed unigram+bigram distribution
# is most en-like, via integer milli-nat log-ratio weights and Gumbel
# top-k. Every post-ln quantity is BIGINT (the float-determinism
# firewall: JVM vs libm ln differ by 1 ulp on ~1% of inputs, measured);
# the oracle replays the identical milli-nat pipeline in SQL. Output is
# the per-lang rollup of the SELECTED set: count, sum of doc_ids
# (checksum — pins the exact selection), sum of selection keys
# (threshold column reused as the key-sum).
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 512
_DSIR_RATE = 0.25
_DSIR_SALT = "dsir1"

_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, lang, unnest(w) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {_DSIR_BUCKETS} AS bucket
  FROM grams
),
tc AS (SELECT bucket, count(*) AS nt FROM b WHERE lang = 'en' GROUP BY bucket),
rc AS (SELECT bucket, count(*) AS nr FROM b WHERE lang <> 'en' GROUP BY bucket),
tot AS (SELECT (SELECT CAST(coalesce(sum(nt), 0) AS DOUBLE) FROM tc) AS t_tot,
               (SELECT CAST(coalesce(sum(nr), 0) AS DOUBLE) FROM rc) AS r_tot),
wt AS (
  SELECT rc.bucket,
         CAST(round((ln(coalesce(nt, 0) + 1.0) - ln(nr + 1.0)
                     - ln(t_tot + {_DSIR_BUCKETS})
                     + ln(r_tot + {_DSIR_BUCKETS})) * 1000.0, 0) AS BIGINT)
           AS w_milli
  FROM rc LEFT JOIN tc USING (bucket), tot
),
dbc AS (
  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM b WHERE lang <> 'en' GROUP BY doc_id, bucket
),
score AS (
  SELECT doc_id, sum(cnt * w_milli) AS score_milli
  FROM dbc JOIN wt USING (bucket) GROUP BY doc_id
),
keyed AS (
  SELECT doc_id,
         score_milli
         + CAST(round((-ln(-ln((('0x' || substr(md5('{_DSIR_SALT}'
             || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
             / 4294967296.0))) * 1000.0, 0) AS BIGINT) AS key_milli
  FROM score
),
ranked AS (
  SELECT doc_id, key_milli,
         row_number() OVER (ORDER BY key_milli DESC, doc_id) AS rk
  FROM keyed
),
sel AS (
  SELECT r.doc_id, r.key_milli FROM ranked r
  WHERE r.rk <= (SELECT CAST(floor(count(*) * {_DSIR_RATE}) AS BIGINT)
                 FROM documents WHERE lang <> 'en')
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.doc_id) AS BIGINT) AS checksum,
       CAST(sum(s.key_milli) AS BIGINT) AS threshold
FROM sel s JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


# ---------------------------------------------------------------------------
# drift: per-lang Population Stability Index between the corpus' even
# and odd doc_id halves over the hashed unigram+bigram bucket space —
# the standing distribution-drift monitor (snapshot A vs snapshot B) in
# integer micro-units (IEEE division is exactly specified; ln terms are
# quantized once — the same firewall as dsir/ppl).
# ---------------------------------------------------------------------------

_DRIFT_BUCKETS = 256

_DRIFT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, doc_id % 2 AS half, string_split(text, ' ') AS w
  FROM documents
),
grams AS (
  SELECT lang, half, unnest(w) AS g FROM toks
  UNION ALL
  SELECT lang, half, w[i] || ' ' || w[i+1] AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
bkt AS (
  SELECT lang, half,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {_DRIFT_BUCKETS} AS bucket,
         count(*) AS c
  FROM grams GROUP BY 1, 2, 3
),
tot AS (
  SELECT lang, half, CAST(sum(c) AS DOUBLE) AS t FROM bkt GROUP BY 1, 2
),
langs AS (SELECT DISTINCT lang FROM documents),
tots AS (
  SELECT l.lang,
         coalesce((SELECT t FROM tot WHERE tot.lang = l.lang AND half = 0), 0)
           + {_DRIFT_BUCKETS} AS ta,
         coalesce((SELECT t FROM tot WHERE tot.lang = l.lang AND half = 1), 0)
           + {_DRIFT_BUCKETS} AS tb
  FROM langs l
),
pair AS (
  SELECT coalesce(x.lang, y.lang) AS lang,
         coalesce(x.bucket, y.bucket) AS bucket,
         coalesce(x.c, 0) AS ca, coalesce(y.c, 0) AS cb
  FROM (SELECT lang, bucket, c FROM bkt WHERE half = 0) x
  FULL JOIN (SELECT lang, bucket, c FROM bkt WHERE half = 1) y
    ON x.lang = y.lang AND x.bucket = y.bucket
),
terms AS (
  SELECT p.lang,
         CAST(round((((ca + 1.0) / ta - (cb + 1.0) / tb)
                     * (ln(ca + 1.0) - ln(cb + 1.0) - ln(ta) + ln(tb)))
                    * 1000000.0, 0) AS BIGINT) AS m
  FROM pair p JOIN tots ON tots.lang = p.lang
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(m) AS BIGINT) AS threshold
FROM terms GROUP BY lang
"""


# ---------------------------------------------------------------------------
# unimax: UniMax language-balanced sampling with per-language epoch
# caps (Chung et al. 2023) — spread a one-epoch character budget as
# uniformly as possible across languages, clipping each at
# _UNIMAX_EPOCHS epochs of its own data; leftover re-spreads to the
# head language. The allocation loop is pure integer arithmetic over
# one bounded per-language count row (replayed in SQL as a recursive
# CTE); the partial pass is a deterministic hash-ordered prefix.
# ---------------------------------------------------------------------------

_UNIMAX_EPOCHS = 1.2
_UNIMAX_SALT = "umax1"

_UNIMAX_ORACLE = f"""
WITH RECURSIVE caps AS (
  SELECT lang, cap, row_number() OVER (ORDER BY cap, lang) AS i,
         count(*) OVER () AS L
  FROM (SELECT lang,
               CAST(floor({_UNIMAX_EPOCHS} * CAST(sum(n_chars) AS BIGINT))
                    AS BIGINT) AS cap
        FROM documents GROUP BY lang)
),
alloc AS (
  SELECT 0 AS i, CAST(NULL AS VARCHAR) AS lang, CAST(0 AS BIGINT) AS quota,
         (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS remaining
  UNION ALL
  SELECT c.i, c.lang,
         least(c.cap, a.remaining // (c.L - c.i + 1)),
         a.remaining - least(c.cap, a.remaining // (c.L - c.i + 1))
  FROM alloc a JOIN caps c ON c.i = a.i + 1
),
tot AS (
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(doc_id) AS BIGINT) AS ids
  FROM documents GROUP BY lang
),
q AS (SELECT lang, quota FROM alloc WHERE i >= 1),
cum AS (
  SELECT lang, doc_id, n_chars,
         coalesce(sum(n_chars) OVER (
           PARTITION BY lang
           ORDER BY md5('{_UNIMAX_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
  FROM documents
),
par AS (
  SELECT c.lang,
         CAST(sum(CASE WHEN c.bef < q.quota % t.chars THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
         CAST(sum(CASE WHEN c.bef < q.quota % t.chars THEN c.doc_id ELSE 0 END) AS BIGINT) AS p_ids
  FROM cum c JOIN q USING (lang) JOIN tot t USING (lang)
  GROUP BY c.lang
)
SELECT t.lang, t.n_docs,
       CAST(q.quota AS BIGINT) AS threshold,
       CAST((q.quota // t.chars) * t.n_docs + p.p_n AS BIGINT) AS n_selected,
       CAST((q.quota // t.chars) * t.ids + p.p_ids AS BIGINT) AS checksum,
       round(CAST(q.quota AS DOUBLE) / t.chars, 6) AS rate
FROM tot t JOIN q USING (lang) JOIN par p USING (lang)
"""


def q_doc_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.sampling import unimax_stats

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return unimax_stats(
        d,
        key="doc_id",
        stratum="lang",
        weight="n_chars",
        epochs_cap=_UNIMAX_EPOCHS,
        salt=_UNIMAX_SALT,
    )


def q_doc_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.selection import (
        doc_gram_buckets,
    )

    B = _DRIFT_BUCKETS
    d = load_table(spark, sf_dir, "documents")
    g = doc_gram_buckets(d.select("doc_id", "text"), "doc_id", "text", B)
    dim = d.select(
        F.col("doc_id").alias("id"), "lang", (F.col("doc_id") % 2).alias("half")
    )
    bkt = (
        g.join(dim, "id")
        .groupBy("lang", "half", "bucket")
        .agg(F.sum("cnt").alias("c"))
    )
    tot = bkt.groupBy("lang").pivot("half", [0, 1]).agg(F.sum("c"))
    tots = tot.select(
        "lang",
        (F.coalesce(F.col("0"), F.lit(0)) + float(B)).alias("ta"),
        (F.coalesce(F.col("1"), F.lit(0)) + float(B)).alias("tb"),
    )
    x = bkt.filter(F.col("half") == 0).select("lang", "bucket", F.col("c").alias("ca"))
    y = bkt.filter(F.col("half") == 1).select("lang", "bucket", F.col("c").alias("cb"))
    pair = x.join(y, ["lang", "bucket"], "outer").fillna(
        0, subset=["ca", "cb"]
    )
    terms = pair.join(F.broadcast(tots), "lang").select(
        "lang",
        F.round(
            (
                (
                    (F.col("ca") + 1.0) / F.col("ta")
                    - (F.col("cb") + 1.0) / F.col("tb")
                )
                * (
                    F.log(F.col("ca") + 1.0)
                    - F.log(F.col("cb") + 1.0)
                    - F.log(F.col("ta"))
                    + F.log(F.col("tb"))
                )
            )
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("m"),
    )
    return terms.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("m").cast("bigint").alias("threshold"),
    )


def q_doc_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.selection import dsir_select

    d = load_table(spark, sf_dir, "documents")
    sel = dsir_select(
        d.select("doc_id", "text", "lang"),
        "doc_id",
        "text",
        is_target=F.col("lang") == "en",
        rate=_DSIR_RATE,
        n_buckets=_DSIR_BUCKETS,
        salt=_DSIR_SALT,
    )
    return sel.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("checksum"),
        F.sum("key_milli").cast("bigint").alias("threshold"),
    )


@register(
    "doc_stratified_sample",
    union_sections_sql(
        [
            ("mix", _MIX_ORACLE,
             ["lang", "n_kept", "rate", "n_upsampled", "up_rate"]),
            ("epoch_shuffle", _SHUF_ORACLE,
             ["shard", "n_docs", "first_doc", "checksum"]),
            ("temperature", _TEMP_ORACLE,
             ["lang", "n_docs", "threshold", "n_selected"]),
            ("dsir", _DSIR_ORACLE,
             ["lang", "n_docs", "checksum", "threshold"]),
            ("drift", _DRIFT_ORACLE,
             ["lang", "n_docs", "threshold"]),
            ("unimax", _UNIMAX_ORACLE,
             ["lang", "n_docs", "threshold", "n_selected", "checksum",
              "rate"]),
        ],
        _SAMPLE_SCHEMA,
    ),
    survey=(
        "§2.9 sampling (deterministic hash-based stratified corpus mixing,"
        " down- AND up-sampling: rates > 1 repeat rows with expected"
        " multiplicity == rate; engine/partitioning-independent)"
        " + deterministic epoch shuffle to ordered shards (dataloader"
        " permutation as a pure function of (key, seed); partitioned"
        " per-shard sort, no global window)"
        " + temperature-alpha mixture resampling (Conneau & Lample 2019:"
        " p_i ~ n_i^alpha; integer u32 thresholds so the per-row decision"
        " is float-free)"
        " + DSIR importance resampling (Xie et al. 2023: hashed-ngram"
        " log-ratio weights in integer milli-nats, Gumbel top-k without"
        " replacement; TakeOrderedAndProject, no global sort)"
        " + per-lang PSI drift monitor between corpus halves (hashed"
        " bucket space; per-bucket terms quantized to integer"
        " micro-units — the ln firewall — then exact BIGINT rollup)"
        " + UniMax epoch-capped language balancing (Chung et al. 2023:"
        " integer water-fill allocation replayed as a recursive-CTE"
        " oracle; full-epoch passes + hash-ordered partial pass,"
        " selection pinned by key checksums)"
    ),
)
def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_sections(
        [
            ("mix", q_doc_corpus_mix(spark, sf_dir)),
            ("epoch_shuffle", q_doc_epoch_shuffle(spark, sf_dir)),
            ("temperature", q_doc_temperature_mix(spark, sf_dir)),
            ("dsir", q_doc_dsir(spark, sf_dir)),
            ("drift", q_doc_drift(spark, sf_dir)),
            ("unimax", q_doc_unimax(spark, sf_dir)),
        ],
        _SAMPLE_SCHEMA,
    )


def q_doc_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.sampling import epoch_shuffle

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    shuffled = epoch_shuffle(
        d, key="doc_id", n_shards=_SHUF_SHARDS, seed=_SHUF_SEED
    )
    return shuffled.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max(F.when(F.col("pos") == 1, F.col("doc_id")))
        .cast("bigint")
        .alias("first_doc"),
        F.sum(F.col("doc_id") * F.col("pos")).cast("bigint").alias("checksum"),
    )


def q_doc_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.sampling import (
        stratified_hash_sample,
        stratified_hash_upsample,
    )

    d = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        list(_MIX_RATES.items()), "lang string, rate double"
    )
    kept = stratified_hash_sample(
        d, key="doc_id", stratum="lang", rates=rates,
        default_rate=_MIX_DEFAULT, salt=_MIX_SALT,
    )
    uprates = spark.createDataFrame(
        list(_UP_RATES.items()), "lang string, rate double"
    )
    upsampled = stratified_hash_upsample(
        d, key="doc_id", stratum="lang", rates=uprates,
        default_rate=_UP_DEFAULT, salt=_UP_SALT,
    )
    per_up_rate = F.create_map(
        *[x for k, v in _UP_RATES.items() for x in (F.lit(k), F.lit(v))]
    )
    up_agg = upsampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_upsampled"),
        F.round(
            F.max(F.coalesce(per_up_rate[F.col("lang")], F.lit(_UP_DEFAULT))), 6
        ).alias("up_rate"),
    )
    per_lang_rate = F.create_map(
        *[x for k, v in _MIX_RATES.items() for x in (F.lit(k), F.lit(v))]
    )
    down_agg = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.max(F.coalesce(per_lang_rate[F.col("lang")], F.lit(_MIX_DEFAULT))), 6
        ).alias("rate"),
    )
    # LEFT join from down_agg: a stratum whose upsample rate is < 1 can
    # emit ZERO upsampled rows, so it is absent from up_agg — but the
    # oracle's upagg groups over ALL documents and reports n_upsampled=0
    # for it. Coalesce the count to 0 and derive up_rate from the rate
    # map (it is constant per stratum) so such strata still appear.
    return down_agg.join(F.broadcast(up_agg), "lang", "left").select(
        "lang",
        "n_kept",
        "rate",
        F.coalesce(F.col("n_upsampled"), F.lit(0).cast("bigint")).alias(
            "n_upsampled"
        ),
        F.coalesce(
            F.col("up_rate"),
            F.round(
                F.coalesce(per_up_rate[F.col("lang")], F.lit(_UP_DEFAULT)), 6
            ),
        ).alias("up_rate"),
    )


# ---------------------------------------------------------------------------
# Sequence packing (operators/packing.py): concat-then-chunk offsets via
# the two-phase distributed prefix sum — the oracle states the global
# cumulative sum directly; the Spark plan must reproduce it exactly from
# per-partition partials at ANY partition count.
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 1024

#: (sf_dir identity, n_part, chunk size) -> pack_offsets plan-build memo
#: (boundary literals + per-bucket base offsets). Keyed by the source
#: parquet's mtime like `_artifact_path`, so regenerated testdata never
#: reuses stale offsets; lets repeat packings of the immutable corpus
#: (serving, bench reps) pay ZERO plan-build jobs after the first call.
_PACK_MEMOS: dict[tuple, dict] = {}


def _pack_reuse(spark: SparkSession, sf_dir: str) -> dict:
    import os

    src = os.path.join(sf_dir, "documents.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    n_part = max(1, spark.sparkContext.defaultParallelism)
    return _PACK_MEMOS.setdefault((sf_dir, mtime, n_part, _CHUNK_TOKENS), {})


def _pack_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, n_tok) projection both packing queries consume,
    persisted: tokenizing the corpus (split on the full text column)
    dominates the packing plans' scan cost, and the sizes table is two
    ints per doc — the 100 TB analog is materializing token counts to
    scratch once per corpus build. Tracked through the similarity
    registry's cache ledger so ``release_caches()`` frees it."""
    from sec_financial_pipeline_spark.registry.similarity import _track

    return _track(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok"))
        .persist()
    )


_OFFSETS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
),
cum AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM toks
)
SELECT doc_id, CAST(off AS BIGINT) AS offset,
       CAST(off // {_CHUNK_TOKENS} AS BIGINT) AS first_chunk,
       CAST((off + greatest(n_tok, 1) - 1) // {_CHUNK_TOKENS} AS BIGINT) AS last_chunk
FROM cum
"""


def q_doc_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.packing import pack_offsets

    d = _pack_sizes(spark, sf_dir)
    packed = pack_offsets(
        d, order_col="doc_id", size_col="n_tok", chunk_tokens=_CHUNK_TOKENS,
        reuse=_pack_reuse(spark, sf_dir),
    )
    return packed.select("doc_id", "offset", "first_chunk", "last_chunk")


# ---------------------------------------------------------------------------
# Length-bucketed padded-batch assembly (fairseq-style bucketing, made
# deterministic/distributed) — the `batches` section of doc_pack_chunks:
# the OTHER standard dataloader layout beside concat-then-chunk.
# ---------------------------------------------------------------------------

_BATCH_BUDGET = 512  # padded tokens per batch
_BATCH_PAD = 32  # pad-to-multiple band granularity

_BATCHES_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
),
banded AS (
  SELECT doc_id, n_tok,
         greatest(CAST(ceil(n_tok / {_BATCH_PAD}.0) AS BIGINT) * {_BATCH_PAD},
                  {_BATCH_PAD}) AS band
  FROM toks
),
capd AS (
  SELECT *, greatest(CAST(floor({_BATCH_BUDGET}.0 / band) AS BIGINT), 1)
            AS batch_capacity
  FROM banded
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY band ORDER BY doc_id) AS rk
  FROM capd
)
SELECT doc_id, CAST(n_tok AS INT) AS n_tok, band, batch_capacity,
       CAST((rk - 1) // batch_capacity AS BIGINT) AS batch_no,
       band AS padded_tokens
FROM ranked
"""


def q_doc_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.packing import (
        length_bucketed_batches,
    )

    d = _pack_sizes(spark, sf_dir)
    return length_bucketed_batches(
        d, order_col="doc_id", size_col="n_tok",
        token_budget=_BATCH_BUDGET, pad_multiple=_BATCH_PAD,
    ).select(
        "doc_id", "n_tok", "band", "batch_capacity", "batch_no",
        "padded_tokens",
    )


_PACK_ROW_SCHEMA = [
    ("doc_id", "bigint"),
    ("offset", "bigint"),
    ("first_chunk", "bigint"),
    ("last_chunk", "bigint"),
    ("n_tok", "int"),
    ("band", "bigint"),
    ("batch_capacity", "bigint"),
    ("batch_no", "bigint"),
    ("padded_tokens", "bigint"),
    # unigram-LM tokenizer section (operators/unigram.py)
    ("rank", "int"),
    ("piece", "string"),
    ("cnt", "bigint"),
    ("score", "bigint"),
    # unigram_apply section: token stream positions (r12)
    ("widx", "int"),
    ("pidx", "int"),
]


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer training — the
# EM sibling of BPE (operators/unigram.py), as the `unigram` section of
# doc_pack_chunks (the token-family row). The trainer runs IN-QUERY
# over a deterministic fourth of the corpus (SentencePiece itself
# samples sentences for training); the oracle below is MECHANICALLY
# GENERATED step-unrolled SQL — every Viterbi position of every EM
# iteration replayed as CTE stages on the same integer milli-nat
# scores, so the match is bit-exact, the same adjudication shape as the
# classifier's unrolled GD oracle.
# ---------------------------------------------------------------------------

_UNI_ITERS = 2
_UNI_M = 3       # max piece length
_UNI_W = 12      # words truncated to this many chars
_UNI_MINSEED = 2
_UNI_TOPK = 64
_UNI_SAMPLE = "doc_id % 4 = 0"
#: apply-time corpus slice (~9% of docs): train on the quarter sample,
#: TOKENIZE a disjoint-by-construction-irrelevant slice with the
#: trained pieces — the train-once/apply-everywhere deployment shape.
_UNI_APPLY_SAMPLE = "doc_id % 11 = 7"


def _unigram_train_ctes(
    iters: int = _UNI_ITERS,
    W: int = _UNI_W,
    M: int = _UNI_M,
    min_seed: int = _UNI_MINSEED,
) -> tuple[list[str], int]:
    """Shared CTE prelude of the train AND apply oracles — unrolled
    DuckDB replay of operators/unigram.py::train_unigram: seed
    substring counts, then per EM iteration one score CTE, one
    edge CTE, W Viterbi-position CTEs (argmax by (total, m) via a
    per-word window), W backtrace CTEs, and the M-step count CTE with
    the single-char coverage floor. Integer milli-nats throughout —
    both engines take ln of exact integers and round once. Returns
    (ctes, final_score_index): the trained piece table is
    ``sc{final_score_index}``."""
    ctes = [
        f"""w0 AS MATERIALIZED (
  SELECT substr(w, 1, {W}) AS word FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
    FROM documents WHERE {_UNI_SAMPLE}
  ) WHERE w <> ''
)""",
        """words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w0 GROUP BY word
)""",
        f"""spans AS MATERIALIZED (
  SELECT word, freq, i, m, substr(word, i, m) AS piece
  FROM words, range(1, {W + 1}) t1(i), range(1, {M + 1}) t2(m)
  WHERE i <= length(word) AND m <= length(word) - i + 1
)""",
        f"""cnt1 AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM spans GROUP BY piece
  HAVING length(piece) = 1 OR sum(freq) >= {min_seed}
)""",
        """chars AS (SELECT piece FROM cnt1 WHERE length(piece) = 1)""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""sc{t} AS MATERIALIZED (
  SELECT piece, cnt,
         CAST(round((ln(CAST(cnt AS DOUBLE)) -
                     ln(CAST((SELECT sum(cnt) FROM cnt{t}) AS DOUBLE)))
                    * 1000.0) AS BIGINT) AS score
  FROM cnt{t}
)"""
        )
        ctes.append(
            f"""ed{t} AS MATERIALIZED (
  SELECT s.word, s.i + s.m - 1 AS e, s.m, c.score AS sv
  FROM spans s JOIN sc{t} c ON c.piece = s.piece
)"""
        )
        for i in range(1, W + 1):
            branches = []
            for m in range(1, min(M, i) + 1):
                if m == i:
                    branches.append(
                        f"""      SELECT e.word, e.sv AS tot, {m} AS m
      FROM ed{t} e WHERE e.e = {i} AND e.m = {m}"""
                    )
                else:
                    branches.append(
                        f"""      SELECT p.word, p.best + e.sv AS tot, {m} AS m
      FROM v{t}_{i - m} p
      JOIN ed{t} e ON e.word = p.word AND e.e = {i} AND e.m = {m}"""
                    )
            union = "\n      UNION ALL\n".join(branches)
            ctes.append(
                f"""v{t}_{i} AS MATERIALIZED (
  SELECT word, tot AS best, m AS bm FROM (
    SELECT word, tot, m,
           row_number() OVER (PARTITION BY word
                              ORDER BY tot DESC, m DESC) AS rn
    FROM (
{union}
    )
  ) WHERE rn = 1
)"""
            )
        vt_union = "\n  UNION ALL\n".join(
            f"  SELECT word, {i} AS i, best, bm FROM v{t}_{i}"
            for i in range(1, W + 1)
        )
        ctes.append(f"vt{t} AS (\n{vt_union}\n)")
        ctes.append(
            f"""bt{t}_0 AS MATERIALIZED (
  SELECT word, freq, CAST(length(word) AS INT) AS pos FROM words
)"""
        )
        for k in range(1, W + 1):
            ctes.append(
                f"""bt{t}_{k} AS MATERIALIZED (
  SELECT b.word, b.freq, CAST(b.pos - v.bm AS INT) AS pos,
         substr(b.word, b.pos - v.bm + 1, v.bm) AS piece
  FROM bt{t}_{k - 1} b JOIN vt{t} v ON v.word = b.word AND v.i = b.pos
  WHERE b.pos > 0
)"""
            )
        bt_union = "\n    UNION ALL\n".join(
            f"    SELECT freq, piece FROM bt{t}_{k}" for k in range(1, W + 1)
        )
        ctes.append(
            f"""use{t} AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
{bt_union}
  ) GROUP BY piece
)"""
        )
        ctes.append(
            f"""cnt{t + 1} AS MATERIALIZED (
  SELECT coalesce(u.piece, c.piece) AS piece,
         CAST(CASE WHEN c.piece IS NOT NULL
              THEN greatest(coalesce(u.cnt, 0), 1)
              ELSE u.cnt END AS BIGINT) AS cnt
  FROM use{t} u FULL OUTER JOIN chars c ON c.piece = u.piece
  WHERE (CASE WHEN c.piece IS NOT NULL
         THEN greatest(coalesce(u.cnt, 0), 1)
         ELSE u.cnt END) > 0
)"""
        )
    final = iters + 1
    ctes.append(
        f"""sc{final} AS MATERIALIZED (
  SELECT piece, cnt,
         CAST(round((ln(CAST(cnt AS DOUBLE)) -
                     ln(CAST((SELECT sum(cnt) FROM cnt{final}) AS DOUBLE)))
                    * 1000.0) AS BIGINT) AS score
  FROM cnt{final}
)"""
    )
    return ctes, final


def _unigram_oracle_sql(
    iters: int = _UNI_ITERS,
    W: int = _UNI_W,
    M: int = _UNI_M,
    min_seed: int = _UNI_MINSEED,
    top_k: int = _UNI_TOPK,
) -> str:
    ctes, final = _unigram_train_ctes(iters, W, M, min_seed)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(rank AS INT) AS rank, piece, cnt, score FROM (
  SELECT piece, cnt, score,
         row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rank
  FROM sc{final}
) WHERE rank <= {top_k}"""
    )


def _unigram_apply_oracle_sql(
    iters: int = _UNI_ITERS,
    W: int = _UNI_W,
    M: int = _UNI_M,
    min_seed: int = _UNI_MINSEED,
) -> str:
    """Unrolled replay of operators/unigram.py::apply_unigram — Kudo
    2018's INFERENCE half: re-train via the shared CTE prelude, then
    augment the trained table with apply-set UNK chars, Viterbi-segment
    the apply vocabulary (same per-position argmax / backtrace chain,
    one more unrolled pass), index pieces in forward order, and join
    word instances back to their segmentations."""
    from sec_financial_pipeline_spark.operators.unigram import UNK_SCORE

    ctes, final = _unigram_train_ctes(iters, W, M, min_seed)
    ctes.append(
        f"""ainst AS MATERIALIZED (
  SELECT doc_id, CAST(widx AS INT) AS widx, substr(w, 1, {W}) AS word
  FROM (
    SELECT doc_id, generate_subscripts(ws, 1) AS widx, unnest(ws) AS w
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          FROM documents WHERE {_UNI_APPLY_SAMPLE})
  ) WHERE w <> ''
)"""
    )
    ctes.append(
        """avocab AS MATERIALIZED (SELECT DISTINCT word FROM ainst)"""
    )
    ctes.append(
        f"""scA AS MATERIALIZED (
  SELECT piece, cnt, score FROM sc{final}
  UNION ALL
  SELECT piece, CAST(0 AS BIGINT) AS cnt,
         CAST({UNK_SCORE} AS BIGINT) AS score
  FROM (
    SELECT DISTINCT substr(word, CAST(i AS INT), 1) AS piece
    FROM avocab, range(1, {W + 1}) r(i) WHERE i <= length(word)
  ) WHERE piece NOT IN
      (SELECT piece FROM sc{final} WHERE length(piece) = 1)
)"""
    )
    ctes.append(
        f"""aed AS MATERIALIZED (
  SELECT s.word, s.i + s.m - 1 AS e, s.m, c.score AS sv
  FROM (
    SELECT word, i, m, substr(word, i, m) AS piece
    FROM avocab, range(1, {W + 1}) t1(i), range(1, {M + 1}) t2(m)
    WHERE i <= length(word) AND m <= length(word) - i + 1
  ) s JOIN scA c ON c.piece = s.piece
)"""
    )
    for i in range(1, W + 1):
        branches = []
        for m in range(1, min(M, i) + 1):
            if m == i:
                branches.append(
                    f"""      SELECT e.word, e.sv AS tot, {m} AS m
      FROM aed e WHERE e.e = {i} AND e.m = {m}"""
                )
            else:
                branches.append(
                    f"""      SELECT p.word, p.best + e.sv AS tot, {m} AS m
      FROM av_{i - m} p
      JOIN aed e ON e.word = p.word AND e.e = {i} AND e.m = {m}"""
                )
        union = "\n      UNION ALL\n".join(branches)
        ctes.append(
            f"""av_{i} AS MATERIALIZED (
  SELECT word, tot AS best, m AS bm FROM (
    SELECT word, tot, m,
           row_number() OVER (PARTITION BY word
                              ORDER BY tot DESC, m DESC) AS rn
    FROM (
{union}
    )
  ) WHERE rn = 1
)"""
        )
    avt_union = "\n  UNION ALL\n".join(
        f"  SELECT word, {i} AS i, best, bm FROM av_{i}"
        for i in range(1, W + 1)
    )
    ctes.append(f"avt AS (\n{avt_union}\n)")
    ctes.append(
        """abt_0 AS MATERIALIZED (
  SELECT word, CAST(length(word) AS INT) AS pos FROM avocab
)"""
    )
    for k in range(1, W + 1):
        ctes.append(
            f"""abt_{k} AS MATERIALIZED (
  SELECT b.word, CAST(b.pos - v.bm AS INT) AS pos,
         substr(b.word, b.pos - v.bm + 1, v.bm) AS piece
  FROM abt_{k - 1} b JOIN avt v ON v.word = b.word AND v.i = b.pos
  WHERE b.pos > 0
)"""
        )
    abt_union = "\n    UNION ALL\n".join(
        f"    SELECT word, {k} AS k, piece FROM abt_{k}"
        for k in range(1, W + 1)
    )
    ctes.append(
        f"""apieces AS MATERIALIZED (
  SELECT word, piece,
         CAST(row_number() OVER (PARTITION BY word ORDER BY k DESC)
              AS INT) AS pidx
  FROM (
{abt_union}
  )
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT i.doc_id, i.widx, p.pidx, p.piece, c.score
FROM ainst i
JOIN apieces p ON p.word = i.word
JOIN scA c ON c.piece = p.piece"""
    )


_UNIGRAM_ORACLE = _unigram_oracle_sql()


_UNIGRAM_APPLY_ORACLE = _unigram_apply_oracle_sql()


def q_doc_unigram_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference half (VERDICT r11 item 2): train the piece table on
    the quarter sample, then tokenize the ~9% apply slice with it —
    one Viterbi fold per DISTINCT apply word, instances joined back."""
    from sec_financial_pipeline_spark.operators.unigram import (
        apply_unigram,
        train_unigram,
    )

    d = load_table(spark, sf_dir, "documents")
    scores = train_unigram(
        d.filter(_UNI_SAMPLE), "text", iters=_UNI_ITERS,
        max_piece_len=_UNI_M, max_word_len=_UNI_W,
        min_seed_count=_UNI_MINSEED,
    )
    return apply_unigram(
        d.filter(_UNI_APPLY_SAMPLE), "doc_id", "text", scores,
        max_piece_len=_UNI_M, max_word_len=_UNI_W,
    )


def q_doc_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.unigram import (
        unigram_report,
    )

    d = load_table(spark, sf_dir, "documents").filter(_UNI_SAMPLE)
    return unigram_report(
        d, "text", top_k=_UNI_TOPK, iters=_UNI_ITERS,
        max_piece_len=_UNI_M, max_word_len=_UNI_W,
        min_seed_count=_UNI_MINSEED,
    )


@register(
    "doc_pack_chunks",
    _union_sections_sql(
        [
            (
                "offsets",
                _OFFSETS_ORACLE,
                ["doc_id", "offset", "first_chunk", "last_chunk"],
            ),
            (
                "batches",
                _BATCHES_ORACLE,
                ["doc_id", "n_tok", "band", "batch_capacity", "batch_no",
                 "padded_tokens"],
            ),
            (
                "unigram",
                _UNIGRAM_ORACLE,
                ["rank", "piece", "cnt", "score"],
            ),
            (
                "unigram_apply",
                _UNIGRAM_APPLY_ORACLE,
                ["doc_id", "widx", "pidx", "piece", "score"],
            ),
        ],
        _PACK_ROW_SCHEMA,
    ),
    survey=(
        "§2.9 sequence packing (concat-then-chunk token offsets;"
        " two-phase exact prefix sum, no global single-task window)"
        " + length-bucketed padded-batch assembly (pad-to-multiple"
        " bands, per-band capacity under a token budget, deterministic"
        " batch ids from band-partitioned ranks)"
        " + unigram-LM tokenizer training (Kudo 2018 Viterbi-EM over"
        " the word-frequency table; integer milli-nat scores; oracle ="
        " mechanically unrolled per-position SQL replay)"
        " + unigram APPLY path (the inference half: Viterbi-tokenize"
        " a ~9% apply slice with the trained pieces, one fold per"
        " DISTINCT word + instance join-back, UNK-char fallback)"
    ),
)
def q_doc_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _union_sections(
        [
            ("offsets", q_doc_pack_offsets(spark, sf_dir)),
            ("batches", q_doc_length_batches(spark, sf_dir)),
            ("unigram", q_doc_unigram(spark, sf_dir)),
            ("unigram_apply", q_doc_unigram_apply(spark, sf_dir)),
        ],
        _PACK_ROW_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Chunk assembly (operators/packing.py::assemble_chunks): the inverse of
# pack_offsets — per-chunk ordered document slices, the view a training
# dataloader actually reads. The oracle replays the same global prefix
# sum and expands each doc's touched chunk range with generate_series;
# reconciliation with doc_pack_chunks holds by construction (identical
# offsets feed both).
# ---------------------------------------------------------------------------


@register(
    "doc_chunk_assembly",
    f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
),
cum AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM toks
),
spans AS (
  SELECT doc_id, n_tok, off,
         CAST(off // {_CHUNK_TOKENS} AS BIGINT) AS first_chunk,
         CAST((off + n_tok - 1) // {_CHUNK_TOKENS} AS BIGINT) AS last_chunk
  FROM cum
),
exploded AS (
  SELECT doc_id, n_tok, off,
         unnest(generate_series(first_chunk, last_chunk)) AS chunk_id
  FROM spans
)
SELECT chunk_id, doc_id,
       CAST(greatest(off, chunk_id * {_CHUNK_TOKENS}) - chunk_id * {_CHUNK_TOKENS} AS BIGINT) AS chunk_off,
       CAST(greatest(off, chunk_id * {_CHUNK_TOKENS}) - off AS BIGINT) AS doc_start,
       CAST(least(off + n_tok, (chunk_id + 1) * {_CHUNK_TOKENS})
         - greatest(off, chunk_id * {_CHUNK_TOKENS}) AS BIGINT) AS slice_len
FROM exploded
""",
    survey="§2.9 sequence packing (chunk assembly: per-chunk ordered doc slices via bounded explode of each doc's chunk range — the dataloader-side inverse of doc_pack_chunks)",
)
def q_doc_chunk_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.packing import (
        assemble_chunks,
        pack_offsets,
    )

    d = _pack_sizes(spark, sf_dir)
    packed = pack_offsets(
        d, order_col="doc_id", size_col="n_tok", chunk_tokens=_CHUNK_TOKENS,
        reuse=_pack_reuse(spark, sf_dir),
    )
    chunks = assemble_chunks(packed, size_col="n_tok", chunk_tokens=_CHUNK_TOKENS)
    return chunks.select(
        "chunk_id", "doc_id", "chunk_off", "doc_start", "slice_len"
    )


# ---------------------------------------------------------------------------
# Multimodal binary plumbing, driver-checked (operators/multimodal.py):
# documents become opaque binary payloads (the UTF-8 bytes), ride through
# the REAL Arrow-batched mapInPandas feature-extraction path (payload
# dropped before anything wide — the 100 TB contract), and the query
# aggregates the extracted per-payload stats. The oracle recomputes
# byte-length and md5 on the identical bytes (DuckDB md5(VARCHAR) hashes
# the UTF-8 encoding). Decode paths (BMP/WAV/frame containers) stay
# pytest-covered — no SQL engine can re-derive a pixel decode.
# ---------------------------------------------------------------------------


@register(
    "mm_media_stats",
    """
WITH media AS (
  SELECT doc_id AS media_id, source || '|' || lang AS media_type,
         text FROM documents
)
SELECT media_type,
       count(*) AS n_media,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(text)) AS distinct_payloads,
       min(md5(text)) AS min_hash,
       max(md5(text)) AS max_hash
FROM media GROUP BY media_type
""",
    survey="§2.9 multimodal (opaque binary payload columns through Arrow-batched mapInPandas feature extraction; byte stats aggregated after the payload column is dropped)",
)
def q_mm_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.multimodal import (
        extract_features,
    )

    media = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.concat_ws("|", "source", "lang").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    feats = extract_features(media)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("n_bytes").cast("long")).alias("total_bytes"),
        F.count_distinct(F.col("payload_hash")).alias("distinct_payloads"),
        F.min("payload_hash").alias("min_hash"),
        F.max("payload_hash").alias("max_hash"),
    )


# ---------------------------------------------------------------------------
# PII redaction (operators/redact.py): scrub emails/SSNs/phones before
# anything downstream sees the text — pure JVM-side regex, no UDF. The
# synthetic corpus carries no natural PII, so deterministic spans are
# woven in first (both engines replay the identical derivation); the
# query audits per-source redaction counts and proves the scrubbed text
# byte-identical via md5. Patterns stay inside the Java-regex/RE2
# common subset so Spark and DuckDB agree on every span.
# ---------------------------------------------------------------------------


_PII_ORACLE = r"""
WITH seeded AS (
  SELECT doc_id, source,
         text || CASE
           WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
           WHEN doc_id % 11 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           WHEN doc_id % 13 = 0 THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE ''
         END AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
         len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
           '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
  FROM seeded
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_email) AS BIGINT) AS emails_redacted,
       CAST(sum(n_ssn) AS BIGINT) AS ssns_redacted,
       CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
       min(md5(redacted)) AS min_redacted_hash,
       max(md5(redacted)) AS max_redacted_hash
FROM scrubbed
GROUP BY source
"""


def q_doc_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.redact import redact

    d = load_table(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            )
            .when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" ssn 123-45-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            )
            .when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" call 555-867-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            )
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    scrubbed = redact(seeded, text_col="text")
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("emails_redacted"),
        F.sum("n_ssn").cast("bigint").alias("ssns_redacted"),
        F.sum("n_phone").cast("bigint").alias("phones_redacted"),
        F.min(F.md5(F.col("redacted"))).alias("min_redacted_hash"),
        F.max(F.md5(F.col("redacted"))).alias("max_redacted_hash"),
    )


# ---------------------------------------------------------------------------
# Exact repeated-substring spans (Lee et al. 2021 ExactSubstr; merged as
# the `dup_spans` section of doc_redact — both are text-surgery passes):
# maximal per-document token spans whose every k-token window occurs
# >= 2 times corpus-wide. Catches the cross-document pasted passage
# that document-level AND line-level dedup both miss.
# ---------------------------------------------------------------------------

_SPAN_K = 8  # window tokens (sf0.01: 1,015 duplicated grams, 2,101 hits)

_DUPSPAN_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pos AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(w[i : i + {_SPAN_K - 1}], ' ') AS gram
  FROM toks,
  LATERAL (SELECT unnest(generate_series(1, len(w) - {_SPAN_K - 1})) AS i) u(i)
),
heavy AS (SELECT gram FROM pos GROUP BY gram HAVING count(*) >= 2),
flagged AS (
  SELECT p.doc_id, p.pos FROM pos p
  WHERE p.gram IN (SELECT gram FROM heavy)
),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {_SPAN_K} THEN 0 ELSE 1 END AS b
  FROM flagged
),
grp AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM brk
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {_SPAN_K - 1} AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_windows
FROM grp GROUP BY doc_id, g
"""


def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.operators.dedup import (
        repeated_kgram_spans,
    )

    d = load_table(spark, sf_dir, "documents")
    return repeated_kgram_spans(d, "doc_id", "text", k=_SPAN_K, min_count=2)


_REDACT_ROW_SCHEMA = [
    ("source", "string"),
    ("n_docs", "bigint"),
    ("emails_redacted", "bigint"),
    ("ssns_redacted", "bigint"),
    ("phones_redacted", "bigint"),
    ("min_redacted_hash", "string"),
    ("max_redacted_hash", "string"),
    ("doc_id", "bigint"),
    ("span_start", "bigint"),
    ("span_end", "bigint"),
    ("n_windows", "bigint"),
]


@register(
    "doc_redact",
    _union_sections_sql(
        [
            (
                "pii",
                _PII_ORACLE,
                ["source", "n_docs", "emails_redacted", "ssns_redacted",
                 "phones_redacted", "min_redacted_hash", "max_redacted_hash"],
            ),
            (
                "dup_spans",
                _DUPSPAN_ORACLE,
                ["doc_id", "span_start", "span_end", "n_windows"],
            ),
        ],
        _REDACT_ROW_SCHEMA,
    ),
    survey=(
        "§2.9 text curation (PII redaction: ordered regex scrub of"
        " emails/SSNs/phones, JVM-side codegen, per-source audit counts"
        " + byte-exact scrubbed-text hashes) + exact repeated-substring"
        " spans (Lee et al. 2021 ExactSubstr: per-position k-grams ->"
        " corpus-wide occurrence counts -> semi-join flag -> overlap-"
        " merged maximal spans; all linear, windows partitioned by doc)"
    ),
)
def q_doc_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _union_sections(
        [
            ("pii", q_doc_redact_pii(spark, sf_dir)),
            ("dup_spans", q_doc_dup_spans(spark, sf_dir)),
        ],
        _REDACT_ROW_SCHEMA,
    )


def ensure_unigram_model(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent batch half of the tokenizer lifecycle (the same
    build-once/probe-many shape as the BM25 and IVF-PQ stores): train
    the unigram piece table ONCE on the quarter sample and persist it;
    apply-time callers load + tokenize only — the train-once/
    apply-at-100TB deployment Kudo 2018 assumes."""
    import os

    from sec_financial_pipeline_spark.operators.unigram import train_unigram
    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )

    cfg = f"uni-i{_UNI_ITERS}m{_UNI_M}w{_UNI_W}s{_UNI_MINSEED}"
    path = _artifact_path("sfp_unigram_", sf_dir, "documents", cfg)
    if not os.path.exists(path):
        d = load_table(spark, sf_dir, "documents").filter(_UNI_SAMPLE)
        scores = train_unigram(
            d, "text", iters=_UNI_ITERS, max_piece_len=_UNI_M,
            max_word_len=_UNI_W, min_seed_count=_UNI_MINSEED,
        )

        def _write(p):
            scores.coalesce(1).write.parquet(os.path.join(p, "scores"))

        _publish_atomically(_write, path)
    return path


def q_doc_unigram_apply_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply-ONLY tokenization latency (bench row): load the persisted
    piece table and Viterbi-tokenize the apply slice — no EM retrain.
    Token stream is bit-identical to the train-in-query oracle section
    (both run operators/unigram.apply_unigram on the same scores)."""
    import os

    from sec_financial_pipeline_spark.operators.unigram import apply_unigram

    root = ensure_unigram_model(spark, sf_dir)
    scores = spark.read.parquet(os.path.join(root, "scores"))
    d = load_table(spark, sf_dir, "documents").filter(_UNI_APPLY_SAMPLE)
    return apply_unigram(
        d, "doc_id", "text", scores, max_piece_len=_UNI_M,
        max_word_len=_UNI_W,
    )
