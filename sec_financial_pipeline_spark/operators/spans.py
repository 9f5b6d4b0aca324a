"""Exact-substring (duplicate-SPAN) deduplication — the span-level
modality of Lee et al. 2021 ("Deduplicating Training Data Makes
Language Models Better"): long token n-grams recurring across
documents mark verbatim-copied passages that document-level MinHash /
SimHash miss when the surrounding text differs. The suffix-array
machinery of the paper collapses, in the distributed setting, to a
sliding-gram equi-join:

1. every document emits its WIDTH-token grams with their start
   positions (one shuffle-free projection per doc — the shared
   ``token_shingles`` zip-with chain, positions from ``posexplode``);
2. one shuffled aggregation finds grams present in >= ``min_docs``
   DISTINCT documents (candidate generation is bucketed by gram hash
   — the same near-linear discipline as the LSH band tables);
3. each document's duplicated gram intervals merge into maximal spans
   with the classic islands pass (group-partitioned running-max
   window — positions are unique per doc, so ordering is total);
4. removal keeps the corpus-wide FIRST occurrence (min (doc_id,
   start)) of every duplicated gram and rebuilds the other documents'
   text without their covered tokens.

All integer arithmetic end to end — coverage counts and span counts
are exact and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.similarity import token_shingles


def _gram_occurrences(
    docs: DataFrame, id_col: str, text_col: str, width: int
) -> DataFrame:
    toks = F.split(F.col(text_col), " ")
    grams = token_shingles(toks, width, distinct=False)
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("__ntok"),
        F.posexplode_outer(grams).alias("__p", "__g"),
    ).select(
        id_col,
        "__ntok",
        (F.col("__p") + 1).alias("s"),           # 1-based start
        (F.col("__p") + width).alias("e"),       # inclusive end
        "__g",
    )


def _dup_occurrences(occ: DataFrame, id_col: str, min_docs: int) -> DataFrame:
    """Occurrences of grams present in >= ``min_docs`` distinct docs,
    exactly — one string-keyed aggregation + semi-join. The cost
    center is BUILDING the gram strings (the zip-with concat chain),
    not shuffling them: a hash-candidate pre-phase was measured SLOWER
    at sf0.1 (it re-derives the grams for the confirm pass, doubling
    the expensive projection to save the cheaper exchange). At cluster
    scale, if exchange bytes ever dominate, persist ``occ`` once and
    reinstate the 8-byte-key candidate phase — collisions can only add
    candidates, the string confirm stays exact."""
    dup_grams = (
        occ.groupBy("__g")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__g")
    )
    return occ.join(dup_grams, "__g", "left_semi")


def duplicate_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span statistics: ``(id, total_tokens,
    dup_tokens, n_spans)`` for every document carrying at least one
    cross-document duplicated span. ``dup_tokens`` is the size of the
    UNION of the duplicated gram intervals (overlaps merged by the
    islands pass, never double-counted); ``n_spans`` the number of
    maximal spans."""
    occ = _gram_occurrences(docs, id_col, text_col, width).filter(
        F.col("__g").isNotNull()
    )
    iv = _dup_occurrences(occ, id_col, min_docs)
    w = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pmax = F.coalesce(F.max("e").over(w), F.lit(0))
    contrib = F.greatest(
        F.lit(0), F.col("e") - F.greatest(F.col("s"), pmax + 1) + 1
    )
    island = F.when(F.col("s") > pmax, 1).otherwise(0)
    return (
        iv.select(
            id_col, F.col("__ntok").alias("total_tokens"),
            contrib.alias("__c"), island.alias("__i"),
        )
        .groupBy(id_col, "total_tokens")
        .agg(
            F.sum("__c").cast("bigint").alias("dup_tokens"),
            F.sum("__i").cast("bigint").alias("n_spans"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Keep-first exact-substring dedup: for every duplicated gram the
    corpus-wide first occurrence (min ``(doc_id, start)``) SURVIVES;
    every other occurrence's tokens are removed and the text rebuilt
    from the surviving tokens (single-space joined — the tokenizer's
    normalization, documented). Returns ``(id, text, n_removed)``."""
    occ = _gram_occurrences(docs, id_col, text_col, width)
    present = _dup_occurrences(
        occ.filter(F.col("__g").isNotNull()), id_col, min_docs
    )
    dup_grams = (
        present.groupBy("__g")
        .agg(
            F.count_distinct(id_col).alias("__nd"),
            F.min(F.struct(id_col, "s")).alias("__keep"),
        )
        .filter(F.col("__nd") >= min_docs)
        .select("__g", "__keep")
    )
    losers = present.join(dup_grams, "__g").filter(
        ~(
            (F.col(id_col) == F.col(f"__keep.{id_col}"))
            & (F.col("s") == F.col("__keep.s"))
        )
    )
    # positions each losing occurrence covers, deduplicated per doc
    dead = (
        losers.select(
            id_col, F.explode(F.sequence("s", "e")).alias("__pos")
        ).distinct()
    )
    toks = docs.select(
        id_col,
        F.col(text_col),
        F.posexplode_outer(F.split(F.col(text_col), " ")).alias(
            "__pos0", "__tok"
        ),
    ).withColumn("__pos", F.col("__pos0") + 1)
    kept = toks.join(dead, [id_col, "__pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__tok"))
                ),
                lambda x: x["__tok"],
            ),
        ).alias(text_col)
    )
    removed = dead.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_removed")
    )
    return (
        docs.select(id_col).join(rebuilt, id_col, "left")
        .join(removed, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )
