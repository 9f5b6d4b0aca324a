"""Deduplication policies (SURVEY §2.4 A2/A3 + north-star text dedup).

The reference contains *two* divergent dedup semantics:

- **argmax-abs** (``src/api/data_service.py:126-176``, argmax at ``:167``):
  among duplicate facts for a (ticker, fy, fp) key, keep the value with the
  largest absolute magnitude (restatements usually restate upward).
- **last-write-wins** (``main.py:313-331``, ``financial_analyzer.py:216-236``):
  dict assignment keeps the last-seen entry in file order.

Both are implemented; each caller chooses one explicitly. Python's
``max`` keeps the *first* of tied elements, so each policy takes explicit
tie-breaker columns to stay deterministic under distribution — on a
cluster, "first seen" is not a meaningful order.

Implementation: a single window ``row_number`` per key — one shuffle on
the dedup key, map-side nothing to pre-aggregate (whole rows survive).
At 100 TB this is the minimal-shuffle shape; AQE handles skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep the first row per key under a total order (must be total —
    pass tie-breakers — or the result is nondeterministic)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def argmax_abs(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    tiebreakers: Sequence[str | Column] = (),
) -> DataFrame:
    """Argmax-abs dedup (reference ``data_service.py:167``)."""
    order = [F.abs(F.col(value_col)).desc_nulls_last()]
    order += [F.col(c).asc() if isinstance(c, str) else c for c in tiebreakers]
    return keep_first(df, keys, order)


def last_write_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Column,
    tiebreakers: Sequence[str | Column] = (),
) -> DataFrame:
    """Last-write-wins dedup (reference ``main.py:331``): keep the row
    with the greatest ``order_col`` per key."""
    order = [
        (F.col(order_col) if isinstance(order_col, str) else order_col).desc()
    ]
    order += [F.col(c).desc() if isinstance(c, str) else c for c in tiebreakers]
    return keep_first(df, keys, order)


def keep_first_fused(
    df: DataFrame,
    keys: Sequence[str],
    policies: Sequence[tuple[str, Sequence[Column]]],
    payload: Sequence[str],
    policy_col: str = "policy",
) -> DataFrame:
    """Winner-per-key for SEVERAL total orders in ONE scan + ONE shuffle.

    ``keep_first`` twice means two full scans and two exchanges of the
    input (the per-policy sort projections defeat ReusedExchange). When
    every policy is a *total* order expressible as a struct MAXIMUM —
    descending-major sort keys verbatim, ascending numeric keys negated,
    no nulls in any sort key — the winners are plain ``max`` aggregates:
    one hash partial-aggregation per map task (no sort), one exchange of
    one pre-aggregated row per key, then an inline expansion to one
    output row per key per policy (guide §2.3/§2.4: aggregate before
    the shuffle, share one exchange).

    ``policies``: (name, max-ready sort-key Columns). ``payload``: the
    columns each winner row carries (may include the keys). Equivalent
    to ``keep_first(df, keys, order)`` per policy + a tagged union —
    pinned by ``tests/test_operators_fixes.py``.
    """
    aggs = [
        F.max(
            F.struct(
                *[c.alias(f"__k{j}") for j, c in enumerate(order)],
                *[F.col(c).alias(f"__p_{c}") for c in payload],
            )
        ).alias(f"__w{i}")
        for i, (_, order) in enumerate(policies)
    ]
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    branches = [
        F.struct(
            F.lit(name).alias(policy_col),
            *[F.col(f"__w{i}.__p_{c}").alias(c) for c in payload],
        )
        for i, (name, _) in enumerate(policies)
    ]
    return agg.select(F.explode(F.array(*branches)).alias("__r")).select(
        "__r.*"
    )


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    keep_min_of: str,
) -> DataFrame:
    """Exact content dedup: one representative row per distinct content.

    Used for document-level exact dedup at scale: group by a content hash
    (cheap map-side partial agg) and keep the row with the minimum id.
    Equivalent to ``dropDuplicates(content_cols)`` but with a
    *deterministic* representative (dropDuplicates keeps an arbitrary one).
    """
    order = [F.col(keep_min_of).asc()]
    return keep_first(df, list(content_cols), order)


def ngram_contamination(
    eval_docs: DataFrame,
    train_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    hash_shingles: bool = False,
) -> DataFrame:
    """Train/eval contamination counts: for every eval document, how many
    of its distinct k-word n-grams also occur anywhere in the training
    corpus (the GPT-3-style n-gram overlap decontamination check —
    Brown et al. 2020 §C use 13-grams; k is the caller's knob).

    Returns every eval row with an ``n_overlap`` column (0 when clean,
    including docs too short to have any k-gram); callers threshold it
    into a contaminated/clean verdict.

    Scale shape: explode both sides to (id, shingle), then a LEFT SEMI
    join from eval shingles to train shingles — semi output is bounded
    by the eval side (never |eval| x |train-occurrences|), the train
    side needs no pre-distinct, and the single shingle-keyed exchange is
    the same shape at 100 TB (AQE handles hot shingles). The count is a
    map-side-combinable groupBy on the (tiny) eval-doc key.

    ``hash_shingles=True`` joins on ``xxhash64(shingle)`` instead of
    the k-gram string — the scale path: the shuffled key drops from
    ~k*avg_token_len bytes to 8, at the cost of a vanishing
    false-positive rate (expected spurious matches ~ n_eval_shingles *
    n_train_shingles / 2^64; an audit-acceptable trade, but not
    oracle-exact, so the oracled registry query keeps the default).
    """
    from sec_financial_pipeline_spark.operators.similarity import shingles
    from sec_financial_pipeline_spark.sources.testdata import spread_scan

    # r14 (guide §2.5): spread the reference text before the shingle
    # HOF + explode — that build ran serial inside a single-split scan
    # stage; a no-op on real multi-file inputs.
    tr_sh = spread_scan(train_docs.select(F.col(text_col))).select(
        F.explode(shingles(F.col(text_col), k=k)).alias("shingle")
    )
    return _overlap_counts(eval_docs, tr_sh, id_col, text_col, k, hash_shingles)


def _overlap_counts(
    docs: DataFrame,
    ref_shingles: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    hash_shingles: bool,
) -> DataFrame:
    """Shared probe tail of the contamination family: per-doc counts of
    distinct k-grams present in ``ref_shingles`` (one ``shingle``
    column — live-exploded or loaded from a store)."""
    from sec_financial_pipeline_spark.operators.similarity import shingles
    from sec_financial_pipeline_spark.sources.testdata import spread_scan

    # r14 (guide §2.5): same serial-first-stage fix as the reference
    # side — the probe side's shingle build parallelizes too.
    d_sh = spread_scan(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k=k)).alias("shingle")
    )
    if hash_shingles:
        d_sh = d_sh.select(id_col, F.xxhash64("shingle").alias("shingle"))
        # Pin a shuffled hash join: hashing collapses the planner's
        # size ESTIMATE so it otherwise broadcasts the entire
        # reference shingle set (a driver-built HashedRelation of
        # every distinct n-gram in the corpus — measured 2x slower at
        # 320k docs, and a guaranteed driver OOM at real corpus
        # sizes). The win we want from hashing is smaller exchange
        # bytes, not broadcast.
        ref_shingles = ref_shingles.select(
            F.xxhash64("shingle").alias("shingle")
        ).hint("shuffle_hash")
    hits = (
        d_sh.join(ref_shingles, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return docs.join(hits, id_col, "left").withColumn(
        "n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint")
    )


# ---------------------------------------------------------------------------
# Corpus-level boilerplate removal (CCNet / Gopher line dedup): drop
# lines that recur across many documents — navigation chrome, cookie
# banners, license footers — the standard pretraining-curation pass
# (Wenzek et al. 2020 §3.1 dedup paragraphs by hash across shards;
# Rae et al. 2021 §A1.2). Same explode -> count -> anti-join machinery
# as the contamination audit above, pointed at intra-corpus repetition.
# ---------------------------------------------------------------------------


def line_table(
    docs: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """``(id, line_no, line)`` — one row per line of each document (the
    real-corpus path: documents carry newline structure). ``sep`` is a
    regex, as in ``F.split``."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_no", "line"),
    )


def token_segment_lines(
    docs: DataFrame, id_col: str, text_col: str, width: int
) -> DataFrame:
    """``(id, line_no, line)`` with lines = non-overlapping ``width``-token
    segments — the paragraph proxy for corpora without newline structure
    (the synthetic testdata).

    r14 (guide §2.3/§2.4): built by exploding SEGMENT INDICES and
    slicing the token array at row level — all whole-stage-codegen'd,
    no HOF lambda (the quadratic slice-in-lambda trap this family
    documents cannot bite: the array is a bound attribute evaluated
    once per input row by the Generate stage). The former formulation
    exploded every token as its own row and shuffled the full text
    payload plus per-token row overhead into a groupBy + collect_list
    re-assembly (measured 11.4 MB shuffled on the bench row vs 2.8 MB
    now, 23 stages vs 13); segments are now born assembled map-side
    and nothing shuffles until a consumer aggregates. No
    materialization barrier: consumer branches re-run a linear codegen
    map, which is cheaper than exchanging the text payload — the
    barrier pattern is for INTERPRETED HOF chains (minhash, shingles),
    not codegen'd projections."""
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    seg_rows = toks.select(
        F.col(id_col),
        "__w",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("__w") / float(width)).cast("int") - 1,
            )
        ).alias("line_no"),
    )
    return seg_rows.select(
        id_col,
        F.col("line_no").cast("int").alias("line_no"),
        F.array_join(
            F.slice(F.col("__w"), F.col("line_no") * width + 1, width), " "
        ).alias("line"),
    )


def normalize_line(line: Column) -> Column:
    """CCNet-style line key: lowercase, trimmed, whitespace-collapsed —
    so cosmetic variants of the same boilerplate count as one line."""
    return F.regexp_replace(F.lower(F.trim(line)), r"\s+", " ")


def drop_boilerplate_lines(
    lines: DataFrame, id_col: str, min_docs: int
) -> DataFrame:
    """Remove every line whose NORMALIZED form occurs in >= ``min_docs``
    distinct documents; returns the surviving ``(id, line_no, line)``
    rows (original text, normalization affects only the key).

    Scale shape: the frequency pass is a partial-aggregable
    ``count(distinct id)`` grouped on the line key (one hash shuffle on
    the key — AQE handles hot lines, exactly like hot shingles in the
    contamination audit); the drop is a ``left_anti`` join against the
    (small — only lines crossing the threshold) boilerplate set, which
    broadcasts under the threshold and degrades to shuffle above it.
    Nothing is ever per-corpus quadratic: every stage is linear in
    total line count."""
    keyed = lines.withColumn("__key", normalize_line(F.col("line")))
    boiler = (
        keyed.groupBy("__key")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__key")
    )
    return keyed.join(boiler, "__key", "left_anti").drop("__key")


def reassemble_lines(
    kept: DataFrame, id_col: str, sep: str = "\n"
) -> DataFrame:
    """``(id, clean_text, n_kept)`` — surviving lines of each document
    concatenated back in line order. Deterministic by construction:
    ``line_no`` is unique per document, so the ``array_sort`` of
    (line_no, line) structs admits exactly one order on any
    partitioning. Documents whose every line was boilerplate disappear
    (no rows survive); callers LEFT-join from the corpus and coalesce
    to the empty text. The per-doc ``collect_list`` is bounded by the
    document's own line count — the same per-doc bound every
    reassembly (chunk assembly, redaction) carries."""
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def repeated_kgram_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact repeated-substring spans (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better": ExactSubstr) — the
    corpus-wide duplicated-passage detector that catches what document-
    and line-level dedup both miss (a paragraph pasted into otherwise-
    distinct pages). For every document, emit the maximal token spans
    whose every ``k``-token window occurs >= ``min_count`` times across
    the whole corpus:

    ``(id, span_start, span_end, n_windows)`` — token positions,
    0-based inclusive; overlapping/abutting duplicated windows merge
    into one span (window starts p, q belong together iff q - p <= k).

    Scale shape, all linear: per-position k-grams come from the
    ``token_shingles`` shift-chain (one pass, no per-element re-split);
    the occurrence count is a partial-aggregable groupBy on the gram;
    flagging is a ``left_semi`` join of positions against the
    duplicated grams (output bounded by the flagged positions); span
    merging is lag + running-sum windows PARTITIONED by document. The
    100 TB variant joins on ``xxhash64(gram)`` like the contamination
    audit's ``hash_shingles`` knob (8-byte exchange keys, pinned
    shuffle join) — the oracled default keeps gram strings exact.
    """
    from pyspark.sql import Window

    from sec_financial_pipeline_spark.operators.similarity import (
        token_shingles,
    )
    from sec_financial_pipeline_spark.sources.testdata import spread_scan

    # r14 (guide §2.5): the gram-string build (the zip-with concat
    # chain — the measured cost center of this operator) runs map-side
    # of the gram exchange; spread the text first so it parallelizes
    # over a single-split scan. No-op at real multi-file scale.
    docs = spread_scan(docs.select(F.col(id_col), F.col(text_col)))
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w"))
    pos = toks.select(
        F.col(id_col),
        F.posexplode(token_shingles(F.col("__w"), k=k, distinct=False)).alias(
            "pos", "gram"
        ),
    )
    heavy = (
        pos.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("gram")
    )
    flagged = pos.join(heavy, "gram", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)
    ).otherwise(F.lit(1))
    grouped = flagged.withColumn("__brk", brk).withColumn(
        "__grp",
        F.sum("__brk").over(
            Window.partitionBy(id_col).orderBy("pos").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return grouped.groupBy(id_col, "__grp").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + (k - 1)).cast("bigint").alias("span_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
    ).select(id_col, "span_start", "span_end", "n_windows")


def bigram_support_profile(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    support_cap: int = 100,
    rare_max: int = 2,
) -> DataFrame:
    """Corpus-LM fluency/rarity signal — the integer-exact analog of
    CCNet's LM-perplexity filter (Wenzek et al. 2020 §3.2 score docs by
    a language model; here the "model" is the corpus' own bigram
    counts, the standard self-supervised stand-in when no external LM
    ships with the engine): per document,

    - ``n_bigrams``    — adjacent token pairs;
    - ``support_sum``  — sum over its bigrams of min(corpus count,
      ``support_cap``): high = built from common constructions, low =
      unusual sequences (the perplexity direction, without floats);
    - ``n_rare``       — bigrams whose corpus count <= ``rare_max``
      (near-unique sequences: gibberish, OCR noise, or genuinely novel
      text).

    Deliberately ALL-INTEGER outputs: log-probabilities would make the
    score order-dependent (double sums) or rounding-boundary-fragile
    across engines (a ratio like S/128 lands exactly on a 6-decimal
    half boundary, where Spark's HALF_UP and a double nearbyint
    disagree — the class of bug the repo's decimal-sum policy exists
    for). Consumers threshold or divide driver-side.

    Scale shape: one explode + a doc-partitioned ``lead`` window for
    bigram pairs; corpus counts are a partial-aggregable groupBy; the
    score join is an equi-join on the bigram key (AQE handles hot
    bigrams); per-doc aggregation is map-side combinable.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w1"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    occ = toks.withColumn("w2", F.lead("w1").over(w)).filter(
        F.col("w2").isNotNull()
    )
    c12 = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    scored = occ.join(c12, ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.least(F.col("c12"), F.lit(support_cap))).alias("support_sum"),
        F.sum((F.col("c12") <= rare_max).cast("long")).alias("n_rare"),
    )


def save_eval_shingle_store(
    eval_docs: DataFrame, text_col: str, path: str, k: int = 5
) -> None:
    """Persist the held-out eval split's DISTINCT k-gram set — the
    ingest-time decontamination gate's reference data, built once per
    benchmark/eval refresh (the eval split is tiny and static; the
    ingest stream is not). Layout: a one-column ``shingle`` parquet
    table plus a ``_decon_meta.json`` sidecar recording the build
    ``k`` (underscore-prefixed, so Spark's file index ignores it);
    the probe refuses a mismatched k instead of silently matching
    nothing."""
    import json

    from sec_financial_pipeline_spark.operators.similarity import shingles
    from sec_financial_pipeline_spark.sources.sink import _hadoop_fs

    sh = (
        eval_docs.select(
            F.explode(shingles(F.col(text_col), k=k)).alias("shingle")
        )
        .distinct()
    )
    sh.write.mode("overwrite").parquet(path)
    fs, Path = _hadoop_fs(eval_docs.sparkSession, path)
    out = fs.create(Path(path.rstrip("/") + "/_decon_meta.json"), True)
    out.write(json.dumps({"k": k}).encode("utf-8"))
    out.close()


def _load_store_k(spark, path: str) -> int | None:
    import json

    from sec_financial_pipeline_spark.sources.sink import _hadoop_fs

    fs, Path = _hadoop_fs(spark, path)
    meta = Path(path.rstrip("/") + "/_decon_meta.json")
    if not fs.exists(meta):
        return None
    # copy Java-side: py4j passes a Python bytearray to InputStream.read
    # BY VALUE, so the filled bytes never come back — stream into a
    # ByteArrayOutputStream instead and take the byte[] return
    jvm = spark.sparkContext._jvm
    stream = fs.open(meta)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    data = bytes(baos.toByteArray())
    return int(json.loads(data.decode("utf-8"))["k"])


def contamination_vs_store(
    batch_docs: DataFrame,
    id_col: str,
    text_col: str,
    store_path: str,
    k: int = 5,
    hash_shingles: bool = False,
) -> DataFrame:
    """Ingest-time decontamination gate: per-batch-doc overlap counts
    against a persisted eval shingle store (:func:`save_eval_shingle_
    store`) — the streaming twin of :func:`ngram_contamination`, with
    the eval side loaded instead of re-shingled per batch. Same output
    contract (every batch row + ``n_overlap``); callers drop rows at
    their threshold before the batch enters the corpus. The two twins
    share the same probe tail (``_overlap_counts``), including the
    ``hash_shingles`` 100 TB knob with its pinned shuffle join.

    ``k`` must match the store's build k; the store's metadata sidecar
    makes a mismatch a hard ``ValueError`` instead of a silent
    all-zero result (every contaminated row would otherwise pass the
    gate). Scale shape: identical to the audit — semi join bounded by
    the batch side; the store scan is the small, static side."""
    spark = batch_docs.sparkSession
    store_k = _load_store_k(spark, store_path)
    if store_k is not None and store_k != k:
        raise ValueError(
            f"contamination_vs_store: store at {store_path} was built "
            f"with k={store_k}, probed with k={k} — a mismatch matches "
            f"nothing and would silently pass every contaminated row"
        )
    store = spark.read.parquet(store_path)
    return _overlap_counts(batch_docs, store, id_col, text_col, k, hash_shingles)


def edit_distance_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sim: float = 0.4,
) -> DataFrame:
    """Edit-distance-verified fuzzy duplicate pairs: the character-level
    verification modality of the dedup family (MinHash/Jaccard see
    token-set overlap; Levenshtein sees insertions/edits that keep word
    order — the classic verifier for template-with-substitutions dups).

    ``candidates`` is ``(id_a, id_b)`` from a BUCKETED generator (LSH
    bands, shared shingles) — the linear-output discipline every
    verifier in this family rides; this function never forms pairs
    itself. Each candidate joins both texts and scores

    - ``edit_dist``: plain Levenshtein distance (`F.levenshtein`, JVM
      whole-stage codegen — no Python in the loop), and
    - ``edit_sim = 1 - edit_dist / max(len_a, len_b)`` in [0, 1],

    keeping pairs with ``edit_sim >= min_sim``. Scale shape: two equi
    joins of the tiny candidate table against the corpus (AQE
    broadcasts the candidate side; the corpus is never self-joined),
    then a per-pair O(len_a * len_b) distance — linear in candidates,
    quadratic only in document LENGTH, which is why this is a verifier
    and never a generator. The division is a single IEEE double op of
    two exact integers, so Spark and an oracle engine agree bit-for-bit
    (unrounded by design — rounding is the only step two engines can
    disagree on)."""
    ta = docs.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("__text_a")
    )
    tb = docs.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("__text_b")
    )
    dist = F.levenshtein("__text_a", "__text_b").cast("bigint")
    sim = F.lit(1.0) - dist / F.greatest(
        F.length("__text_a"), F.length("__text_b")
    )
    return (
        candidates.select("id_a", "id_b")
        .join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            dist.alias("edit_dist"),
            sim.alias("edit_sim"),
        )
        .filter(F.col("edit_sim") >= min_sim)
    )
