"""Distributed unigram-LM (SentencePiece-style) tokenizer training —
the EM sibling of BPE (Kudo 2018, arXiv:1804.10959; ``operators/
bpe.py`` is Sennrich 2016 — together they are the two vocabularies a
real training-data pipeline learns). Hard-EM (Viterbi) variant: the
E-step segments each DISTINCT word with the current piece scores, the
M-step re-scores pieces from freq-weighted usage counts.

Why this shape scales to 100 TB (the same reduction as BPE):

- **Training runs on the word-frequency table, not the corpus.** One
  corpus-wide shuffle collapses 100 TB to its distinct-word table;
  every EM iteration touches ONLY that table.
- **The E-step is a codegen'd fold, not a UDF.** Viterbi over a word's
  positions is sequential — but over a SMALL bounded sequence (words
  capped at ``max_word_len`` chars), which is exactly what
  ``F.aggregate`` expresses JVM-side. Candidate edges come from a span
  explode joined (broadcast) against the piece-score table, collected
  per word as a bounded array.
- **The M-step is one shuffled aggregation** (explode used pieces,
  groupBy piece, freq-weighted sum). The piece table never collects to
  the driver during training.
- **Integer milli-nat scores** (the ``operators/lm.py`` firewall): JVM
  and libm ``ln`` agree on integers' logarithms up to 1 ulp; rounding
  each ``ln(count) - ln(total)`` to an integer once makes every
  Viterbi total an exact BIGINT sum — order-independent,
  partition-count-independent, and replayable bit-for-bit by a DuckDB
  oracle that unrolls the same positions/iterations in SQL.

Determinism contract (mirrored by the oracle in
``registry/llm_text.py``):

- words are whitespace-split and TRUNCATED to ``max_word_len`` chars
  before counting;
- the seed vocabulary is every substring of length 2..``max_piece_len``
  with freq-weighted occurrence count >= ``min_seed_count``, plus ALL
  single characters (coverage guarantee);
- Viterbi ties break toward the LONGER piece (larger last-step m);
  equal totals at equal m are the same piece, so the argmax is total
  order — ``array_max`` over (total, m) structs;
- after each M-step, single-character pieces are floored at count 1
  (add-one smoothing only where coverage needs it) and zero-count
  multi-char pieces drop out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ASCII-whitespace split, same contract as operators/bpe.py.
_WORD_SPLIT = r"\s+"


def _milli_ln_ratio(cnt: Column, total: Column) -> Column:
    """``round(1000 * (ln(cnt) - ln(total)))`` as BIGINT — both engines
    take ln of exact integers, the round happens once."""
    return F.round(
        (F.log(cnt.cast("double")) - F.log(total.cast("double"))) * 1000.0
    ).cast("long")


def unigram_words(
    df: DataFrame, text_col: str, max_word_len: int = 12
) -> DataFrame:
    """``(word, freq)`` with words truncated to ``max_word_len`` chars
    — the one corpus-wide shuffle unigram training ever does."""
    return (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), _WORD_SPLIT)
            ).alias("w0")
        )
        .filter(F.col("w0") != "")
        .select(F.substring("w0", 1, max_word_len).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _spans(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(word, freq, i, m, piece) for every start position ``i`` and
    span length ``m <= max_piece_len`` — the candidate-edge universe
    for both seeding and the E-step. Bounded: <= len * M rows per
    word."""
    return words.select(
        "word",
        "freq",
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(1, length(word)), i ->
                  transform(sequence(1, least({max_piece_len},
                                              length(word) - i + 1)), m ->
                    struct(i AS i, m AS m,
                           substring(word, i, m) AS piece))))
                """
            )
        ).alias("e"),
    ).select("word", "freq", "e.i", "e.m", "e.piece")


def _with_scores(counts: DataFrame) -> DataFrame:
    """(piece, cnt, score): milli-nat log-prob against the table's own
    total. The total rides in as a broadcast 1-row join (no collect)."""
    total = counts.agg(F.sum("cnt").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt",
        _milli_ln_ratio(F.col("cnt"), F.col("__total")).alias("score"),
    )


def seed_counts(
    words: DataFrame, max_piece_len: int = 3, min_seed_count: int = 2
) -> DataFrame:
    """Seed vocabulary counts: freq-weighted substring occurrences
    (overlaps counted), multi-char pieces gated at ``min_seed_count``,
    single chars always kept."""
    return (
        _spans(words, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .filter(
            (F.length("piece") == 1) | (F.col("cnt") >= min_seed_count)
        )
    )


def _viterbi_segment(words: DataFrame, scores: DataFrame,
                     max_piece_len: int) -> DataFrame:
    """Shared Viterbi core of the E-step AND the apply path:
    (word, freq, pieces) with ``pieces`` the word's best segmentation
    under ``scores`` in FORWARD order. All JVM-side: span explode ->
    broadcast join -> per-word edge array -> forward fold (best totals
    + backpointers) -> backtrace fold."""
    edges = (
        _spans(words, max_piece_len)
        .join(F.broadcast(scores.select("piece", "score")), "piece")
        .select(
            "word",
            "freq",
            (F.col("i") + F.col("m") - 1).alias("end"),
            "m",
            F.col("score").alias("s"),
        )
    )
    # r14: hash-repartition on the group keys with an EXPLICIT partition
    # count before the aggregation. The per-word byte volume here is
    # tiny, so AQE's size-targeted coalescing folds the agg output to
    # ONE partition — and the expensive part of this plan, the
    # per-word Viterbi forward/backtrace folds projected right after
    # the agg, then runs serial on a single core (measured: the whole
    # EM loop at 1 task/job). An explicit numPartitions is exempt from
    # AQE coalescing, satisfies the agg's ClusteredDistribution (no
    # second exchange), and parallelizes the folds; the count tracks
    # the session's core budget, so it stays right-sized when the
    # driver re-benches at lower core counts and on a real cluster.
    n_part = max(1, words.sparkSession.sparkContext.defaultParallelism)
    g = edges.repartition(n_part, "word", "freq").groupBy("word", "freq").agg(
        F.sort_array(F.collect_list(F.struct("end", "m", "s"))).alias("es")
    )

    def _cand(acc, i, m):
        # total score of reaching position i via a final piece of
        # length m: best[i-m] + score(word[i-m+1 .. i]); NULL if the
        # piece is unscored or m > i
        s = F.get(
            F.filter(
                F.col("es"),
                lambda e: (e["end"] == i) & (e["m"] == F.lit(m)),
            ),
            0,
        )["s"]
        prev = (
            F.when(i == F.lit(m), F.lit(0).cast("long"))
            .when(i > F.lit(m), F.element_at(acc, (i - F.lit(m))
                                             .cast("int"))["b"])
        )
        return F.struct(
            (prev + s).alias("b"), F.lit(m).alias("bm")
        )

    def _step(acc, i):
        cands = F.filter(
            F.array(*[_cand(acc, i, m) for m in range(1, max_piece_len + 1)]),
            lambda c: c["b"].isNotNull(),
        )
        return F.concat(acc, F.array(F.array_max(cands)))

    vit = g.withColumn(
        "vit",
        F.aggregate(
            F.sequence(F.lit(1), F.length("word")),
            F.array().cast("array<struct<b: bigint, bm: int>>"),
            _step,
        ),
    )

    def _back(st, _):
        pos = st["pos"]
        bm = F.element_at(F.col("vit"), pos.cast("int"))["bm"]
        piece = F.substring(F.col("word"), pos - bm + 1, bm)
        return F.when(pos <= 0, st).otherwise(
            F.struct(
                (pos - bm).alias("pos"),
                F.concat(st["ps"], F.array(piece)).alias("ps"),
            )
        )

    segged = vit.withColumn(
        "pieces",
        F.aggregate(
            F.sequence(F.lit(1), F.length("word")),
            F.struct(
                F.length("word").cast("int").alias("pos"),
                F.array().cast("array<string>").alias("ps"),
            ),
            _back,
            # the backtrace appends from the END of the word backward,
            # so reverse once to hand callers forward reading order
            lambda st: F.reverse(st["ps"]),
        ),
    )
    return segged.select("word", "freq", "pieces")


def _viterbi_pieces(words: DataFrame, scores: DataFrame,
                    max_piece_len: int) -> DataFrame:
    """E-step: (word, freq, piece) — one row per piece USE in each
    word's best segmentation under ``scores`` (order-insensitive: the
    M-step only counts uses)."""
    return _viterbi_segment(words, scores, max_piece_len).select(
        "word", "freq", F.explode("pieces").alias("piece")
    )


def train_unigram(
    df: DataFrame,
    text_col: str,
    iters: int = 2,
    max_piece_len: int = 3,
    max_word_len: int = 12,
    min_seed_count: int = 2,
) -> DataFrame:
    """Learn unigram piece scores by ``iters`` rounds of Viterbi-EM.
    Returns the final ``(piece, cnt, score)`` table (distributed; the
    caller ranks/caps it). ``cnt`` after an M-step is the freq-weighted
    number of times the piece was used in best segmentations (floored
    at 1 for single chars)."""
    # eager localCheckpoint, NOT persist+unpersist-in-finally (review
    # finding): nothing in this function runs an action on the lazy EM
    # plan, so a finally-scoped unpersist evicted the cache BEFORE the
    # caller's first action and every one of the word table's many
    # occurrences in the unrolled plan (seed counts, chars, two per EM
    # iteration) re-ran the corpus-wide word-frequency shuffle. The
    # checkpointed table is tiny (distinct words + freqs) and also
    # truncates the per-iteration plan growth at its leaves — the same
    # pattern as operators/bpe.py and operators/components.py.
    # r14: spread the checkpointed word table across the core budget —
    # the word-frequency aggregation is kilobytes at any SF, so AQE
    # coalesces it to one partition, and every downstream span explode
    # (seeding + 2x per EM iteration) then ran serial off the 1-partition
    # checkpoint. The word table is vocabulary-sized (distinct truncated
    # words), so defaultParallelism partitions stay right-sized at scale.
    n_part = max(1, df.sparkSession.sparkContext.defaultParallelism)
    words = unigram_words(df, text_col, max_word_len).repartition(
        n_part
    ).localCheckpoint(eager=True)
    chars = (
        words.select(
            F.explode(F.split(F.col("word"), "")).alias("piece")
        )
        .filter(F.col("piece") != "")
        .distinct()
    )
    # r14: each EM round's count table is localCheckpoint'ed (eager).
    # Without it the loop builds one NESTED lazy plan: `_with_scores`
    # references its input twice (the 1-row total aggregate + the main
    # side), and the Viterbi fold's HOF lambdas carry
    # NamedLambdaVariable, so no two occurrences ever canonicalize
    # equal and ReusedExchange cannot dedupe them — iteration i's
    # E-step then re-executes every earlier round's E+M chain
    # MULTIPLE times (measured: the 2-round loop re-ran the round-1
    # chain ~4x inside round 2's plans; checkpointing cut the row from
    # 10.9s to 3.2s noop at sf0.1). The table is piece-vocabulary-
    # sized — the model, not the corpus — so the materialization is
    # kilobytes at any SF.
    counts = seed_counts(words, max_piece_len, min_seed_count).localCheckpoint(
        eager=True
    )
    for _ in range(iters):
        scores = _with_scores(counts)
        used = (
            _viterbi_pieces(words, scores, max_piece_len)
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
        )
        # coverage floor: every single char survives with >= 1
        counts = (
            used.join(chars.withColumn("__c", F.lit(1)), "piece",
                      "full_outer")
            .select(
                "piece",
                F.when(
                    F.col("__c").isNotNull(),
                    F.greatest(F.coalesce("cnt", F.lit(0)), F.lit(1)),
                )
                .otherwise(F.col("cnt"))
                .cast("long")
                .alias("cnt"),
            )
            .filter(F.col("cnt") > 0)
            .localCheckpoint(eager=True)
        )
    return _with_scores(counts)


def unigram_report(
    df: DataFrame,
    text_col: str,
    top_k: int = 64,
    iters: int = 2,
    max_piece_len: int = 3,
    max_word_len: int = 12,
    min_seed_count: int = 2,
) -> DataFrame:
    """Bounded report for the oracle row: the ``top_k`` pieces by
    (cnt desc, piece asc) with their milli-nat scores and rank.
    Heap top-k first (``orderBy().limit`` = TakeOrderedAndProject — no
    global sort), then rank as a preceding-row count over the BOUNDED
    winner set (broadcast self-join), so the plan carries zero
    unpartitioned WindowExecs — the registry-wide plan gate."""
    scored = train_unigram(
        df, text_col, iters=iters, max_piece_len=max_piece_len,
        max_word_len=max_word_len, min_seed_count=min_seed_count,
    )
    top = scored.orderBy(
        F.col("cnt").desc(), F.col("piece").asc()
    ).limit(top_k)
    prev = top.select(
        F.col("cnt").alias("__c2"), F.col("piece").alias("__p2")
    )
    precedes = (F.col("__c2") > F.col("cnt")) | (
        (F.col("__c2") == F.col("cnt")) & (F.col("__p2") < F.col("piece"))
    )
    return (
        top.join(F.broadcast(prev), precedes, "left")
        .groupBy("piece", "cnt", "score")
        .agg((F.count("__p2") + 1).cast("int").alias("rank"))
        .select("rank", "piece", "cnt", "score")
    )


#: Apply-time fallback score (milli-nats) for single characters the
#: trained vocabulary never saw: far below any real log-prob (a real
#: piece's floor is ln(1/total)*1000 ~ -14000 at 1M-piece totals), so
#: an UNK char is only ever used when no trained piece covers the
#: position — SentencePiece's <unk> with a fixed penalty, made exact.
UNK_SCORE = -1_000_000


def augment_unk_chars(words: DataFrame, scores: DataFrame) -> DataFrame:
    """Total-coverage guarantee for the apply path: any single char in
    ``words`` missing from the trained single-char pieces joins the
    score table at ``UNK_SCORE`` (cnt 0). The trainer guarantees
    coverage of its OWN sample's chars; apply-time text is a superset
    (train on a sample, tokenize the corpus — the Kudo 2018 deployment
    shape), so coverage must be re-established against the apply words
    or Viterbi has no path."""
    chars = (
        words.select(F.explode(F.split(F.col("word"), "")).alias("piece"))
        .filter(F.col("piece") != "")
        .distinct()
    )
    unk = chars.join(
        scores.filter(F.length("piece") == 1).select("piece"),
        "piece",
        "left_anti",
    ).select(
        "piece",
        F.lit(0).cast("long").alias("cnt"),
        F.lit(UNK_SCORE).cast("long").alias("score"),
    )
    return scores.select("piece", "cnt", "score").unionByName(unk)


def apply_unigram(
    df: DataFrame,
    id_col: str,
    text_col: str,
    scores: DataFrame,
    max_piece_len: int = 3,
    max_word_len: int = 12,
) -> DataFrame:
    """Tokenize a corpus with a TRAINED piece table — the inference
    half of Kudo 2018 and the part that actually runs at 100 TB (train
    once on a sample, apply to everything; the BPE twin is
    ``operators/bpe.py::apply_bpe``). Returns one row per emitted
    token: ``(id_col, widx, pidx, piece, score)`` — word index within
    the document (1-based over the whitespace split), piece index
    within the word's segmentation (1-based, forward order), the piece
    and its trained milli-nat score (``UNK_SCORE`` for fallback
    chars).

    Scale shape — the same reduction as training: Viterbi runs ONCE
    per DISTINCT (truncated) word, never per occurrence; occurrences
    then pick up their segmentation by an equi-join on the word (the
    distinct-word table is corpus-vocabulary-sized, so at 100 TB this
    is a shuffled join both sides partitioned by word; locally AQE
    broadcasts it). The per-word fold is bounded by ``max_word_len``
    positions x ``max_piece_len`` candidates — constant work per
    distinct word. Words are truncated to ``max_word_len`` chars
    BEFORE segmenting (the trainer's normalization contract: train and
    apply must see the same word space), so the round-trip invariant
    is concat(pieces) == substring(word, 1, max_word_len)."""
    inst = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.trim(F.col(text_col)), _WORD_SPLIT)
            ).alias("widx0", "w0"),
        )
        .filter(F.col("w0") != "")
        .select(
            id_col,
            (F.col("widx0") + 1).cast("int").alias("widx"),
            F.substring("w0", 1, max_word_len).alias("word"),
        )
    )
    # r15: no outer spread here — the fold parallelism this path needs
    # comes from the hash repartition on the group keys INSIDE
    # _viterbi_segment (it satisfies the agg's ClusteredDistribution,
    # so the expensive per-word folds already run on
    # defaultParallelism partitions). The r14 round-robin
    # repartition(n_part) on top of it was a second exchange plus a
    # sort-before-repartition of the vocab that the driver's bench
    # measured as a 0.62->1.07s regression (+6 stages) with no fold
    # work moved.
    vocab = inst.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    scores_aug = augment_unk_chars(vocab, scores)
    segs = _viterbi_segment(vocab, scores_aug, max_piece_len).select(
        "word", "pieces"
    )
    toks = (
        inst.join(segs, "word")
        .select(
            id_col,
            "widx",
            F.posexplode("pieces").alias("pidx0", "piece"),
        )
        .select(
            id_col,
            "widx",
            (F.col("pidx0") + 1).cast("int").alias("pidx"),
            "piece",
        )
    )
    return toks.join(
        F.broadcast(scores_aug.select("piece", "score")), "piece"
    ).select(id_col, "widx", "pidx", "piece", "score")
