"""Sequence packing for LM training data (SURVEY §2.9 north-star scope):
the concat-then-chunk layout — documents laid head-to-tail in a
deterministic total order, then split into fixed-size token windows.
Each document's global token OFFSET determines which training chunks it
lands in; the offsets are a prefix sum over the corpus.

The naive prefix sum is a window over a GLOBAL order — Spark executes an
un-partitioned window in ONE task, which is exactly the thing that dies
at 100 TB. This module computes the same exact offsets in two phases:

1. split the key space into range buckets and take per-bucket token
   subtotals — one tiny row per bucket;
2. cumulate the subtotals into per-bucket base offsets (a window over
   the subtotal table: hundreds of rows, not the corpus) and broadcast
   them back; each row's offset = bucket base + within-bucket running
   sum (a partitioned window — parallel).

Determinism (the round-3 red row, CORRECTNESS_r03 `doc_pack_chunks`):
the first build used ``repartitionByRange`` + ``spark_partition_id()``
and consumed that subtree TWICE — once aggregated into subtotals, once
as the stream side of the broadcast join. RangePartitioner draws a fresh
reservoir *sample* per evaluation and ``spark_partition_id`` is a
nondeterministic expression, so the two evaluations could disagree on
partition boundaries and add each row's base offset to the wrong
bucket's rows. This build assigns the bucket with a PURE expression over
driver-collected boundary literals: the boundary list is collected once
(a few KB — never the data), baked into the plan as literals, and every
re-evaluation of any subtree derives the identical bucket for a row from
its key alone. No sampling, no partition ids, no materialization barrier
needed.

Reference parity: the reference packs sequences in a single in-memory
pass (small corpus); this is the distributed re-expression of the same
offsets contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Driver-side boundary sample: bounded by SAMPLE_CAP keys regardless of
# data size — the collect is over ~n_part*OVERSAMPLE scalars, never rows.
_OVERSAMPLE = 32
_SAMPLE_CAP = 100_000


def range_bucket_bounds(
    df: DataFrame, order_col: str, n_buckets: int
) -> list:
    """Collect ``n_buckets - 1`` ascending boundary values of
    ``order_col`` from a bounded sample, for deterministic range
    bucketing. Returns a (possibly shorter) sorted list of distinct
    boundary literals; empty list means one bucket.

    The collect is tiny by construction: ``min(n_buckets * 32, 100k)``
    scalar keys — independent of corpus size, safe at 100 TB.

    Numeric order columns take the ``approxQuantile`` fast path — ONE
    Spark job instead of count + sample + collect. Quantile sketches
    are approximate and merge-order-dependent, which is fine here:
    bounds only steer bucket balance, never results (``pack_offsets``'
    two-phase sum is exact under ANY bucket assignment).
    """
    if n_buckets <= 1:
        return []
    dtype = df.schema[order_col].dataType.typeName()
    if dtype in ("byte", "short", "integer", "long", "float", "double"):
        probs = [i / n_buckets for i in range(1, n_buckets)]
        qs = df.stat.approxQuantile(order_col, probs, 0.01)
        cast = int if dtype in ("byte", "short", "integer", "long") else float
        bounds: list = []
        for q in qs:
            b = cast(q)
            if not bounds or b > bounds[-1]:
                bounds.append(b)
        return bounds
    target = min(n_buckets * _OVERSAMPLE, _SAMPLE_CAP)
    total = df.count()
    if total == 0:
        return []
    fraction = min(1.0, target / total)
    sampled = [
        r[0]
        for r in df.select(order_col).sample(fraction, seed=7).collect()
        if r[0] is not None
    ]
    if not sampled:
        return []
    sampled.sort()
    # evenly spaced quantiles of the sample; dedupe keeps them ascending
    bounds: list = []
    for i in range(1, n_buckets):
        b = sampled[min(len(sampled) - 1, i * len(sampled) // n_buckets)]
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds


def bucket_expr(order_col: str, bounds: list) -> Column:
    """Deterministic range-bucket id: the count of boundaries <= the
    key. A pure function of the row's key and literal boundaries — every
    physical re-evaluation agrees, unlike ``spark_partition_id()``."""
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.size(F.filter(arr, lambda b: b <= F.col(order_col)))


def pack_offsets(
    df: DataFrame,
    order_col: str,
    size_col: str,
    chunk_tokens: int,
    num_partitions: int | None = None,
    reuse: dict | None = None,
) -> DataFrame:
    """Add ``offset`` (global start position in the concatenated token
    stream), ``first_chunk`` and ``last_chunk`` (the fixed-size windows
    of ``chunk_tokens`` this row's span [offset, offset+size) touches).

    ``order_col`` must be a unique total order (document id); ``size_col``
    an integer token count. Zero-size rows get their boundary offset and
    span their containing chunk only.

    EAGER BY DESIGN: calling this function runs two bounded Spark jobs
    at plan-build time (boundary sampling, capped at ``_SAMPLE_CAP``
    rows, and the per-bucket subtotal collect of <= n_part scalars)
    before the returned plan ever executes — so ``explain()``/schema
    checks on a packing query do real work, and the input is scanned
    once more by the final plan. This is the intended tradeoff: the
    lazy alternatives (a subtotal window, or a broadcast one-row
    prefix-array join) reintroduce exactly the unpartitioned-window /
    cartesian shapes the plan audit bans. The extra scans read only
    the column-pruned ``(order_col, size_col)`` projection, a small
    fraction of corpus bytes under parquet pruning.

    ``reuse`` (VERDICT r7 item 2) amortizes those plan-build jobs for
    callers that pack the SAME immutable input repeatedly (a serving
    layer, the bench): pass a caller-owned dict and the boundary
    literals + per-bucket base offsets computed on the first call are
    stored in it and read back on later calls — zero plan-build jobs
    warm. The caller owns the cache key (input identity + n_part +
    sizes); passing a stale memo against changed data silently corrupts
    offsets, so key it the way ``registry/llm_text._pack_reuse`` does
    (source-file mtime + config).
    """
    n_part = num_partitions or max(
        1, df.sparkSession.sparkContext.defaultParallelism
    )
    if reuse is not None and "bounds" in reuse:
        bounds = reuse["bounds"]
    else:
        bounds = range_bucket_bounds(df, order_col, n_part)
        if reuse is not None:
            reuse["bounds"] = bounds
    bucketed = df.withColumn("__bkt", bucket_expr(order_col, bounds))
    if reuse is not None and "bases" in reuse:
        base_rows = reuse["bases"]
    else:
        # phase 1: per-bucket subtotals (tiny: one row per bucket)
        subtotals = bucketed.groupBy("__bkt").agg(
            F.sum(F.col(size_col).cast("long")).alias("__bsum")
        )
        # phase 2: base offset per bucket — an exact cumulative sum over
        # the collected subtotals. The collect is <= n_part scalar rows
        # (cluster parallelism, not corpus size), so this stays
        # driver-safe at 100 TB and leaves the plan with ZERO
        # unpartitioned windows.
        sub_rows = sorted(subtotals.collect(), key=lambda r: r["__bkt"])
        base_rows, running = [], 0
        for r in sub_rows:
            base_rows.append((int(r["__bkt"]), running))
            running += int(r["__bsum"] or 0)
        if reuse is not None:
            reuse["bases"] = base_rows
    bases = df.sparkSession.createDataFrame(
        base_rows, "__bkt int, __base long"
    )
    # within-bucket running sum (partitioned window — parallel),
    # exclusive of the current row
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.col("__base") + F.coalesce(
        F.sum(F.col(size_col).cast("long")).over(w_in), F.lit(0)
    )
    span_end = offset + F.greatest(F.col(size_col).cast("long"), F.lit(1)) - 1
    return (
        bucketed.join(F.broadcast(bases), "__bkt")
        .withColumn("offset", offset)
        .withColumn("first_chunk", (F.col("offset") / chunk_tokens).cast("long"))
        .withColumn("last_chunk", (span_end / chunk_tokens).cast("long"))
        .drop("__bkt", "__base")
    )


def length_bucketed_batches(
    df: DataFrame,
    order_col: str,
    size_col: str,
    token_budget: int,
    pad_multiple: int = 64,
    max_batch_rows: int | None = None,
) -> DataFrame:
    """Padded-batch assembly — the OTHER standard training-data layout
    beside concat-then-chunk: documents are padded to a length band and
    grouped into batches under a token budget, so a dataloader reads
    (batch -> rows) with bounded padding waste and bounded batch
    memory. fairseq-style length bucketing, made deterministic and
    distributed:

    - ``band``      = size rounded UP to the next ``pad_multiple``
      (integer math — exact on any engine, unlike float log2 bands);
      the band IS the padded per-row cost.
    - ``capacity``  = how many rows fit a batch:
      ``max(floor(token_budget / band), 1)`` (an over-budget document
      gets a solo batch rather than vanishing), optionally capped by
      ``max_batch_rows``.
    - ``batch_no``  = ``floor((rank - 1) / capacity)`` where rank is
      the row's position within its band ordered by ``order_col`` — a
      pure function of (band, key order), so the same batches come out
      on any cluster layout. Batch identity is ``(band, batch_no)``.

    Per-batch guarantee: ``count <= capacity`` and, for bands within
    budget, ``count * band <= token_budget``.

    Scale shape: one partitioned window per band (rank within band) —
    bands are few and balanced by construction; no global sort, no
    driver state. Output adds ``band``/``padded_tokens``/``batch_no``/
    ``batch_capacity``.
    """
    band = (
        (F.ceil(F.col(size_col).cast("long") / pad_multiple) * pad_multiple)
        .cast("long")
    )
    band = F.greatest(band, F.lit(pad_multiple).cast("long"))
    capacity = F.greatest(
        F.floor(F.lit(token_budget) / F.col("band")).cast("long"), F.lit(1)
    )
    if max_batch_rows is not None:
        capacity = F.least(capacity, F.lit(max_batch_rows).cast("long"))
    w = Window.partitionBy("band").orderBy(order_col)
    return (
        df.withColumn("band", band)
        .withColumn("batch_capacity", capacity)
        .withColumn(
            "batch_no",
            F.floor((F.row_number().over(w) - 1) / F.col("batch_capacity")),
        )
        .withColumn("padded_tokens", F.col("band"))
    )


def assemble_chunks(
    packed: DataFrame, size_col: str, chunk_tokens: int
) -> DataFrame:
    """The inverse view of :func:`pack_offsets` — what a training-data
    loader consumes: for every fixed-size chunk, the ordered document
    slices that fill it.

    Input is ``pack_offsets`` output (``offset``/``first_chunk``/
    ``last_chunk`` present). Each row explodes into its touched chunks —
    a BOUNDED explode (a document of ``n`` tokens spans at most
    ``n // chunk_tokens + 2`` chunks), so the expansion is linear in
    total corpus tokens, never quadratic: safe at 100 TB. Output grain is
    (chunk_id, doc_id) with:

    - ``chunk_off``  — where the slice starts inside the chunk;
    - ``doc_start``  — where the slice starts inside the document;
    - ``slice_len``  — tokens taken from this document for this chunk.

    Per-chunk ``sum(slice_len)`` is ``chunk_tokens`` for every interior
    chunk (the final chunk holds the remainder), which is the
    reconciliation invariant against the pack-offsets totals.
    """
    cs = F.col("chunk_id") * chunk_tokens
    start = F.greatest(F.col("offset"), cs)
    end = F.least(F.col("offset") + F.col(size_col).cast("long"), cs + chunk_tokens)
    exploded = packed.withColumn(
        "chunk_id", F.explode(F.sequence("first_chunk", "last_chunk"))
    )
    return exploded.select(
        "chunk_id",
        *packed.columns,
        (start - cs).alias("chunk_off"),
        (start - F.col("offset")).alias("doc_start"),
        (end - start).alias("slice_len"),
    )
