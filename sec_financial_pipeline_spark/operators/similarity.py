"""Similarity-search and near-duplicate operators (SURVEY §2.9).

Engine-independent determinism is part of the design: every hash is
md5-based (identical in any engine), every float ranking is rounded
before comparison, and every top-k has an id tie-breaker. All operators
are pure DataFrame compositions — array expressions inside codegen, no
Python UDFs — and are written so the expensive joins are bucketed
(LSH band / hash bucket) rather than all-pairs at scale.

Scale notes (100 TB posture):
- MinHash-LSH: candidate generation is an equi-join on band hash — a
  shuffle on band key; band size r and band count b tune the
  precision/recall vs shuffle-width trade-off.
- SimHash: near-pair detection is the pigeonhole block join (d+1
  signature blocks, equi-join per block, bit_count(xor) verify) — a
  hash shuffle on (block_no, block_value), never an all-pairs theta
  join.
- Cosine ANN: brute force is the baseline (O(Q x N) with broadcast
  queries); the bucketed variant projects onto fixed hyperplanes and
  joins on the sign-bucket, cutting candidates by ~2^bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Embedding math (arrays of float -> double expressions, JVM-side)
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------------------
# MinHash signatures (shingle -> md5 minima -> LSH bands)
# ---------------------------------------------------------------------------


def shingles(text: Column, k: int = 3, distinct: bool = True) -> Column:
    """Distinct k-word shingles of a single-space-tokenized text column.

    Built as a ``zip_with`` chain over the token array and its shifted
    slices, NOT as ``transform(sequence(...), i -> element_at(split(...),
    i))``: expressions referenced *inside* an HOF lambda are re-evaluated
    per element, so the naive form re-splits the text O(tokens) times per
    row (O(n^2) total — measured 7x slower). ``zip_with`` arguments are
    plain per-row expressions, evaluated once.
    """
    return token_shingles(F.split(text, " "), k=k, distinct=distinct)


def token_shingles(w: Column, k: int = 3, distinct: bool = True) -> Column:
    """k-word shingles of an already-tokenized array<string> column.

    Same ``zip_with`` shift-chain as :func:`shingles`, for callers that
    have hoisted the token array into its own projection (so the split
    happens once per row no matter how many features reference it).
    """
    cur = w
    for j in range(1, k):
        shifted = F.slice(w, j + 1, F.size(w))
        cur = F.zip_with(cur, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    sh = F.slice(cur, 1, F.greatest(F.size(w) - (k - 1), F.lit(0)))
    return F.array_distinct(sh) if distinct else sh


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    band_size: int = 4,
    k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature + LSH band hashes.

    Hash family: ``md5(seed || '#' || shingle)`` — engine-independent and
    uniform; the minimum over shingles is taken lexicographically on the
    hex string (total order, no ties across distinct shingles).

    Computed as a pure per-row array expression (``array_min`` over
    ``transform``) — NO explode, NO aggregation, NO shuffle: the
    signature stage is embarrassingly parallel and scales with the scan.
    Documents with no shingles (< k tokens) are dropped, matching the
    explode-based oracle formulation.
    """
    with_sh = df.select(
        F.col(id_col), shingles(F.col(text_col), k).alias("__sh")
    ).filter(F.size("__sh") > 0)
    # Materialize the shingle arrays through an exchange before fanning
    # out to n_hashes min-expressions: higher-order functions are
    # interpreted (never codegen'd) and Catalyst's projection collapse
    # would otherwise inline the shingle build into every one of the 16
    # expressions — a 17x recompute. The exchange writes the arrays once;
    # everything downstream reads materialized values.
    n_part = max(1, df.sparkSession.sparkContext.defaultParallelism)
    with_sh = with_sh.repartition(n_part)
    # SQL-text lambdas, NOT python-lambda F.transform: many Python-side
    # lambdas in one projection share NamedLambdaVariable bindings and
    # silently produce wrong values (observed on Spark 4.1); parsed SQL
    # lambdas get independent scopes.
    mins = [
        F.expr(
            f"array_min(transform(__sh, s -> md5(concat('{i}#', s))))"
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    sig = with_sh.select(F.col(id_col), *mins)
    return sig.select(id_col, *_band_exprs(n_hashes, band_size))


def _band_exprs(n_hashes: int, band_size: int) -> list:
    """LSH band hashes: md5 over each ``band_size`` run of signature mins."""
    return [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
            )
        ).alias(f"band{b}")
        for b in range(n_hashes // band_size)
    ]


def minhash_from_shingles(
    sh: DataFrame,
    id_col: str,
    shingle_col: str = "shingle",
    n_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """MinHash signatures + LSH bands from an already-exploded
    ``(id, shingle)`` table (distinct shingles per id).

    Same hash family (and bit-identical output) as
    ``minhash_signatures``, but as a flat groupBy of ``min(md5(...))``
    aggregates — partial-aggregable, whole-stage-codegen'd, and (the
    point) able to SHARE the exploded shingle table with a downstream
    Jaccard-verify join: when ``sh`` sits behind a ``repartition(id)``
    exchange, every consumer reads the one materialized shuffle instead
    of re-exploding the corpus (ReusedExchange).
    """
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col(shingle_col)))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*mins)
    return sig.select(id_col, *_band_exprs(n_hashes, band_size))


def lsh_candidate_pairs(signatures: DataFrame, id_col: str) -> DataFrame:
    """Distinct unordered candidate pairs sharing at least one LSH band.

    Equi-join per band (shuffle on the band key — never all-pairs). The
    band table is built with ONE ``posexplode`` pass over the signatures
    (a union of per-band projections would re-run the whole signature
    pipeline once per band) and materialized through a ``repartition``
    on the join key, so the self-join reuses a single exchange for both
    sides and needs no further shuffle.
    """
    stacked = band_table(signatures, id_col).repartition("band_no", "band_hash")
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Incremental near-dedup: persisted signature store + batch probe.
# At 100 TB the corpus' MinHash bands are NOT recomputed per ingest —
# they live in a parquet store, and each incoming batch is banded and
# probed against it. Pairs the full recompute would emit among
# old-old documents never surface (they were handled when those docs
# arrived); the incremental answer is exactly the full answer
# restricted to pairs touching >= 1 new document, because a document's
# bands are a pure function of its text (corpus-split-independent).
# ---------------------------------------------------------------------------


def band_table(signatures: DataFrame, id_col: str) -> DataFrame:
    """Long ``(id, band_no, band_hash)`` view of a wide signature table
    (one ``posexplode`` pass — the shape both the self-join and the
    persisted store use)."""
    band_cols = [c for c in signatures.columns if c.startswith("band")]
    return signatures.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.array(*[F.col(c) for c in band_cols])).alias(
            "band_no", "band_hash"
        ),
    )


def save_signature_store(
    signatures: DataFrame, id_col: str, path: str, nparts: int | None = None
) -> None:
    """Persist the corpus' band table, partitioned by ``band_no`` so a
    probe joins band-aligned files (and a band-shape retune invalidates
    visibly: the store carries its band count in its partition layout).

    ``nparts`` (r14, guide §6) bounds the writer-task count so a
    one-shot batch build emits byte-sized files instead of one file
    per upstream shuffle partition per band dir; streaming appends
    keep the default (their small-file debt is the compactor's job)."""
    bt = band_table(signatures, id_col)
    if nparts is not None:
        bt = bt.repartition(nparts, "band_no")
    bt.write.mode("overwrite").partitionBy("band_no").parquet(path)


def load_signature_store(spark, path: str, schema: str | None = None) -> DataFrame:
    """Open a persisted band-table store, first finishing or rolling
    back any swap (delete / compact) a crash left half-done —
    ``recover_swap`` acts only when nothing lives at the path (strict
    no-op on a healthy store; it never touches a writer's dirs).
    ``schema`` (r14): callers that know their store's layout pass it to
    skip the footer-inference job on the hot serve path; the id column
    type is caller-defined, so no default is assumed here."""
    from sec_financial_pipeline_spark.sources.sink import recover_swap

    recover_swap(spark, path)
    reader = spark.read if schema is None else spark.read.schema(schema)
    return reader.parquet(path)


def append_to_signature_store(
    signatures: DataFrame, id_col: str, path: str
) -> None:
    """Parquet-level ingest commit: append a batch's band rows into the
    existing store (new files inside the band_no partitions — existing
    files untouched). The production loop is probe → verify → drop →
    append the SURVIVORS, after which the next batch dedups against
    them too. Goes through ``append_partitioned`` so appending into a
    store a delete-all emptied restores the partitioned layout
    (delete + re-append = UPDATE)."""
    from sec_financial_pipeline_spark.sources.sink import append_partitioned

    append_partitioned(band_table(signatures, id_col), path, ("band_no",))


def incremental_candidate_pairs(
    batch_sigs: DataFrame, id_col: str, store: DataFrame
) -> DataFrame:
    """Distinct candidate pairs involving >= 1 batch document: the
    store-probe equi-join on ``(band_no, band_hash)`` plus the
    within-batch self-join. Output is id-normalized
    ``(id_a < id_b)`` — identical to what a full recompute over
    store ∪ batch would emit, minus the store-internal pairs.

    Scale shape: the probe is an equi-join on ``(band_no, band_hash)``
    whose small side is the batch band table; the join strategy is left
    to the planner/AQE (a small batch broadcasts under the size
    threshold, a huge ingest batch degrades to a shuffle hash join
    instead of a broadcast OOM); no store self-join ever runs.
    """
    # ONE materialized band table feeds the store probe (via a
    # broadcast on top of the exchange) AND both self-join sides
    # (ReusedExchange) — otherwise the signature pipeline (16 HOF
    # min-hash expressions per doc) is recomputed per consumer.
    stacked = band_table(batch_sigs, id_col).repartition("band_no", "band_hash")
    return _pairs_batch_vs_store(stacked, store)


def _pairs_batch_vs_store(stacked: DataFrame, store: DataFrame) -> DataFrame:
    """Core of incremental candidate generation, hash-family-agnostic:
    ``stacked`` (the batch) and ``store`` are long
    ``(id, band_no, band_hash)`` tables with matching hash types —
    md5-string MinHash bands or integer sign-LSH buckets alike."""
    s = store.select("id", "band_no", "band_hash")
    store_batch = (
        s.alias("a")
        .join(
            stacked.alias("b"),
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
        )
        .distinct()
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    within_batch = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return store_batch.unionByName(within_batch).distinct()


def _sign_code_bands(codes: DataFrame, id_col: str) -> DataFrame:
    """Sign-LSH ``(id, band, bucket)`` codes renamed onto the shared
    band-table contract (bucket stays an integer — the probe core is
    hash-type-agnostic as long as both sides agree)."""
    return codes.select(
        F.col(id_col).alias("id"),
        F.col("band").alias("band_no"),
        F.col("bucket").alias("band_hash"),
    )


def save_sign_code_store(codes: DataFrame, id_col: str, path: str) -> None:
    """Persist an embedding corpus' sign-LSH codes as an incremental
    store — the vector twin of :func:`save_signature_store`. Append
    new batches' codes with mode ``append`` on the same layout."""
    _sign_code_bands(codes, id_col).write.mode("overwrite").partitionBy(
        "band_no"
    ).parquet(path)


def _ids_df(spark, ids, col: str, like: DataFrame | None = None) -> DataFrame:
    """Normalize a deletion id set — a Python list OR a one-column
    DataFrame — into a distinct single-column DataFrame named ``col``.
    Deletion then runs as a ``left_anti`` join (broadcast under the
    threshold, shuffled above it) instead of a literal
    ``~isin([...])`` In-expression: a million-id GDPR batch as
    literals inflates the plan tree and the codegen'd predicate,
    while the anti-join shape is flat at any id count.

    ``like`` is the store DataFrame whose ``col`` type the ids must
    carry: the id column is whatever type the caller built the store
    with (string doc-ids are first-class), so the type is inferred
    from the TARGET, never hardcoded — a list of strings against a
    string-id store must not hit a bigint cast."""
    tgt = dict(like.dtypes).get(col) if like is not None else None
    if isinstance(ids, DataFrame):
        src = ids.columns[0]
        out = ids.select(F.col(src).alias(col)).distinct()
    else:
        ids = list(ids)
        if not ids:
            return spark.createDataFrame([], f"{col} {tgt or 'bigint'}")
        out = spark.createDataFrame([(i,) for i in ids], [col]).distinct()
    if tgt is not None:
        out = out.select(F.col(col).cast(tgt).alias(col))
    return out


def delete_from_store(spark, path: str, ids) -> int:
    """Remove documents/vectors from a persisted band-table store (the
    right-to-be-forgotten path a training-data pipeline owes its
    sources): rewrite the store minus the given ids via
    ``sources/sink.py::swap_rewrite`` (crash-safe two-rename swap over
    the Hadoop FS API — works on remote stores, survives deleting the
    last row). ``ids`` is a Python list or a one-column DataFrame; the
    deletion predicate is a ``left_anti`` join either way (see
    :func:`_ids_df`). Returns rows remaining. Works on both the MinHash
    signature store and the sign-LSH code store (same
    (id, band_no, band_hash) layout)."""
    from sec_financial_pipeline_spark.sources.sink import (
        recover_swap,
        swap_rewrite,
    )

    recover_swap(spark, path)  # retrying a crashed delete self-heals
    store = spark.read.parquet(path)
    kept = store.join(_ids_df(spark, ids, "id", like=store), "id", "left_anti")
    swap_rewrite(kept, path, ("band_no",))
    return spark.read.parquet(path).count()


def incremental_sign_pairs(
    batch_codes: DataFrame, id_col: str, store: DataFrame
) -> DataFrame:
    """Embedding twin of :func:`incremental_candidate_pairs`: a new
    batch's sign-LSH codes probed against the persisted code store
    plus the within-batch self-join — the full recompute's pair set
    restricted to pairs touching >= 1 batch vector (codes are a pure
    per-vector function of the fixed hyperplanes).

    CALLER CONTRACT: pass ``batch_codes`` persisted (and ideally
    materialized). Unlike the MinHash path, the repartition exchange
    here CANNOT be deduped by ReusedExchange when ``batch_codes`` is a
    live ``sign_lsh_bands`` plan: its HOF lambdas (NamedLambdaVariable)
    never canonicalize equal (see ``sign_lsh_candidate_pairs``), so the
    three consumers inside the probe would each re-run the
    crossJoin+groupBy code build. Persisting INSIDE this function
    would leak a cache entry per batch in a long-running ingest (the
    handle is internal, so the caller could never release it) — the
    repo-wide pattern is caller-managed persist/unpersist around the
    probe, as ``streaming/ingest.py::ingest_batch`` does for the
    MinHash twin."""
    stacked = _sign_code_bands(batch_codes, id_col).repartition(
        "band_no", "band_hash"
    )
    return _pairs_batch_vs_store(stacked, store)


# ---------------------------------------------------------------------------
# Banded sign-projection LSH (random-hyperplane LSH with MinHash-style bands)
# ---------------------------------------------------------------------------


def sign_lsh_bands(
    df: DataFrame,
    id_col: str,
    planes: DataFrame,
    bits_per_band: int,
    emb_col: str = "emb",
) -> DataFrame:
    """Per-vector banded sign-LSH codes: long ``(id, band, bucket)`` table.

    ``planes`` is a small ``(h_id, h_emb)`` table of hyperplanes with
    0-based contiguous ``h_id``; plane ``h_id`` contributes bit
    ``h_id % r`` of band ``h_id // r`` (r = ``bits_per_band``). The
    projection sign is taken on the 6-decimal-rounded dot product so any
    engine computing the same fold agrees on boundary cases.

    This is the AND/OR construction of random-hyperplane LSH (Charikar,
    STOC'02) with the same band shape as the MinHash side: r bits AND-ed
    into one bucket per band, b bands OR-ed at candidate time. Scale
    tuning: expected bucket occupancy is N / 2^r, so pick
    r ~ log2(N / c) to hold per-bucket candidates at c^2 — the quadratic
    blow-up of a single fixed-width code table cannot happen because r
    grows with the corpus while recall is recovered by adding bands
    (P[candidate] = 1 - (1 - p^r)^b, p = 1 - theta/pi for angle theta).

    The plane table is broadcast; the code build is one partial-aggregable
    groupBy — no vector ever crosses the driver.
    """
    proj = df.crossJoin(F.broadcast(planes)).select(
        F.col(id_col).alias("id"),
        (F.col("h_id") / bits_per_band).cast("int").alias("band"),
        (F.col("h_id") % bits_per_band).alias("bit"),
        F.round(dot(F.col(emb_col), F.col("h_emb")), 6).alias("d"),
    )
    bucket = F.sum(
        F.when(F.col("d") > 0, F.pow(F.lit(2.0), F.col("bit"))).otherwise(0.0)
    ).cast("int")
    return (
        proj.groupBy("id", "band")
        .agg(bucket.alias("bucket"))
        .select(F.col("id").alias(id_col), "band", "bucket")
    )


def sign_lsh_candidate_pairs(codes: DataFrame, id_col: str) -> DataFrame:
    """Distinct unordered pairs sharing a bucket in >= 1 band.

    Equi-join on ``(band, bucket)`` — a hash shuffle on the band key,
    identical in shape to :func:`lsh_candidate_pairs`. Callers should
    ``persist()`` the (tiny) code table first: the sign projection
    embeds HOF lambdas, and plans containing ``NamedLambdaVariable``
    never canonicalize equal, so exchange reuse cannot dedupe the two
    self-join sides the way it does for the md5-based MinHash bands.
    """
    stacked = codes.select(
        F.col(id_col).alias("id"), "band", "bucket"
    ).repartition("band", "bucket")
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def sign_lsh_multiprobe_pairs(
    codes: DataFrame, id_col: str, bits_per_band: int
) -> DataFrame:
    """Distinct unordered pairs whose codes agree within Hamming
    distance <= 1 in at least one band — multi-probe sign-LSH
    (Lv et al., VLDB'07 applied to the banded Charikar construction).

    Each vector is indexed once per band under its exact bucket plus the
    ``r`` buckets one bit-flip away, so a band hits when codes differ in
    at most one bit: per-band hit probability rises from ``p^r`` to
    ``p^r + r*p^(r-1)*(1-p)`` at an ``(r+1)x`` index-size cost — the
    recall of shorter codes without their bucket-occupancy blow-up
    (occupancy stays N/2^r). The probe side is derived from the same
    code table (one bounded explode, ``r+1`` rows per code), and the
    join is the identical ``(band, bucket)`` hash shuffle as the exact
    variant — no new join shape at scale.
    """
    masks = F.array(*[F.lit(1 << i) for i in range(bits_per_band)])
    stacked = codes.select(F.col(id_col).alias("id"), "band", "bucket")
    flipped = stacked.withColumn("__m", F.explode(masks)).select(
        "id", "band", F.col("bucket").bitwiseXOR(F.col("__m")).alias("bucket")
    )
    probes = stacked.unionByName(flipped).repartition("band", "bucket")
    p, c = probes.alias("p"), stacked.alias("c")
    return (
        p.join(
            c,
            (F.col("p.band") == F.col("c.band"))
            & (F.col("p.bucket") == F.col("c.bucket"))
            & (F.col("p.id") != F.col("c.id")),
        )
        .select(
            F.least("p.id", "c.id").alias("id_a"),
            F.greatest("p.id", "c.id").alias("id_b"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash (token-hash bit votes -> 32-bit signature)
# ---------------------------------------------------------------------------

N_SIMHASH_BITS = 32


def token_hash(tok: Column) -> Column:
    """Engine-independent 32-bit token hash: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def simhash(
    df: DataFrame, id_col: str, text_col: str, n_bits: int = N_SIMHASH_BITS
) -> DataFrame:
    """Weighted SimHash over whitespace tokens (duplicates count).

    Integer bit-vote sums are exact, so the signature is deterministic
    under any aggregation order. ``n_bits=32`` (default) hashes tokens
    via md5-prefix so a SQL oracle can replay it; ``n_bits=64`` — the
    100 TB deployment contract (less signature concentration on
    vocabulary-sharing corpora, 2x wider pigeonhole blocks at equal
    ``max_distance``) — uses the JVM-native ``xxhash64``. Bit 63 of a
    64-bit signature is the long's sign bit (two's complement); all
    downstream ops use unsigned shifts / xor / bit_count, which are
    sign-agnostic.
    """
    if n_bits not in (32, 64):
        raise ValueError(f"n_bits must be 32 or 64, got {n_bits}")
    h = token_hash(F.col("tok")) if n_bits == 32 else F.xxhash64(F.col("tok"))
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn("h", h)
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("h"), b).bitwiseAND(1) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(n_bits)
    ]
    per_doc = toks.groupBy(id_col).agg(*votes)
    sig = None
    for b in range(n_bits):
        # bit 63 == the sign bit: its two's-complement value is -(2^63)
        weight = (1 << b) if b < 63 else -(1 << 63)
        term = F.when(F.col(f"v{b}") > 0, F.lit(weight)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return per_doc.select(F.col(id_col), sig.cast("bigint").alias("simhash"))


def hamming_pairs(
    sig: DataFrame,
    id_col: str,
    max_distance: int,
    n_bits: int = N_SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by Hamming distance over SimHash signatures,
    via the pigeonhole block join (Manku et al., WWW'07) — never
    all-pairs.

    Split the ``n_bits`` signature into ``max_distance + 1`` contiguous
    blocks: two signatures within Hamming distance d differ in at most d
    bit positions, so at least one block matches *exactly*. Equi-join per
    (block_no, block_value) — a hash shuffle, no theta join — then verify
    the full distance and distinct across blocks.

    Selectivity scales with block width (``n_bits / (d + 1)``): wider
    blocks (more signature bits or smaller d) shrink buckets
    exponentially. At d=10 over 32 bits the 2-3-bit blocks are coarse —
    correct, but a 100 TB deployment should carry 64-bit signatures with
    d <= 6 so each block has >= 9 bits (buckets of N/512).
    """
    n_blocks = max_distance + 1
    if n_blocks >= n_bits:
        raise ValueError(f"max_distance {max_distance} needs < {n_bits} blocks")
    base, extra = divmod(n_bits, n_blocks)
    blocks = []  # (block_no, start_bit, width)
    start = 0
    for i in range(n_blocks):
        width = base + (1 if i < extra else 0)
        blocks.append((i, start, width))
        start += width
    stacked = None
    for no, off, width in blocks:
        mask = (1 << width) - 1
        one = sig.select(
            F.col(id_col).alias("id"),
            F.col("simhash").alias("sig"),
            F.lit(no).alias("block_no"),
            # unsigned shift: arithmetic shiftright would sign-extend a
            # 64-bit signature with bit 63 set and corrupt high blocks
            F.shiftrightunsigned(F.col("simhash"), off)
            .bitwiseAND(mask)
            .alias("block_val"),
        )
        stacked = one if stacked is None else stacked.unionByName(one)
    a = stacked.alias("a")
    b = stacked.alias("b")
    dist = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.block_no") == F.col("b.block_no"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(dist <= max_distance)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.cast("int").alias("hamming"),
        )
        .distinct()
    )
