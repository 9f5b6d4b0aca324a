"""Deterministic sampling for training-data pipelines (SURVEY §2.9
north-star scope; the data-mixing primitive every corpus build needs).

``df.sample()`` is seed-dependent on partitioning and unreproducible
across engines; these operators derive the keep/drop decision from a
content hash, so the SAME rows are kept on any cluster layout, any
engine, any run — sampling becomes a pure filter that composes with
pushdown and survives re-partitioning. The hash-to-uniform map is
``first 8 md5 hex chars / 2^32`` (engine-independent, uniform to ~1e-9).

Scale shape: a narrow per-row predicate — no shuffle, no state; the
stratified variant broadcasts the tiny (stratum -> rate) table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from a key column (+ optional salt:
    different salts give independent samples over the same keys)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10)
    return h.cast("double") / F.lit(_U32)


def hash_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by the key's hash — reproducible
    on any engine/partitioning, and disjoint across salts."""
    return df.filter(hash_uniform(F.col(key), salt) < rate)


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates: DataFrame,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum sampling rates (the corpus-mixing shape: 'keep 50% of
    English, 10% of the crawl, all of the curated set'). ``rates`` is a
    tiny (stratum, rate) table — broadcast, never shuffled; strata
    absent from it fall back to ``default_rate``."""
    r = rates.select(F.col(stratum), F.col("rate").alias("__rate"))
    joined = df.join(F.broadcast(r), stratum, "left_outer")
    keep = hash_uniform(F.col(key), salt) < F.coalesce(
        F.col("__rate"), F.lit(default_rate)
    )
    return joined.filter(keep).drop("__rate")


def stratified_hash_upsample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates: DataFrame,
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum sampling where rates may EXCEED 1 — the oversampling
    half of corpus mixing ('repeat the curated set 2.5x, halve the
    crawl'). A row with rate r emits ``floor(r)`` full copies plus one
    more when its hash-uniform falls below ``frac(r)``, so the expected
    multiplicity is exactly r, the decision is a pure function of
    (key, salt), and a rate <= 1 degrades to :func:`stratified_hash_sample`
    semantics. Output adds a 1-based ``copy_no`` column (training loaders
    shuffle copies apart; dedup-aware consumers can key on it).

    Scale shape: broadcast rate table + a bounded per-row explode
    (``<= ceil(max_rate)`` copies) — no shuffle, no state.
    """
    r = rates.select(F.col(stratum), F.col("rate").alias("__rate"))
    joined = df.join(F.broadcast(r), stratum, "left_outer")
    rate = F.coalesce(F.col("__rate"), F.lit(default_rate))
    extra = (hash_uniform(F.col(key), salt) < (rate - F.floor(rate))).cast("int")
    copies = (F.floor(rate).cast("int") + extra).alias("__copies")
    exploded = (
        joined.withColumn("__copies", copies)
        .filter(F.col("__copies") >= 1)
        .withColumn(
            "copy_no", F.explode(F.sequence(F.lit(1), F.col("__copies")))
        )
    )
    return exploded.drop("__rate", "__copies")


def temperature_mixture_thresholds(
    df: DataFrame, stratum: str, alpha: float
) -> DataFrame:
    """Per-stratum selection thresholds for temperature-``alpha``
    mixture resampling (the multilingual/multi-source reweighting of
    Conneau & Lample 2019: sample stratum i with probability
    ``p_i = n_i^alpha / sum_j n_j^alpha``, flattening the natural
    distribution toward uniform as alpha -> 0). The target corpus size
    is the ORIGINAL total, so expected multiplicity for stratum i is
    ``total * n_i^(alpha-1) / S`` — above 1 for rare strata (they
    repeat), below 1 for dominant ones (they thin).

    Multiplicities are returned as INTEGER thresholds in u32 hash
    space (``threshold = floor(2^32 * multiplicity)``): the per-row
    keep/copy decision becomes pure integer arithmetic against the
    row-hash, so cross-engine float divergence is confined to one
    floor per STRATUM (a handful of values), never per row.

    Scale shape: one groupBy-count over the corpus + a 1-row scalar
    cross join; output is a tiny broadcastable table."""
    counts = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("__total"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("__S"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        stratum,
        "n_docs",
        F.floor(
            F.lit(_U32)
            * F.col("__total").cast("double")
            * F.pow(F.col("n_docs").cast("double"), F.lit(alpha - 1.0))
            / F.col("__S")
        )
        .cast("long")
        .alias("threshold"),
    )


def temperature_mixture(
    df: DataFrame,
    key: str,
    stratum: str,
    alpha: float,
    salt: str = "",
    thresholds: DataFrame | None = None,
) -> DataFrame:
    """Resample the corpus to its own size under a temperature-``alpha``
    stratum distribution: each row emits ``threshold >> 32`` full
    copies plus one more when its u32 key-hash falls below
    ``threshold & 0xffffffff`` — expected multiplicity exactly
    ``threshold / 2^32``, decided engine- and partitioning-
    independently. Adds 1-based ``copy_no`` (like
    :func:`stratified_hash_upsample`). Pass a precomputed
    ``thresholds`` table to avoid re-running the corpus count when the
    caller already built one."""
    th = (
        thresholds
        if thresholds is not None
        else temperature_mixture_thresholds(df, stratum, alpha)
    )
    joined = df.join(F.broadcast(th.select(stratum, "threshold")), stratum)
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    copies = (
        F.shiftright(F.col("threshold"), 32)
        + (u32 < F.col("threshold").bitwiseAND(F.lit(0xFFFFFFFF))).cast("long")
    ).cast("int").alias("__copies")
    return (
        joined.withColumn("__copies", copies)
        .filter(F.col("__copies") >= 1)
        .withColumn("copy_no", F.explode(F.sequence(F.lit(1), F.col("__copies"))))
        .drop("__copies", "threshold")
    )


def epoch_shuffle(
    df: DataFrame, key: str, n_shards: int, seed: str = ""
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` ordered shards —
    the dataloader epoch-ordering primitive. Each row gets

    - ``shard``  = first 8 md5 hex chars of (seed || key) mod n_shards
    - ``pos``    = 1-based rank within its shard, ordered by the full
      md5 hash (key as tiebreak)

    so the concatenation shard 0..n-1 in pos order IS the epoch
    permutation: a pure function of (key, seed) — identical on any
    engine, partitioning, or run, and a new seed gives an independent
    permutation. Training jobs read one shard per worker, already in
    shuffled order; no global sort ever happens.

    ``key`` must be UNIQUE (like packing's ``order_col``): duplicate
    keys hash to the same (shard, hash) and the rank tie among them
    would then be broken in partition-dependent order, attaching pos
    values to different rows' other columns run-to-run.

    Scale shape: one hash-partitioned exchange on ``shard`` plus a
    per-shard sort — the window is PARTITIONED (n_shards parallel
    sorts of N/n_shards rows each), never a single-task global window.
    Shard sizes concentrate near N/n_shards (multinomial), so sizing
    n_shards to the worker count bounds per-task memory.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(seed), F.col(key).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy("__h", key)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__h")
    )


def write_epoch_shards(
    df: DataFrame,
    key: str,
    n_shards: int,
    seed: str,
    path: str,
    files_per_shard: int = 1,
    check_unique: bool = True,
) -> None:
    """Materialize an epoch as the artifact a dataloader actually
    consumes: ``path/shard=K/`` parquet, rows stored in ``pos`` order
    inside each shard, so a worker streams its shard file(s) top to
    bottom and reads the epoch permutation with no sort at load time.

    Layout mechanics, ``files_per_shard=1``: hash-repartition on
    ``shard`` puts ALL of a shard's rows in one task, and
    ``sortWithinPartitions`` orders them before ``partitionBy`` splits
    the task's output into shard dirs — each shard is one file, written
    in pos order, but one task sorts N/n_shards rows (spill-safe, yet a
    wall-clock tail at 100 TB when n_shards is sized to workers).

    ``files_per_shard=k > 1`` is the scale path: each shard is cut into
    ``k`` CONTIGUOUS pos ranges (``subshard = floor((pos-1) * k /
    shard_size)``), repartitioned on (shard, subshard) — n_shards*k
    parallel sorts of N/(n_shards*k) rows — and written as
    ``path/shard=K/subshard=J/``. A loader reads a shard's subshard
    dirs in ascending numeric order and streams each top to bottom;
    the concatenation is the identical permutation the k=1 layout
    stores (pinned by tests/test_shuffle_contamination.py at k > 1).

    ``check_unique`` (default on) enforces :func:`epoch_shuffle`'s
    documented unique-key precondition with two column-pruned jobs:
    duplicate keys would silently attach ``pos`` values to different
    rows' columns run-to-run, breaking the deterministic-epoch
    guarantee this artifact exists to provide — a loud ``ValueError``
    beats a quiet nondeterminism.
    """
    if check_unique:
        n, nd = df.count(), df.select(key).distinct().count()
        if n != nd:
            raise ValueError(
                f"write_epoch_shards: key '{key}' must be unique — "
                f"{n} rows but {nd} distinct keys; duplicate keys make "
                f"the (pos -> row) attachment partition-dependent"
            )
    out = epoch_shuffle(df, key, n_shards, seed=seed)
    if files_per_shard <= 1:
        (
            out.repartition(n_shards, F.col("shard"))
            .sortWithinPartitions("shard", "pos")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(path)
        )
        return
    from pyspark.sql import Window

    shard_size = F.count(F.lit(1)).over(Window.partitionBy("shard"))
    sub = F.floor(
        (F.col("pos") - 1) * files_per_shard / F.col("__sz")
    ).cast("int")
    (
        out.withColumn("__sz", shard_size)
        .withColumn("subshard", sub)
        .drop("__sz")
        .repartition(n_shards * files_per_shard, F.col("shard"), F.col("subshard"))
        .sortWithinPartitions("shard", "subshard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard", "subshard")
        .parquet(path)
    )


def unimax_allocation(
    counts: list[tuple[str, int]], budget: int, epochs_cap: float
) -> dict[str, int]:
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151,
    Algorithm 1): distribute a total character ``budget`` as uniformly
    as possible across strata, capping each stratum at ``epochs_cap``
    epochs of its own ``counts`` characters. Strata are visited in
    ascending cap order; each takes ``min(cap, remaining // strata
    left)``, so a stratum too small to absorb an even share is clipped
    at its epoch cap and the leftover re-spreads over the larger ones —
    low-resource strata get repeated up to the cap, the head stratum
    absorbs whatever budget survives.

    Pure integer arithmetic after the one ``floor(epochs_cap * chars)``
    per stratum (the only float op — same IEEE double product on any
    engine), so the allocation is bit-reproducible. Inputs are one row
    per stratum (a bounded driver-side list, same class as the DSIR
    weight table); ties in cap break on the stratum name."""
    import math

    caps = sorted(
        (int(math.floor(epochs_cap * c)), s) for s, c in counts
    )
    remaining = int(budget)
    out: dict[str, int] = {}
    for i, (cap, s) in enumerate(caps):
        share = remaining // (len(caps) - i)
        q = min(cap, share)
        out[s] = q
        remaining -= q
    return out


def unimax_stats(
    df: DataFrame,
    key: str,
    stratum: str,
    weight: str,
    epochs_cap: float,
    budget: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Per-stratum UniMax selection report: allocate quotas with
    :func:`unimax_allocation` (budget defaults to the corpus' own total
    weight — a one-epoch budget), then realize each quota as
    ``full-epoch passes + a deterministic hash-ordered partial pass``
    and report, per stratum: ``n_docs`` (corpus rows), ``threshold``
    (the character quota), ``n_selected`` (rows selected including
    epoch repeats), ``checksum`` (sum of selected keys including
    repeats — pins the exact selection), and ``rate`` (epochs used =
    quota / chars).

    Scale shape: one groupBy for the per-stratum totals (collected —
    bounded at the stratum count), one stratum-partitioned window for
    the partial-pass cumulative weight, one final aggregation. The
    quota table rides back in as literals; no global window, no
    per-row Python."""
    totals = {
        r["s"]: (int(r["chars"]), int(r["n"]), int(r["ids"]))
        for r in df.groupBy(F.col(stratum).alias("s"))
        .agg(
            F.coalesce(F.sum(F.col(weight).cast("long")), F.lit(0)).alias(
                "chars"
            ),
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col(key).cast("long")), F.lit(0)).alias(
                "ids"
            ),
        )
        .collect()
    }
    total_chars = sum(c for c, _, _ in totals.values())
    quotas = unimax_allocation(
        [(s, c) for s, (c, _, _) in totals.items()],
        total_chars if budget is None else budget,
        epochs_cap,
    )
    spark = df.sparkSession
    meta = spark.createDataFrame(
        [
            (s, chars, n, ids, quotas[s])
            for s, (chars, n, ids) in sorted(totals.items())
        ],
        f"{stratum} string, chars long, n_docs long, ids long, quota long",
    )
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = (
        Window.partitionBy(stratum)
        .orderBy(h, F.col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    docs = df.select(
        stratum, key, F.col(weight).cast("long").alias("__w")
    ).withColumn("__before", F.coalesce(F.sum("__w").over(w), F.lit(0)))
    # A stratum whose rows all carry weight 0 has chars == 0: `quota %
    # chars` / `quota div chars` would divide by zero and NULL the
    # stratum's n_selected/checksum silently (ADVICE r10). Such a
    # stratum has nothing selectable — emit explicit zeros instead.
    nonzero = F.col("chars") > 0
    picked = nonzero & (
        F.col("__before") < F.col("quota") % F.col("chars")
    )
    par = (
        docs.join(F.broadcast(meta.select(stratum, "quota", "chars")), stratum)
        .groupBy(stratum)
        .agg(
            F.sum(picked.cast("long")).alias("__p_n"),
            F.sum(F.when(picked, F.col(key).cast("long")).otherwise(0)).alias(
                "__p_ids"
            ),
        )
    )
    full = F.when(nonzero, F.expr("quota div chars")).otherwise(F.lit(0))
    return (
        meta.join(par, stratum)
        .select(
            stratum,
            F.col("n_docs"),
            F.col("quota").alias("threshold"),
            (full * F.col("n_docs") + F.coalesce(F.col("__p_n"), F.lit(0)))
            .alias("n_selected"),
            (full * F.col("ids") + F.coalesce(F.col("__p_ids"), F.lit(0)))
            .alias("checksum"),
            F.when(
                nonzero,
                F.round(
                    F.col("quota").cast("double") / F.col("chars"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("rate"),
        )
    )
