"""Engine-independent HyperLogLog distinct-count sketch (Flajolet et
al. 2007) — the mergeable-state aggregation a 100 TB pipeline needs for
distinct users/documents/keys without a shuffle-the-world exact count.

Spark ships `approx_count_distinct`, but its HLL++ registers are
JVM-internal: no cross-engine oracle can check them, and sketches from
another engine cannot merge with them. This construction is defined
entirely in portable SQL semantics, so DuckDB (the correctness oracle)
computes BIT-IDENTICAL registers and estimates:

- hash   = first 32 bits of md5(key)  (the same engine-independent
  hash family every dedup/sampling operator here uses)
- bucket = top ``b`` bits; rho = position of the first 1-bit in the
  remaining ``32-b`` bits, computed as an INTEGER via binary-string
  length (no log2 — float libs disagree at powers of two)
- register M_j = max(rho) per bucket — a partial-aggregable max, so
  the sketch state is m integers regardless of input size, and
  UNION-of-datasets == elementwise max of registers (mergeability,
  pinned by test)
- estimate = alpha_m * m^2 / (zeros + sum 2^-M_j). Every 2^-M_j is an
  exact power of two and the sum has at most m one-bit terms spanning
  < 53 bits, so it is EXACT in double arithmetic in any order — the
  estimate is deterministic across engines and partitionings. The
  small-range LinearCounting correction is intentionally NOT applied
  inside the operator (java.lang.Math.log and libm log may differ in
  the last ulp); callers that want it apply ``m * ln(m/zeros)``
  driver-side from the returned ``n_zero`` column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_rho(key: Column, b: int = 6) -> tuple[Column, Column]:
    """(bucket, rho) for one key — the per-row sketch contribution."""
    h32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    width = 32 - b
    bucket = F.shiftright(h32, width)
    rest = h32.bitwiseAND(F.lit((1 << width) - 1))
    blen = F.when(rest == 0, F.lit(0)).otherwise(
        F.length(F.conv(rest, 10, 2))
    )
    rho = F.lit(width + 1) - blen
    return bucket.cast("int").alias("bucket"), rho.cast("int").alias("rho")


def hll_registers(
    df: DataFrame, key: str, group_cols: list[str] | None = None, b: int = 6
) -> DataFrame:
    """Sketch state: one ``(group..., bucket, M)`` row per non-empty
    register. Partial-aggregable (map-side combine shrinks every
    partition to <= m rows before the shuffle)."""
    group_cols = list(group_cols or [])
    bucket, rho = hll_rho(F.col(key), b)
    return (
        df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge(*register_sets: DataFrame) -> DataFrame:
    """Merge sketches: union the register tables, keep max(M) per
    (group, bucket). sketch(A ∪ B) == merge(sketch(A), sketch(B)) —
    the property that lets per-shard/per-day sketches roll up without
    touching raw data."""
    out = register_sets[0]
    for r in register_sets[1:]:
        out = out.unionByName(r)
    keys = [c for c in out.columns if c != "M"]
    return out.groupBy(*keys).agg(F.max("M").alias("M"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None, b: int = 6
) -> DataFrame:
    """(group..., hll_distinct, n_registers, n_zero) from a register
    table. ``hll_distinct`` is the raw HLL estimate (deterministic —
    see module docstring); ``n_zero`` = empty registers, for callers
    applying the LinearCounting small-range correction themselves."""
    group_cols = list(group_cols or [])
    m = 1 << b
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("__sumpow"),
    )
    z = (F.lit(m) - F.col("n_registers")).cast("double") + F.col("__sumpow")
    return agg.select(
        *group_cols,
        F.round(F.lit(_alpha(m) * m * m) / z, 4).alias("hll_distinct"),
        "n_registers",
        (F.lit(m) - F.col("n_registers")).cast("int").alias("n_zero"),
    )


def hll_distinct(
    df: DataFrame, key: str, group_cols: list[str] | None = None, b: int = 6
) -> DataFrame:
    """One-shot convenience: registers + estimate."""
    return hll_estimate(
        hll_registers(df, key, group_cols, b), group_cols, b
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# / heavy-hitter probing with the same engine-independence discipline as
# the HLL above, and even stronger: the whole sketch is INTEGER state
# (d x w counters, partial-aggregable sums), so there is no float
# anywhere. Guarantees: est >= true (one-sided), est <= true + eps*N
# w.p. 1-delta for w = e/eps, d = ln(1/delta). Merge = elementwise sum.
# At 100 TB: the sketch is d*w longs per group however large the input,
# and the probe join touches d rows per probed key.
# ---------------------------------------------------------------------------


def salted_position(key: Column, i: int, mod: int) -> Column:
    """The repo's standard salted hash family, JVM-side:
    ``u32(md5("{i}#" || key)) % mod``. The documented Python mirror is
    ``int(md5(f"{i}#{v}".encode()).hexdigest()[:8], 16) % mod`` — the
    two agree iff the STRING RENDERING of the key agrees, which holds
    for integers and strings but NOT doubles/booleans (Java '1.0E7' /
    'true' vs Python '10000000.0' / 'True'); callers bridging the two
    sides must restrict to int/string keys (snaptable's bloom index
    enforces this)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{i}#"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (h % mod).cast("int")


def _cms_counter(key: Column, i: int, w: int) -> Column:
    return salted_position(key, i, w)


def cms_counters(
    df: DataFrame,
    key: str,
    d: int = 4,
    w: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sketch state: ``(group..., row, counter, cnt)`` — at most d*w
    rows per group."""
    group_cols = list(group_cols or [])
    arr = F.array(*[_cms_counter(F.col(key), i, w) for i in range(d)])
    ex = df.select(*group_cols, F.posexplode(arr).alias("row", "counter"))
    return ex.groupBy(*group_cols, "row", "counter").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """cms(A ∪ B) == merge(cms(A), cms(B)): elementwise counter sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").cast("bigint").alias("cnt"))


def kmv_sketch(df: DataFrame, key: str, k: int = 64) -> DataFrame:
    """KMV (k-minimum-values / theta) sketch: the ``k`` smallest 32-bit
    md5 hashes of the column's DISTINCT values — one tiny sorted table
    per set, built with TakeOrdered (orderBy+limit: per-partition top-k
    merged on the driver; no window, no full sort). |S| is estimated by
    ``(k-1) * 2^32 / theta`` (theta = the kth hash); two sketches
    estimate INTERSECTION without ever joining the raw sets:
    J = |A_sk ∩ B_sk within the k smallest of the union| / k and
    |A ∩ B| ~= J * |A ∪ B|. Everything up to the final division is
    integer arithmetic — deterministic across engines."""
    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        df.select(h.alias("h")).distinct().orderBy("h").limit(k)
    )


def kmv_overlap(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """One-row overlap estimate from two KMV sketches (outputs of
    :func:`kmv_sketch` with the same ``k``): est_union, est_jaccard,
    est_intersection (rounded 4), plus the match/theta internals."""
    # materialize the (<= k-row) sketches once: theta and matches are
    # separate branches, and without the checkpoint each would re-run
    # the full distinct+top-k scan that produced its inputs
    a = a.localCheckpoint(eager=True)
    b = b.localCheckpoint(eager=True)
    u = (
        a.unionByName(b).distinct().orderBy("h").limit(k)
        .localCheckpoint(eager=True)
    )
    theta = u.agg(F.max("h").alias("theta"), F.count(F.lit(1)).alias("ku"))
    matches = (
        u.join(a, "h", "left_semi")
        .join(b, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    # unsaturated sketch (union smaller than k): the sketch IS the set,
    # count exactly instead of extrapolating from theta; two EMPTY
    # sketches report zeros, not 0/0 nulls
    est_union = F.when(
        F.col("ku") < k, F.col("ku").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 32)) / F.col("theta")
    )
    est_j = F.when(F.col("ku") == 0, F.lit(0.0)).otherwise(
        F.col("matches").cast("double") / F.col("ku")
    )
    return theta.crossJoin(matches).select(
        F.col("ku").cast("int").alias("k_used"),
        F.col("matches").cast("bigint").alias("kmv_matches"),
        F.round(est_union, 4).alias("est_union"),
        F.round(est_j, 4).alias("est_jaccard"),
        F.round(est_j * est_union, 4).alias("est_intersection"),
    )


def cms_lookup(
    counters: DataFrame, probes: DataFrame, key: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Estimated frequency for each probe key: min over the d row
    estimates (missing counter = 0). ``probes`` is a one-column
    DataFrame of keys — typically tiny and broadcast."""
    arr = F.array(*[_cms_counter(F.col(key), i, w) for i in range(d)])
    pl = probes.select(
        F.col(key), F.posexplode(arr).alias("row", "counter")
    )
    return (
        pl.join(counters, ["row", "counter"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# HDR log-bucket quantile histogram (HdrHistogram, Gil Tene) — mergeable
# quantile estimation completing the sketch family (HLL=distinct,
# CMS=frequency, KMV=overlap, HDR=quantiles). Bucket id = (bit length of
# |v|, next sub_bits bits after the MSB): values below 2^(sub_bits+1)
# map EXACTLY (one value per bucket), larger values land in buckets of
# relative width 2^-sub_bits — bounded relative error at any scale,
# which equi-width histograms can't give on skewed data. The whole
# state is integer (bucket -> count), partial-aggregable, mergeable by
# count-sum, and bit-identical across engines: bit length comes from
# length(bin(v)) — the binary-string trick the HLL rho uses — and the
# sub-bucket from integer shift/mask; no log2, no float anywhere.
# At 100 TB: state is <= 64 * 2^sub_bits ints per group regardless of
# input size (vs exact percentile's full sort), and the quantile walk
# is a driver-side loop over that bounded state.
# ---------------------------------------------------------------------------


def hdr_bucket(col: Column, sub_bits: int = 5) -> Column:
    """Signed HDR bucket id for an integral column (codegen'd: bin() +
    shift/mask, no UDF). Negative values mirror to negative buckets so
    bucket order == value order across the full signed range. Domain:
    (Long.MIN, Long.MAX] — Long.MIN itself can't be negated in 64-bit
    arithmetic (the one value where the JVM and Python's bignum mirror
    would disagree); counts/ids/prices never reach it."""
    mask = (1 << sub_bits) - 1
    scale = 1 << sub_bits

    def _pos(c):
        m = F.length(F.bin(c))
        shift = F.greatest(m - F.lit(1 + sub_bits), F.lit(0))
        # call_function: the Python F.shiftright wrapper wants an int
        # literal; the SQL function takes a column shift
        shifted = F.call_function("shiftright", c, shift)
        return (m * scale + shifted.bitwiseAND(F.lit(mask))).cast("long")

    v = col.cast("long")
    return (
        F.when(v == 0, F.lit(0).cast("long"))
        .when(v > 0, _pos(v))
        .otherwise(-_pos(-v))
    )


def hdr_histogram(
    df: DataFrame, value: Column | str, by: list[str] | None = None,
    sub_bits: int = 5,
) -> DataFrame:
    """(group..., hdr_bucket, hdr_cnt) — ONE partial-aggregated groupBy;
    merge two histograms by unioning and re-summing (`hdr_merge`)."""
    col = F.col(value) if isinstance(value, str) else value
    keys = list(by or []) + ["hdr_bucket"]
    return (
        df.select(*(by or []), hdr_bucket(col, sub_bits).alias("hdr_bucket"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("bigint").alias("hdr_cnt"))
    )


def hdr_merge(*hists: DataFrame) -> DataFrame:
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c != "hdr_cnt"]
    return out.groupBy(*keys).agg(
        F.sum("hdr_cnt").cast("bigint").alias("hdr_cnt")
    )


def hdr_bucket_py(v: int, sub_bits: int = 5) -> int:
    """Pure-Python mirror of :func:`hdr_bucket` (the witness)."""
    if v == 0:
        return 0
    sign = 1 if v > 0 else -1
    v = abs(v)
    m = v.bit_length()
    shift = max(m - 1 - sub_bits, 0)
    return sign * (m * (1 << sub_bits) + ((v >> shift) & ((1 << sub_bits) - 1)))


def hdr_bounds(bucket: int, sub_bits: int = 5) -> tuple[int, int]:
    """[lower, upper] value range a bucket covers (inclusive)."""
    if bucket == 0:
        return 0, 0
    sign = 1 if bucket > 0 else -1
    b = abs(bucket)
    scale = 1 << sub_bits
    m, rem = divmod(b, scale)
    if m <= sub_bits + 1:
        lo = rem if m <= sub_bits else scale + rem
        hi = lo
    else:
        shift = m - 1 - sub_bits
        lo = (scale + rem) << shift
        hi = lo + (1 << shift) - 1
    return (sign * lo, sign * hi) if sign > 0 else (sign * hi, sign * lo)


def hdr_quantiles(
    buckets: list[tuple[int, int]], qs: list[float], sub_bits: int = 5
) -> list[int]:
    """Quantile estimates from collected (bucket, count) state — a
    driver-side walk over <= 64*2^sub_bits entries. Returns each
    bucket's LOWER bound; error <= one bucket width (relative
    2^-sub_bits; exact below 2^(sub_bits+1))."""
    import math

    ordered = sorted(buckets)
    total = sum(c for _, c in ordered)
    if total == 0:
        return [None] * len(qs)  # empty state: no quantiles to report
    out = []
    for q in qs:
        rank = max(1, math.ceil(q * total))
        acc = 0
        val = None
        for b, c in ordered:
            acc += c
            if acc >= rank:
                val = hdr_bounds(b, sub_bits)[0]
                break
        out.append(val if val is not None else hdr_bounds(ordered[-1][0], sub_bits)[0])
    return out
