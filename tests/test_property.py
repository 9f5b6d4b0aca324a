"""Property-based tests (hypothesis): the two operators with non-trivial
rewrites — bucketed range join and connected components — checked
against brute-force Python oracles on random inputs. Example counts are
small because every example runs Spark jobs."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.components import connected_components
from sec_financial_pipeline_spark.operators.rangejoin import point_in_interval_join

_SETTINGS = dict(max_examples=8, deadline=None)

_T0 = dt.datetime(2024, 1, 1)


def _uf_min_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for members in roots.values() for n in members}


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src INT, dst INT")
    got = {r.node: r.label for r in connected_components(df).collect()}
    assert got == _uf_min_labels(edges)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 5000), min_size=1, max_size=30),  # point offsets (s)
    st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 2000)),  # (start, len)
        min_size=1,
        max_size=10,
    ),
    st.sampled_from([7, 60, 601, 3600]),  # bucket widths incl. non-dividing
)
def test_range_join_matches_brute_force(spark, point_offsets, intervals, bucket):
    points = spark.createDataFrame(
        [(i, _T0 + dt.timedelta(seconds=s)) for i, s in enumerate(point_offsets)],
        "pid INT, p_ts TIMESTAMP",
    )
    ivs = spark.createDataFrame(
        [
            (j, _T0 + dt.timedelta(seconds=s), _T0 + dt.timedelta(seconds=s + l))
            for j, (s, l) in enumerate(intervals)
        ],
        "iv INT, w_start TIMESTAMP, w_end TIMESTAMP",
    )
    got = sorted(
        (r.pid, r.iv)
        for r in point_in_interval_join(
            points, ivs, "p_ts", "w_start", "w_end", bucket
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, s in enumerate(point_offsets)
        for j, (a, l) in enumerate(intervals)
        if a <= s < a + l
    )
    assert got == want


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
    chunk=st.sampled_from([16, 64, 257]),
)
@settings(max_examples=15, deadline=None)
def test_packing_matches_sequential_brute_force(spark, sizes, chunk):
    """pack_offsets + assemble_chunks vs a plain-Python sequential pack:
    offsets are the running sum in doc_id order, and the chunk slices
    tile the concatenated token stream exactly — for ANY size mix
    (zeros included) and chunk width."""
    from sec_financial_pipeline_spark.operators.packing import (
        assemble_chunks,
        pack_offsets,
    )

    rows = [(i, n) for i, n in enumerate(sizes)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok int")
    packed = pack_offsets(d, "doc_id", "n_tok", chunk, num_partitions=3)

    off, want = 0, {}
    for i, n in enumerate(sizes):
        span_end = off + max(n, 1) - 1
        want[i] = (off, off // chunk, span_end // chunk)
        off += n
    got = {
        r.doc_id: (r.offset, r.first_chunk, r.last_chunk)
        for r in packed.collect()
    }
    assert got == want

    slices = assemble_chunks(packed, "n_tok", chunk).collect()
    # rebuild the token stream owner-by-position from the slices
    stream: dict[int, int] = {}
    for r in slices:
        for p in range(r.slice_len):
            pos = r.chunk_id * chunk + r.chunk_off + p
            assert pos not in stream, "overlapping slices"
            stream[pos] = r.doc_id
    expect: dict[int, int] = {}
    off = 0
    for i, n in enumerate(sizes):
        for p in range(n):
            expect[off + p] = i
        off += n
    assert stream == expect


@settings(**_SETTINGS)
@given(
    st.lists(
        # small vocabulary + short docs force both shared and disjoint
        # shingle structure, so band collisions actually occur
        st.lists(st.sampled_from("abcdef"), min_size=3, max_size=8).map(
            " ".join
        ),
        min_size=2,
        max_size=14,
    ),
    st.integers(2, 5),  # split modulus: batch = doc_id % m == 0
)
def test_incremental_pairs_match_full_recompute(spark, texts, m):
    """incremental_candidate_pairs over a persisted-store split must
    equal lsh_candidate_pairs over the whole corpus restricted to pairs
    touching >= 1 batch doc — for ANY corpus and ANY split (bands are a
    pure per-doc function, so the algebra must hold universally)."""
    from pyspark.sql import functions as F  # noqa: F811

    from sec_financial_pipeline_spark.operators import similarity as S

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    full = S.lsh_candidate_pairs(
        S.minhash_signatures(d, "doc_id", "text"), "doc_id"
    )
    expected = sorted(
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] % m == 0 or r["id_b"] % m == 0
    )
    store = S.band_table(
        S.minhash_signatures(
            d.filter(F.col("doc_id") % m != 0), "doc_id", "text"
        ),
        "doc_id",
    )
    batch_sigs = S.minhash_signatures(
        d.filter(F.col("doc_id") % m == 0), "doc_id", "text"
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in S.incremental_candidate_pairs(
            batch_sigs, "doc_id", store
        ).collect()
    )
    assert got == expected


_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
        min_size=2,
        max_size=14,
    ),
    st.integers(2, 4),
)
def test_ngram_contamination_matches_brute_force(spark, docs, k):
    """Random tiny corpora: per-eval-doc overlap counts equal a pure-
    Python brute force over distinct k-gram sets (eval = even index)."""
    from sec_financial_pipeline_spark.operators.dedup import ngram_contamination

    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    ev = df.filter(F.col("doc_id") % 2 == 0)
    tr = df.filter(F.col("doc_id") % 2 == 1)

    def grams(ws):
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    train_set = set().union(
        *(grams(w) for i, w in enumerate(docs) if i % 2 == 1), set()
    )
    expect = {
        i: len(grams(w) & train_set) for i, w in enumerate(docs) if i % 2 == 0
    }
    got = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination(ev, tr, "doc_id", "text", k=k).collect()
    }
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.sets(st.integers(0, 2000), min_size=1, max_size=40),
    st.integers(2, 5),
    st.text(alphabet="abcdef", min_size=0, max_size=4),
)
def test_epoch_shuffle_matches_python_md5(spark, keys, n_shards, seed):
    """The (shard, pos) assignment is a pure function of (key, seed):
    replicate it exactly in pure Python via hashlib.md5."""
    import hashlib

    from sec_financial_pipeline_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(kk,) for kk in keys], "doc_id bigint")
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in epoch_shuffle(df, "doc_id", n_shards, seed=seed).collect()
    }

    def h(kk):
        return hashlib.md5(f"{seed}{kk}".encode()).hexdigest()

    by_shard = {}
    for kk in keys:
        by_shard.setdefault(int(h(kk)[:8], 16) % n_shards, []).append(kk)
    expect = {}
    for shard, members in by_shard.items():
        for pos, kk in enumerate(sorted(members, key=lambda x: (h(x), x)), 1):
            expect[kk] = (shard, pos)
    assert got == expect
