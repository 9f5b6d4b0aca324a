"""Banded sign-LSH scale properties (the round-2 VERDICT's #2 ask).

The fixed 8-bit/256-bucket table made within-bucket candidates quadratic
in N; the banded rewrite (b bands x r bits, mirroring the MinHash band
shape) must keep bucket occupancy bounded and candidate counts
~linear in N, while the scale-invariance of sign projections still
guarantees clone-pair recall in EVERY band.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators import similarity as S
from sec_financial_pipeline_spark.registry.similarity import (
    _SIGN_BANDS,
    _SIGN_BITS,
    _sign_planes,
)
from sec_financial_pipeline_spark.sources.testdata import load_table


def _embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )


def test_every_vector_gets_all_band_codes(spark, sf_dir):
    e = _embeddings(spark, sf_dir)
    codes = S.sign_lsh_bands(e, "vec_id", _sign_planes(e), _SIGN_BITS)
    n = e.count()
    assert codes.count() == n * _SIGN_BANDS
    per_vec = codes.groupBy("vec_id").count()
    assert per_vec.filter(F.col("count") != _SIGN_BANDS).count() == 0
    # r-bit buckets stay in range
    bad = codes.filter(
        (F.col("bucket") < 0) | (F.col("bucket") >= 2 ** _SIGN_BITS)
    )
    assert bad.count() == 0


def test_bucket_occupancy_bounded(spark, sf_dir):
    """r=16 bits holds expected occupancy at N/2^16 — measured max 2-3 at
    sf0.01/sf0.1. A regression to coarse codes (the quadratic design)
    would push max occupancy toward N/2^8."""
    e = _embeddings(spark, sf_dir)
    codes = S.sign_lsh_bands(e, "vec_id", _sign_planes(e), _SIGN_BITS)
    occ = codes.groupBy("band", "bucket").count()
    stats = occ.agg(F.max("count").alias("mx"), F.avg("count").alias("avg")).collect()[0]
    assert stats.mx <= 8, f"max bucket occupancy {stats.mx} — codes too coarse"
    assert stats.avg <= 2.0


def test_candidates_linear_not_quadratic(spark, sf_dir):
    e = _embeddings(spark, sf_dir)
    codes = S.sign_lsh_bands(e, "vec_id", _sign_planes(e), _SIGN_BITS)
    n = e.count()
    cands = S.sign_lsh_candidate_pairs(codes, "vec_id").count()
    # all-pairs would be n*(n-1)/2 (~125k at sf0.01); banded candidates
    # must stay within a small constant of N
    assert cands <= 2 * n, f"{cands} candidates for N={n} — quadratic blow-up"


def test_clone_pairs_recalled_in_every_band(spark, sf_dir):
    """Positive scaling preserves every projection sign, so a clone and
    its original share the bucket in ALL b bands — candidate recall for
    exact near-dups is 1.0 by construction, not probabilistic."""
    base = _embeddings(spark, sf_dir)
    clones = base.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        "label",
        F.expr("transform(emb, x -> x * 1.5)").alias("emb"),
    )
    aug = base.unionByName(clones)
    codes = S.sign_lsh_bands(aug, "vec_id", _sign_planes(base), _SIGN_BITS)
    cands = S.sign_lsh_candidate_pairs(codes, "vec_id")
    expected = clones.select((F.col("vec_id") - 10000).alias("id_a"),
                             F.col("vec_id").alias("id_b"))
    missing = expected.join(cands, ["id_a", "id_b"], "left_anti").count()
    assert missing == 0, f"{missing} clone pairs missed by banded LSH"


def test_release_caches_unpins_tracked_tables(spark, sf_dir):
    """The shared persisted tables (shingles, verified pairs, ANN corpus
    caches) must be releasable by a long-lived session — ADVICE r02:
    without a hook, a ServingFacade process pins superseded sf_dirs'
    cached partitions forever."""
    from pyspark.storagelevel import StorageLevel

    from sec_financial_pipeline_spark.registry import similarity as R

    R.release_caches()  # start clean
    R.q_emb_ivf_ann(spark, sf_dir).count()  # persists its corpus cache
    assert len(R._TRACKED) >= 1
    tracked = list(R._TRACKED)
    assert any(df.storageLevel != StorageLevel.NONE for df in tracked)
    released = R.release_caches()
    assert released == len(tracked)
    assert R._TRACKED == []
    assert all(df.storageLevel == StorageLevel.NONE for df in tracked)


def test_hash_sampling_is_partitioning_invariant(spark, sf_dir):
    """The keep set must be a pure function of content — identical at
    any partition count, and disjoint across salts."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.sampling import hash_sample
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in hash_sample(d.repartition(2), "doc_id", 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(d.repartition(17), "doc_id", 0.3).select("doc_id").collect()}
    assert a == b and 0 < len(a) < d.count()
    # a larger rate strictly grows the same keep set (nested samples)
    c = {r.doc_id for r in hash_sample(d, "doc_id", 0.6).select("doc_id").collect()}
    assert a < c
    # different salt -> a different (independent) sample
    s2 = {r.doc_id for r in hash_sample(d, "doc_id", 0.3, salt="other").select("doc_id").collect()}
    assert s2 != a


def test_multiprobe_pairs_equal_bruteforce_hamming1(spark, sf_dir):
    """The multi-probe generator's semantic contract, checked against an
    independent witness (the oracle replays the same probe algorithm, so
    only a brute-force comparison actually tests it): candidate pairs ==
    pairs whose codes agree within Hamming distance <= 1 in >= 1 band."""
    from sec_financial_pipeline_spark.registry.similarity import (
        _MP_BANDS,
        _MP_BITS,
        _SIGN_BASE,
    )

    e = _embeddings(spark, sf_dir)
    planes = e.filter(
        (F.col("vec_id") >= _SIGN_BASE)
        & (F.col("vec_id") < _SIGN_BASE + _MP_BANDS * _MP_BITS)
    ).select((F.col("vec_id") - _SIGN_BASE).alias("h_id"), F.col("emb").alias("h_emb"))
    codes = S.sign_lsh_bands(e, "vec_id", planes, _MP_BITS).persist()
    try:
        got = {
            (r["id_a"], r["id_b"])
            for r in S.sign_lsh_multiprobe_pairs(codes, "vec_id", _MP_BITS).collect()
        }
        # brute force: all vector pairs x all bands, Hamming over buckets
        rows = codes.collect()
        by_vec: dict[int, dict[int, int]] = {}
        for r in rows:
            by_vec.setdefault(r["vec_id"], {})[r["band"]] = r["bucket"]
        ids = sorted(by_vec)
        want = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if any(
                    bin(by_vec[a][band] ^ by_vec[b][band]).count("1") <= 1
                    for band in range(_MP_BANDS)
                ):
                    want.add((a, b))
        assert got == want and len(want) > 0
    finally:
        codes.unpersist()


def test_stratified_upsample_multiplicity_and_invariance(spark, sf_dir):
    """Rates > 1 emit floor(r) copies + a hash-gated extra: multiplicity
    is exactly floor(r) or ceil(r) per key, aggregate count ~ r * n, the
    emitted set is partitioning-invariant, and copy_no is 1..copies."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.sampling import (
        stratified_hash_upsample,
    )
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    rates = spark.createDataFrame([("en", 2.5)], "lang string, rate double")

    out = stratified_hash_upsample(
        d, key="doc_id", stratum="lang", rates=rates, default_rate=0.5
    )
    per_key = (
        out.groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.max("copy_no").alias("max_copy"))
        .collect()
    )
    for r in per_key:
        lo, hi = (2, 3) if r["lang"] == "en" else (1, 1)
        assert lo <= r["n"] <= hi, r
        assert r["max_copy"] == r["n"], r  # copy_no is 1..copies

    n_docs = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_out = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # aggregate multiplicity tracks the rate (hash-gated fractional part)
    assert abs(n_out["en"] / n_docs["en"] - 2.5) < 0.15
    other = [l for l in n_docs if l != "en"][0]
    assert abs(n_out[other] / n_docs[other] - 0.5) < 0.15

    # partitioning-invariant: identical multiset at any layout
    again = stratified_hash_upsample(
        d.repartition(17), key="doc_id", stratum="lang", rates=rates, default_rate=0.5
    )
    a = sorted((r["doc_id"], r["copy_no"]) for r in out.collect())
    b = sorted((r["doc_id"], r["copy_no"]) for r in again.collect())
    assert a == b


def test_stratified_sample_zero_upsample_stratum_still_reported(spark, tmp_path):
    """A stratum whose upsample rate is < 1 can emit ZERO upsampled rows;
    it must still appear in doc_stratified_sample with n_upsampled=0 and
    the map-derived up_rate — matching the oracle, whose upagg groups
    over ALL documents (regression for the r6 inner-join parity break).

    doc_ids are pre-searched so every 'qq' doc fails the up1 draw
    (hash_uniform >= 0.5 -> 0 copies at the 0.5 default rate) while
    passing the mix1 draw (< 0.1 default keep rate).
    """
    import duckdb

    from sec_financial_pipeline_spark.registry import all_queries

    qq_ids = [1000024, 1000040, 1000073, 1000085]
    rows = [(i, "qq", "synth", "alpha beta gamma", 16) for i in qq_ids] + [
        (i, "en", "synth", "the fast table", 14) for i in range(1, 9)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string, n_chars int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    q = all_queries()["doc_stratified_sample"]
    # the registry row is section-tagged since r7 (mix + epoch_shuffle);
    # the corpus-mixing semantics under test live in the 'mix' section
    got = {
        r["lang"]: r
        for r in q.fn(spark, str(tmp_path)).collect()
        if r["section"] == "mix"
    }
    assert "qq" in got, "zero-upsample stratum dropped by the join"
    assert got["qq"]["n_kept"] == len(qq_ids)
    assert got["qq"]["n_upsampled"] == 0
    assert got["qq"]["up_rate"] == 0.5

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    # oracle columns: section, lang, n_kept, rate, n_upsampled, up_rate, ...
    oracle = {
        r[1]: r
        for r in con.execute(q.oracle).fetchall()
        if r[0] == "mix"
    }
    con.close()
    assert set(got) == set(oracle)
    for lang, r in got.items():
        o = oracle[lang]
        assert (r["n_kept"], r["n_upsampled"]) == (o[2], o[4]), lang
        assert abs(r["rate"] - float(o[3])) < 1e-9 and abs(r["up_rate"] - float(o[5])) < 1e-9


def test_incremental_store_probe_equals_full_recompute(
    spark, sf_dir, monkeypatch, tmp_path
):
    """The persisted-store ingest path (corpus bands saved to parquet,
    batch banded + probed) must emit exactly the full-recompute pair
    set restricted to pairs touching >= 1 batch doc — a witness
    independent of the registry oracle's shared algorithm."""
    import tempfile

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.registry import similarity as rs
    from sec_financial_pipeline_spark.sources.testdata import load_table

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    d = load_table(spark, sf_dir, "documents")
    full = S.lsh_candidate_pairs(
        S.minhash_signatures(d, "doc_id", "text"), "doc_id"
    )
    expected = sorted(
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] % 5 == 0 or r["id_b"] % 5 == 0
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in rs.q_doc_incr_dedup_serve(spark, sf_dir).collect()
    )
    assert got == expected and len(expected) > 0
    # and the second call reuses the persisted store (no rebuild)
    import os

    path = rs.ensure_minhash_store(spark, sf_dir)
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    again = sorted(
        (r["id_a"], r["id_b"])
        for r in rs.q_doc_incr_dedup_serve(spark, sf_dir).collect()
    )
    assert again == expected
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime


def test_publish_atomically_loser_discards(tmp_path):
    """If the destination already exists (another process won the
    build race), the loser's build is discarded and the existing
    artifact is untouched — never overwritten mid-read."""
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _publish_atomically,
    )

    dest = str(tmp_path / "artifact")
    os.makedirs(dest)
    with open(os.path.join(dest, "marker"), "w") as f:
        f.write("winner")

    def build(p):
        os.makedirs(p)
        with open(os.path.join(p, "marker"), "w") as f:
            f.write("loser")

    _publish_atomically(build, dest)
    with open(os.path.join(dest, "marker")) as f:
        assert f.read() == "winner"
    # the loser's temp build dir was cleaned up
    assert [e for e in os.listdir(tmp_path)] == ["artifact"]


def test_two_batch_ingest_loop_matches_full_recompute(spark, sf_dir, tmp_path):
    """The full production loop over TWO ingest batches — build store
    from the standing corpus, probe batch 1, append batch 1, probe
    batch 2 — must give batch 2 exactly the pairs a full recompute
    over (corpus + batch1 + batch2) emits for batch-2-touching pairs."""
    from pyspark.sql import functions as F  # noqa: F811

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = F.col("doc_id") % 5 == 0
    b2 = F.col("doc_id") % 5 == 1
    store_path = str(tmp_path / "mh_store")
    S.save_signature_store(
        S.minhash_signatures(d.filter(~b1 & ~b2), "doc_id", "text"),
        "doc_id",
        store_path,
    )
    # ingest batch 1: probe (result unused here), then commit its bands
    sig1 = S.minhash_signatures(d.filter(b1), "doc_id", "text")
    S.incremental_candidate_pairs(
        sig1, "doc_id", S.load_signature_store(spark, store_path)
    ).count()
    S.append_to_signature_store(sig1, "doc_id", store_path)
    # ingest batch 2 against the grown store
    sig2 = S.minhash_signatures(d.filter(b2), "doc_id", "text")
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in S.incremental_candidate_pairs(
            sig2, "doc_id", S.load_signature_store(spark, store_path)
        ).collect()
    )
    full = S.lsh_candidate_pairs(
        S.minhash_signatures(d, "doc_id", "text"), "doc_id"
    )
    expected = sorted(
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] % 5 == 1 or r["id_b"] % 5 == 1
    )
    assert got == expected and len(expected) > 0


def test_incremental_sign_code_store_matches_full(spark, sf_dir, tmp_path):
    """The embedding ingest twin: a batch's sign-LSH codes probed
    against a persisted code store must equal the full-corpus
    sign-LSH candidate pairs restricted to batch-touching pairs."""
    from pyspark.sql import functions as F  # noqa: F811

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.registry.similarity import (
        _SIGN_BITS,
        _sign_planes,
    )
    from sec_financial_pipeline_spark.sources.testdata import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    codes = S.sign_lsh_bands(e, "vec_id", _sign_planes(e), _SIGN_BITS).persist()
    try:
        full = sorted(
            (r["id_a"], r["id_b"])
            for r in S.sign_lsh_candidate_pairs(codes, "vec_id").collect()
        )
        is_batch = F.col("vec_id") % 4 == 1
        store_path = str(tmp_path / "code_store")
        S.save_sign_code_store(codes.filter(~is_batch), "vec_id", store_path)
        got = sorted(
            (r["id_a"], r["id_b"])
            for r in S.incremental_sign_pairs(
                codes.filter(is_batch),
                "vec_id",
                spark.read.parquet(store_path),
            ).collect()
        )
        expected = sorted(
            (a, b) for a, b in full if a % 4 == 1 or b % 4 == 1
        )
        assert got == expected and len(expected) > 0
    finally:
        codes.unpersist()


def test_delete_from_store_forgets_documents(spark, sf_dir, tmp_path):
    """Right-to-be-forgotten: after delete_from_store, the forgotten
    ids vanish from the store and from every subsequent probe; the
    surviving pair set equals a store rebuilt without them."""
    from pyspark.sql import functions as F  # noqa: F811

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_batch = F.col("doc_id") % 5 == 0
    corpus = d.filter(~is_batch)
    store_path = str(tmp_path / "store")
    S.save_signature_store(
        S.minhash_signatures(corpus, "doc_id", "text"), "doc_id", store_path
    )
    forget = [
        r["doc_id"] for r in corpus.limit(40).collect()
    ]
    remaining = S.delete_from_store(spark, store_path, forget)
    store = S.load_signature_store(spark, store_path)
    assert store.filter(F.col("id").isin(forget)).count() == 0
    assert store.count() == remaining

    sig_b = S.minhash_signatures(d.filter(is_batch), "doc_id", "text")
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in S.incremental_candidate_pairs(
            sig_b, "doc_id", store
        ).collect()
    )
    rebuilt_path = str(tmp_path / "rebuilt")
    S.save_signature_store(
        S.minhash_signatures(
            corpus.filter(~F.col("doc_id").isin(forget)), "doc_id", "text"
        ),
        "doc_id",
        rebuilt_path,
    )
    expected = sorted(
        (r["id_a"], r["id_b"])
        for r in S.incremental_candidate_pairs(
            sig_b, "doc_id", S.load_signature_store(spark, rebuilt_path)
        ).collect()
    )
    assert got == expected
    assert not any(a in forget or b in forget for a, b in got)


def test_delete_every_row_leaves_readable_empty_store(spark, sf_dir, tmp_path):
    """Purging ALL remaining ids must leave a readable zero-row store,
    not a destroyed one: a partitioned write of an empty DataFrame
    emits no data files, which swap_rewrite detects and rewrites
    non-partitioned so the schema survives."""
    from pyspark.sql import functions as F  # noqa: F811

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(30)
    store_path = str(tmp_path / "store_all_deleted")
    S.save_signature_store(
        S.minhash_signatures(d, "doc_id", "text"), "doc_id", store_path
    )
    all_ids = [r["doc_id"] for r in d.collect()]
    remaining = S.delete_from_store(spark, store_path, all_ids)
    assert remaining == 0
    # store stays loadable with the full schema and zero rows
    store = spark.read.parquet(store_path)
    assert store.count() == 0
    assert set(store.columns) == {"id", "band_no", "band_hash"}


def test_store_lifecycle_torture_sequence(spark, sf_dir, tmp_path):
    """Every maintenance operation chained on one store — build ->
    delete-some -> compact -> delete-ALL -> re-append -> delete-some ->
    compact — with the invariant checked after each step: the store
    always loads, and its band rows always equal a store built directly
    from the currently-live documents."""
    from pyspark.sql import functions as F  # noqa: F811

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.sink import compact
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    all_ids = [r.doc_id for r in d.collect()]
    path = str(tmp_path / "store")

    def sigs_of(ids):
        return S.minhash_signatures(
            d.filter(F.col("doc_id").isin(list(ids))), "doc_id", "text"
        )

    def assert_store_equals(ids):
        store = S.load_signature_store(spark, path)
        got = sorted(
            (r.id, r.band_no, r.band_hash) for r in store.collect()
        )
        want = sorted(
            (r.id, r.band_no, r.band_hash)
            for r in S.band_table(sigs_of(ids), "doc_id").collect()
        )
        assert got == want

    live = list(all_ids)
    S.save_signature_store(sigs_of(live), "doc_id", path)
    assert_store_equals(live)

    drop1 = live[:15]
    live = live[15:]
    S.delete_from_store(spark, path, drop1)
    assert_store_equals(live)

    compact(spark, path, partition_cols=("band_no",))
    assert_store_equals(live)

    S.delete_from_store(spark, path, live)  # delete ALL
    assert_store_equals([])

    live = all_ids[10:50]
    S.append_to_signature_store(sigs_of(live), "doc_id", path)
    assert_store_equals(live)

    drop2 = live[:5]
    live = live[5:]
    S.delete_from_store(spark, path, drop2)
    assert_store_equals(live)

    compact(spark, path, partition_cols=("band_no",))
    assert_store_equals(live)


def test_delete_from_store_antijoin_scales_to_large_id_batches(
    spark, sf_dir, tmp_path
):
    """VERDICT r7 item 4: deletion takes a DataFrame of ids and runs as
    a left_anti join — a 50k-id batch must neither inflate the plan
    with a literal In-expression nor change the result vs the list
    form."""
    from pyspark.sql import functions as F  # noqa: F811

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    path = str(tmp_path / "store")
    S.save_signature_store(
        S.minhash_signatures(d, "doc_id", "text"), "doc_id", path
    )
    before = spark.read.parquet(path).count()
    victims = [r.doc_id for r in d.limit(20).collect()]
    # 50k ids: the 20 real victims plus 49,980 absent ids — the GDPR
    # batch shape; as a DataFrame, not a literal list
    ids_df = spark.range(10_000_000, 10_049_980).select(
        F.col("id").cast("bigint")
    ).unionByName(
        spark.createDataFrame([(v,) for v in victims], "id bigint")
    )
    remaining = S.delete_from_store(spark, path, ids_df)
    assert remaining < before
    store = spark.read.parquet(path)
    assert store.filter(F.col("id").isin(victims)).count() == 0
    assert store.count() == remaining
    # the deletion predicate is a join, not a 50k-literal In-expression
    kept_plan = spark.read.parquet(path).join(
        S._ids_df(spark, ids_df, "id"), "id", "left_anti"
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in kept_plan


def test_temperature_mixture_matches_python_witness(spark, sf_dir):
    """Temperature-alpha resampling: per-row multiplicity replicated in
    pure Python (md5 u32 + integer threshold arithmetic), and the
    flattening property holds — rare strata gain expected multiplicity
    > 1, the dominant stratum < 1, total expectation == corpus size."""
    import hashlib as _hl
    import math

    from sec_financial_pipeline_spark.operators.sampling import (
        temperature_mixture,
        temperature_mixture_thresholds,
    )
    from sec_financial_pipeline_spark.sources.testdata import load_table

    alpha, salt = 0.6, "tw"
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    rows = [(r.doc_id, r.lang) for r in d.collect()]
    counts: dict[str, int] = {}
    for _, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    total = sum(counts.values())
    S = sum(n**alpha for n in counts.values())
    th_py = {
        lang: math.floor(2**32 * total * n ** (alpha - 1.0) / S)
        for lang, n in counts.items()
    }
    th = {
        r.lang: r.threshold
        for r in temperature_mixture_thresholds(d, "lang", alpha).collect()
    }
    assert th == th_py
    # the flattening property (documents has a skewed lang mix)
    mult = {lang: t / 2**32 for lang, t in th.items()}
    assert max(mult.values()) > 1.0 and min(mult.values()) < 1.0
    assert abs(sum(mult[lang] * counts[lang] for lang in counts) - total) < 1.0

    def copies(doc_id, lang):
        u = int(_hl.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16)
        t = th_py[lang]
        return (t >> 32) + (1 if u < (t & 0xFFFFFFFF) else 0)

    want = sorted(
        (doc_id, k)
        for doc_id, lang in rows
        for k in range(1, copies(doc_id, lang) + 1)
    )
    got = sorted(
        (r.doc_id, r.copy_no)
        for r in temperature_mixture(
            d, key="doc_id", stratum="lang", alpha=alpha, salt=salt
        ).collect()
    )
    assert got == want
    # partitioning-invariance: same emitted multiset after repartition
    got2 = sorted(
        (r.doc_id, r.copy_no)
        for r in temperature_mixture(
            d.repartition(13), key="doc_id", stratum="lang",
            alpha=alpha, salt=salt,
        ).collect()
    )
    assert got2 == want


def test_delete_from_store_with_string_ids(spark, tmp_path):
    """The id column is whatever type the store was built with —
    string doc-ids are first-class. _ids_df previously hardcoded a
    'bigint' schema for Python-list ids, so deletion from a string-id
    store raised TypeError in createDataFrame; the schema now comes
    from the target column (list AND DataFrame inputs)."""
    from pyspark.sql import functions as F  # noqa: F811

    from sec_financial_pipeline_spark.operators import similarity as S

    docs = spark.createDataFrame(
        [(f"doc-{i:03d}", f"text body number {i} " * 8) for i in range(40)],
        "doc_id string, text string",
    )
    path = str(tmp_path / "store")
    S.save_signature_store(
        S.minhash_signatures(docs, "doc_id", "text"), "doc_id", path
    )
    forget = [f"doc-{i:03d}" for i in range(0, 40, 4)]
    remaining = S.delete_from_store(spark, path, forget)
    store = S.load_signature_store(spark, path)
    assert dict(store.dtypes)["id"] == "string"
    assert store.filter(F.col("id").isin(forget)).count() == 0
    assert store.count() == remaining
    assert remaining > 0
    # DataFrame-shaped ids against the same string store also work
    more = spark.createDataFrame(
        [(f"doc-{i:03d}",) for i in range(1, 40, 8)], "x string"
    )
    remaining2 = S.delete_from_store(spark, path, more)
    assert remaining2 < remaining
    # deleting ids absent from the store is a no-op, not an error
    assert S.delete_from_store(spark, path, ["nope"]) == remaining2
