"""Unit coverage for the two round-7 additions: the deterministic epoch
shuffle (dataloader shard/ordering primitive) and the train/eval n-gram
contamination audit (GPT-3-style decontamination check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.dedup import ngram_contamination
from sec_financial_pipeline_spark.operators.sampling import epoch_shuffle


def test_epoch_shuffle_is_a_permutation(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = d.count()
    s = epoch_shuffle(d, key="doc_id", n_shards=8, seed="t1")
    rows = s.collect()
    # every doc appears exactly once, across all shards
    assert len(rows) == n
    assert len({r.doc_id for r in rows}) == n
    # within each shard, pos is exactly 1..shard_size (contiguous ranks)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_epoch_shuffle_deterministic_across_partitionings(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = epoch_shuffle(d.repartition(1), key="doc_id", n_shards=4, seed="t2")
    b = epoch_shuffle(d.repartition(17), key="doc_id", n_shards=4, seed="t2")
    ra = sorted((r.doc_id, r.shard, r.pos) for r in a.collect())
    rb = sorted((r.doc_id, r.shard, r.pos) for r in b.collect())
    assert ra == rb


def test_epoch_shuffle_seed_changes_permutation(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = {
        r.doc_id: (r.shard, r.pos)
        for r in epoch_shuffle(d, "doc_id", 4, seed="sA").collect()
    }
    b = {
        r.doc_id: (r.shard, r.pos)
        for r in epoch_shuffle(d, "doc_id", 4, seed="sB").collect()
    }
    # same key set, but the assignment differs for a large fraction of docs
    assert a.keys() == b.keys()
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > len(a) * 0.5


def test_ngram_contamination_flags_copied_ngrams(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six"),
        ],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [
            # shares the 5-grams starting at alpha..delta (4 overlaps)
            (10, "alpha beta gamma delta epsilon zeta eta iota"),
            # entirely novel text -> clean
            (11, "red orange yellow green blue indigo"),
            # too short for any 5-gram -> present with 0
            (12, "tiny doc"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination(ev, train, "doc_id", "text", k=5).collect()
    }
    assert out[10] == 3  # alpha.., beta.., gamma.. (delta.. ends at iota)
    assert out[11] == 0
    assert out[12] == 0
    assert len(out) == 3


def test_ngram_contamination_counts_distinct_not_occurrences(spark):
    # a 5-gram repeated in BOTH sides still counts once (distinct shingles)
    train = spark.createDataFrame(
        [(1, "a b c d e a b c d e")], "doc_id bigint, text string"
    )
    ev = spark.createDataFrame(
        [(10, "a b c d e x a b c d e")], "doc_id bigint, text string"
    )
    out = ngram_contamination(ev, train, "doc_id", "text", k=5).collect()
    # eval's distinct 5-grams: {a b c d e, b c d e x, c d e x a, d e x a b,
    #  e x a b c, x a b c d}; train's: {a b c d e, b c d e a, c d e a b,
    #  d e a b c, e a b c d} -> only 'a b c d e' overlaps
    assert out[0].n_overlap == 1


def test_ngram_contamination_hashed_equals_exact(spark, sf_dir):
    """The hash_shingles scale path (xxhash64 keys + pinned shuffle
    join) must produce identical per-doc counts to the exact string
    join on real data (collisions are ~2^-64 per pair; none at test
    scale)."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.sampling import hash_uniform

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    is_eval = hash_uniform(F.col("doc_id"), "eval1") < 0.1
    ev, tr = d.filter(is_eval), d.filter(~is_eval)
    exact = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination(ev, tr, "doc_id", "text", k=5).collect()
    }
    hashed = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination(
            ev, tr, "doc_id", "text", k=5, hash_shingles=True
        ).collect()
    }
    assert exact == hashed
    assert sum(exact.values()) > 0  # the fixture actually has overlaps


def test_write_epoch_shards_streams_in_permutation_order(spark, sf_dir, tmp_path):
    """The materialized epoch reads back as the permutation: each shard
    dir holds its docs stored in pos order, and the union over shards
    is exactly the input key set."""
    import glob

    import pyarrow.parquet as pq

    from sec_financial_pipeline_spark.operators.sampling import (
        epoch_shuffle,
        write_epoch_shards,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    path = str(tmp_path / "epoch0")
    write_epoch_shards(d, "doc_id", n_shards=4, seed="e0", path=path)

    expect = {}
    for r in epoch_shuffle(d, "doc_id", 4, seed="e0").collect():
        expect.setdefault(r.shard, []).append((r.pos, r.doc_id))
    seen = set()
    for shard, want in expect.items():
        files = sorted(glob.glob(f"{path}/shard={shard}/*.parquet"))
        assert files, f"no files for shard {shard}"
        got = []
        for f in files:
            got.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        assert got == [doc for _, doc in sorted(want)], f"shard {shard} order"
        seen.update(got)
    assert seen == {r.doc_id for r in d.collect()}


def test_contamination_vs_store_matches_live_recompute(spark, sf_dir, tmp_path):
    """The ingest-time gate (persisted eval shingle store + batch
    probe) must equal ngram_contamination computed live with the same
    eval side — store round-trip changes nothing."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.dedup import (
        contamination_vs_store,
        save_eval_shingle_store,
    )
    from sec_financial_pipeline_spark.operators.sampling import hash_uniform

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    is_eval = hash_uniform(F.col("doc_id"), "eval1") < 0.1
    ev = d.filter(is_eval)
    # pin the batch: an unordered limit() re-executed by two jobs may
    # pick different rows; the parquet round-trip freezes the choice
    batch_dir = str(tmp_path / "batch")
    d.filter(~is_eval).limit(200).write.parquet(batch_dir)
    batch = spark.read.parquet(batch_dir)

    path = str(tmp_path / "eval_shingles")
    save_eval_shingle_store(ev, "text", path, k=5)
    via_store = {
        r.doc_id: r.n_overlap
        for r in contamination_vs_store(batch, "doc_id", "text", path, k=5).collect()
    }
    live = {
        r.doc_id: r.n_overlap
        for r in ngram_contamination(batch, ev, "doc_id", "text", k=5).collect()
    }
    assert via_store == live
    assert len(via_store) == 200


def test_contamination_store_k_mismatch_is_a_hard_error(spark, tmp_path):
    """A probe k different from the store's build k silently matches
    nothing — the metadata sidecar must turn it into a ValueError."""
    import pytest

    from sec_financial_pipeline_spark.operators.dedup import (
        contamination_vs_store,
        save_eval_shingle_store,
    )

    ev = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id bigint, text string"
    )
    path = str(tmp_path / "store")
    save_eval_shingle_store(ev, "text", path, k=5)
    with pytest.raises(ValueError, match="k=5"):
        contamination_vs_store(ev, "doc_id", "text", path, k=4)


def test_write_epoch_shards_multi_file_reads_back_in_order(
    spark, sf_dir, tmp_path
):
    """files_per_shard=k > 1 (VERDICT r7 item 5): each shard splits
    into k CONTIGUOUS pos ranges under shard=K/subshard=J dirs; reading
    a shard's subshards in ascending numeric order and concatenating
    yields the identical per-shard permutation the k=1 layout stores —
    so no single task ever sorts a whole shard at 100 TB."""
    import glob
    import re

    import pyarrow.parquet as pq

    from sec_financial_pipeline_spark.operators.sampling import (
        epoch_shuffle,
        write_epoch_shards,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    path = str(tmp_path / "epoch_k3")
    write_epoch_shards(
        d, "doc_id", n_shards=4, seed="e0", path=path, files_per_shard=3
    )

    expect = {}
    for r in epoch_shuffle(d, "doc_id", 4, seed="e0").collect():
        expect.setdefault(r.shard, []).append((r.pos, r.doc_id))
    seen = set()
    for shard, want in expect.items():
        subs = sorted(
            glob.glob(f"{path}/shard={shard}/subshard=*"),
            key=lambda p: int(re.search(r"subshard=(\d+)", p).group(1)),
        )
        assert len(subs) == 3, f"shard {shard} should have 3 subshards"
        got = []
        for sub in subs:
            for f in sorted(glob.glob(f"{sub}/*.parquet")):
                got.extend(
                    pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
                )
        assert got == [doc for _, doc in sorted(want)], f"shard {shard} order"
        seen.update(got)
    assert seen == {r.doc_id for r in d.collect()}


def test_write_epoch_shards_rejects_duplicate_keys(spark, tmp_path):
    """ADVICE r7: epoch_shuffle's unique-key precondition is enforced
    where the epoch is materialized — duplicate keys would attach pos
    values to different rows' columns run-to-run."""
    import pytest

    from sec_financial_pipeline_spark.operators.sampling import (
        write_epoch_shards,
    )

    d = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="must be unique"):
        write_epoch_shards(
            d, "doc_id", n_shards=2, seed="x", path=str(tmp_path / "dup")
        )
