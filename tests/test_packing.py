"""Two-phase distributed prefix sum for sequence packing: the offsets
must equal the single-task global-window cumsum at ANY partition count
(the whole point of the partial-sums + broadcast-bases design), and the
physical plan must contain no un-partitioned window over the corpus."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.packing import pack_offsets


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.hash(F.col("id").cast("string")), 97) + 1).alias("n_tok"),
    )


def test_offsets_match_global_cumsum_any_partitioning(spark):
    d = _docs(spark)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.doc_id: r.off
        for r in d.select(
            "doc_id", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("off")
        ).collect()
    }
    for n_part in (1, 3, 16):
        got = {
            r.doc_id: r.offset
            for r in pack_offsets(
                d, "doc_id", "n_tok", 128, num_partitions=n_part
            ).collect()
        }
        assert got == want, f"offsets diverge at {n_part} partitions"


def test_chunk_span_semantics(spark):
    rows = [(1, 100), (2, 28), (3, 200), (4, 1)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok int")
    out = {
        r.doc_id: (r.offset, r.first_chunk, r.last_chunk)
        for r in pack_offsets(d, "doc_id", "n_tok", 128).collect()
    }
    # doc1: [0,100) -> chunk 0 only; doc2: [100,128) -> chunk 0 exactly
    # (ends at the boundary); doc3: [128,328) -> chunks 1..2; doc4:
    # [328,329) -> chunk 2
    assert out == {
        1: (0, 0, 0),
        2: (100, 0, 0),
        3: (128, 1, 2),
        4: (328, 2, 2),
    }


def test_corpus_window_is_partitioned(spark):
    d = _docs(spark, 500)
    plan = pack_offsets(d, "doc_id", "n_tok", 128)._jdf.queryExecution(
    ).executedPlan().toString()
    # every Window over the corpus must carry a partition spec; the only
    # un-partitioned window runs over the per-bucket subtotal table
    # (bounded by the bucket count, not the data)
    corpus_windows = [
        ln for ln in plan.splitlines()
        if "Window " in ln and "__bkt" not in ln
    ]
    assert not [ln for ln in corpus_windows if "n_tok" in ln], corpus_windows


def test_plan_is_deterministic_no_partition_id(spark):
    """The round-3 red row: repartitionByRange sampling +
    spark_partition_id() evaluated twice could disagree between the
    subtotal branch and the join stream branch. The rebuilt operator
    must carry NO nondeterministic bucket source in the plan."""
    d = _docs(spark, 500)
    out = pack_offsets(d, "doc_id", "n_tok", 128)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    physical = out._jdf.queryExecution().executedPlan().toString()
    for plan in (analyzed, physical):
        assert "SPARK_PARTITION_ID" not in plan.upper(), plan
        assert "repartitionbyrange" not in plan.lower(), plan


def _skewed_docs(spark, n=20000):
    # heavy skew: 90% of ids collapse into a narrow key region, sizes
    # vary 1..10k — the shape where a sampled range partitioner is most
    # likely to draw different boundaries per evaluation
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.col("id") % 37)
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("doc_id"),
        (F.pmod(F.hash(F.col("id").cast("string")), 9999) + 1).alias("n_tok"),
    ).drop("k")


def test_run_twice_same_session_identical(spark):
    """Two executions of the SAME packing query in one long-lived
    session must agree exactly (the class of bug the driver caught in
    r03 and local parity missed)."""
    d = _skewed_docs(spark)
    runs = []
    for _ in range(2):
        out = pack_offsets(d, "doc_id", "n_tok", 1024, num_partitions=16)
        runs.append(sorted(
            (r.doc_id, r.offset, r.first_chunk, r.last_chunk)
            for r in out.collect()
        ))
    assert runs[0] == runs[1]
    # and the offsets equal the global cumsum ground truth
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.doc_id: r.off
        for r in d.select(
            "doc_id", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("off")
        ).collect()
    }
    assert {t[0]: t[1] for t in runs[0]} == want


def test_offsets_invariant_under_shuffle_partitions(spark):
    """Perturbing spark.sql.shuffle.partitions must not change offsets
    — bucket assignment is a pure expression over literal boundaries."""
    d = _skewed_docs(spark, 5000)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for sp in ("7", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            out = pack_offsets(d, "doc_id", "n_tok", 512, num_partitions=8)
            results.append(sorted(
                (r.doc_id, r.offset) for r in out.collect()
            ))
        assert results[0] == results[1]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_assembly_reconciles_with_offsets(spark):
    """Every interior chunk is exactly full; the tail chunk holds the
    remainder; per-doc slice totals equal the doc's token count; and the
    slices tile each chunk contiguously (no gaps, no overlaps)."""
    from sec_financial_pipeline_spark.operators.packing import assemble_chunks

    C = 128
    d = _docs(spark, 300)
    packed = pack_offsets(d, "doc_id", "n_tok", C)
    chunks = assemble_chunks(packed, "n_tok", C).collect()
    total = d.agg(F.sum("n_tok")).collect()[0][0]

    per_chunk: dict[int, list] = {}
    per_doc: dict[int, int] = {}
    for r in chunks:
        per_chunk.setdefault(r.chunk_id, []).append((r.chunk_off, r.slice_len))
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.slice_len

    n_chunks = (total + C - 1) // C
    assert set(per_chunk) == set(range(n_chunks))
    for cid, slices in per_chunk.items():
        slices.sort()
        expect_len = C if cid < n_chunks - 1 else total - (n_chunks - 1) * C
        assert sum(s for _, s in slices) == expect_len, cid
        pos = 0
        for off, ln in slices:
            assert off == pos, f"gap/overlap in chunk {cid}"
            pos += ln

    want_per_doc = {r.doc_id: r.n_tok for r in d.collect()}
    assert per_doc == want_per_doc


def test_zero_size_rows_pack_and_assemble(spark):
    """Zero-token rows take their boundary offset, span exactly their
    containing chunk, and contribute a zero-length slice that does not
    perturb the tiling of real content."""
    from sec_financial_pipeline_spark.operators.packing import assemble_chunks

    rows = [(1, 100), (2, 0), (3, 28), (4, 0), (5, 200)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok int")
    packed = pack_offsets(d, "doc_id", "n_tok", 128)
    by_id = {r.doc_id: r for r in packed.collect()}
    assert by_id[2].offset == 100 and by_id[4].offset == 128
    assert (by_id[2].first_chunk, by_id[2].last_chunk) == (0, 0)
    assert (by_id[4].first_chunk, by_id[4].last_chunk) == (1, 1)

    chunks = assemble_chunks(packed, "n_tok", 128).collect()
    zero_slices = [r for r in chunks if r.doc_id in (2, 4)]
    assert all(r.slice_len == 0 for r in zero_slices)
    total = sum(r.slice_len for r in chunks)
    assert total == sum(n for _, n in rows)


def test_length_bucketed_batches_invariants(spark, sf_dir):
    """Padded-batch assembly: every batch respects its band capacity,
    every within-budget band's batch fits the token budget exactly by
    construction, an over-budget doc gets a solo batch, and the batch
    assignment is a pure function of (band, key) — identical on any
    partitioning."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.packing import (
        length_bucketed_batches,
    )

    BUDGET, PAD = 512, 32
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
        # plant an over-budget document: must get a solo batch
        .unionByName(
            spark.createDataFrame([(990_001, 2000)], "doc_id long, n_tok int")
        )
    )
    out = length_bucketed_batches(
        d, "doc_id", "n_tok", token_budget=BUDGET, pad_multiple=PAD
    )
    rows = out.collect()
    assert len(rows) == d.count()
    # band arithmetic: next multiple of PAD, >= PAD
    for r in rows:
        assert r.band % PAD == 0 and r.band >= max(r.n_tok, PAD) > r.band - PAD
    per_batch = (
        out.groupBy("band", "batch_no")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("batch_capacity").alias("cap"),
            F.sum("padded_tokens").alias("padded"),
        )
        .collect()
    )
    for b in per_batch:
        assert b.n <= b.cap
        if b.band <= BUDGET:
            assert b.padded <= BUDGET
    solo = [r for r in rows if r.doc_id == 990_001]
    assert solo[0].batch_capacity == 1 and solo[0].band == 2016
    # determinism across physical layouts
    a = {
        (r.doc_id, r.band, r.batch_no)
        for r in length_bucketed_batches(
            d.repartition(1), "doc_id", "n_tok", BUDGET, PAD
        ).collect()
    }
    b = {
        (r.doc_id, r.band, r.batch_no)
        for r in length_bucketed_batches(
            d.repartition(17), "doc_id", "n_tok", BUDGET, PAD
        ).collect()
    }
    assert a == b
    # max_batch_rows cap binds
    capped = length_bucketed_batches(
        d, "doc_id", "n_tok", BUDGET, PAD, max_batch_rows=3
    )
    assert (
        capped.groupBy("band", "batch_no")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 3)
        .count()
        == 0
    )
