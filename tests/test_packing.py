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
    # un-partitioned window runs over the per-partition subtotal table
    # (bounded by the partition count, not the data)
    corpus_windows = [
        ln for ln in plan.splitlines()
        if "Window " in ln and "__pid" not in ln
    ]
    assert not [ln for ln in corpus_windows if "n_tok" in ln], corpus_windows
