"""Codegen-ON canary tier (VERDICT r11 item 5).

The suite runs interpreted (``spark.sql.codegen.wholeStage=false``, an
A/B-measured 2.8x suite-latency win) and the driver-sim/oracle gate
exercises default codegen — but only over the 50 registry rows. These
canaries close the remaining gap: one test per operator family plus
the CLI, matview fold, and snaptable DML expression paths, each run
WITH whole-stage codegen (the production default) and differentially
compared against the interpreted run of the SAME plan. Interpreted
execution is Spark's own codegen-compile-failure fallback, so the two
must be bit-identical; a codegen-only miscompile diverges here.

Budget: sf0.001 inputs, 21 tests, ~95s of calls serial (dominated by
janino compile — the thing the tier exists to exercise); inside the
4-shard standing gate the wall contribution is ~25s.
"""

from __future__ import annotations

import contextlib
import os

import pytest

SF = os.environ.get("SFP_CANARY_SF_DIR", "/root/testdata/sf0.001")

_CG = "spark.sql.codegen.wholeStage"


@contextlib.contextmanager
def codegen_on(spark):
    old = spark.conf.get(_CG)
    spark.conf.set(_CG, "true")
    try:
        yield spark
    finally:
        spark.conf.set(_CG, old)


def _rows(df):
    # None-safe total order (result sets may carry NULL cells)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


#: one registry row per operator family — together these plans cover
#: scalar functions, windows/top-k, grouping sets, semi/anti joins,
#: as-of + range joins, sessionization, SEC decimal aggregates,
#: shingle/editdist text ops, the quality-rule battery, regex
#: redaction, sampling/DSIR/PSI folds, packing + unigram Viterbi
#: F.aggregate folds, vector math + BM25 + RRF, multimodal binary
#: codecs, snaptable scan/CDF/matview/joinchain sections, and the CDC
#: merge — the full expression surface the interpreted suite exercises.
FAMILIES = [
    "rel_scalar_functions",
    "rel_topk",
    "rel_grouping_sets",
    "rel_existence_joins",
    "adv_asof_attribution",
    "evt_sessionize",
    "sec_ratio_suite",
    "doc_exact_dedup",
    "doc_ngram_jaccard",
    "doc_profile",
    "doc_redact",
    "doc_stratified_sample",
    # doc_pack_chunks rides as its offsets constituent (the merged row
    # re-trains the unigram EM twice — 38s of the tier's budget); the
    # Viterbi/backtrace F.aggregate folds get their own bespoke canary
    # below on an in-memory corpus
    "doc_pack_chunks",
    "emb_cosine_topk",
    "mm_media_stats",
    "pipe_freshness_policy",
    "pipe_incremental",
]


def _family_fn(name):
    from sec_financial_pipeline_spark.registry import all_queries
    from sec_financial_pipeline_spark.registry import llm_text

    return {
        "doc_pack_chunks": llm_text.q_doc_pack_offsets,
    }.get(name) or all_queries()[name].fn


@pytest.mark.parametrize("name", FAMILIES)
def test_codegen_equals_interpreted(name, spark):
    fn = _family_fn(name)
    with codegen_on(spark):
        on = _rows(fn(spark, SF))
    off = _rows(fn(spark, SF))
    assert on, f"{name}: canary ran vacuously (0 rows at {SF})"
    assert on == off, f"{name}: codegen output diverged from interpreted"


def test_codegen_unigram_viterbi_folds(spark):
    """The tier's F.aggregate-fold surface (unigram train + apply:
    forward Viterbi fold, backtrace fold, UNK augmentation, join-back)
    under codegen, on an in-memory corpus — differential vs the
    interpreted run of the same plans."""
    from sec_financial_pipeline_spark.operators import unigram as U

    texts = [
        "the cat sat on the mat",
        "the cats sat on mats",
        "catalogue of the catastrophe",
        "zq unseen#chars here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def run():
        scores = U.train_unigram(df.filter("doc_id < 3"), "text", iters=1)
        return _rows(U.apply_unigram(df, "doc_id", "text", scores))

    with codegen_on(spark):
        on = run()
    off = run()
    assert on and on == off


def test_codegen_snaptable_dml(spark, tmp_path):
    """DML expression paths under codegen: create -> append -> MERGE
    with t./s. expressions -> merge-on-read DV delete -> change feed.
    Expected state computed in plain Python."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    with codegen_on(spark):
        path = str(tmp_path / "t")
        mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
            "id", (F.col("id") * 2).alias("v")
        )
        T.create(mk(0, 50), path)
        T.append(mk(100, 150), path)
        src = spark.createDataFrame(
            [(5, 7), (6, 8), (999, 1)], "id bigint, delta bigint"
        )
        T.merge_into(
            src, path, ["id"],
            when_matched={"v": "t.v + s.delta"},
            when_not_matched="ignore",
        )
        T.delete_where(spark, path, "id % 10 = 3", mode="dv", cdf=True)
        want = {}
        for i in list(range(0, 50)) + list(range(100, 150)):
            if i % 10 == 3:
                continue
            want[i] = i * 2 + {5: 7, 6: 8}.get(i, 0)
        got = {r.id: r.v for r in T.read(spark, path).collect()}
        assert got == want
        feed = T.change_feed(spark, path, since_version=1)
        kinds = {
            r["_change_type"] for r in feed.select("_change_type").collect()
        }
        assert "delete" in kinds


def test_codegen_matview_refresh(spark, tmp_path):
    """The incremental matview fold expressions under codegen: one
    append + refresh cycle; view state equals a full recompute."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import matview as MV
    from sec_financial_pipeline_spark.sources import snaptable as T

    with codegen_on(spark):
        src = str(tmp_path / "src")
        view = str(tmp_path / "view")
        mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
            (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("x")
        )
        T.create(mk(0, 200), src)
        MV.create_matview(
            spark, src, view, group_cols=["k"],
            aggs=[("count", "x", "n"), ("sum", "x", "sum_x")],
        )
        T.append(mk(200, 300), src)
        MV.refresh_matview(spark, view)
        got = {
            r["k"]: (r["n"], r["sum_x"])
            for r in MV.read_matview(spark, view).collect()
        }
        want: dict = {}
        for i in range(300):
            k = i % 7
            n, sx = want.get(k, (0, 0))
            want[k] = (n + 1, sx + i * 3)
        assert got == {k: (n, float(sx)) for k, (n, sx) in want.items()}


def test_codegen_cli_etl_path(spark, capsys, tmp_path):
    """One CLI ETL path end-to-end under codegen: fetch -> flatten ->
    partitioned warehouse write -> job ledger."""
    import json

    from sec_financial_pipeline_spark.cli import main

    with codegen_on(spark):
        wh = str(tmp_path / "facts")
        rc = main(
            ["--sf-dir", SF, "--warehouse", wh, "etl", "fetch", "T01"],
            spark=spark,
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["jobs"] == {"T01": "completed"}
        assert spark.read.parquet(wh).count() > 0
