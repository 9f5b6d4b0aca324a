"""The CLI lifecycle (SURVEY §3.2): fetch materializes a ticker's fact
partitions into the warehouse, incremental selects stale tickers via
the T1 policy over the warehouse's own watermarks, status reports the
ledger + durable freshness view."""

from __future__ import annotations

import json

from sec_financial_pipeline_spark.cli import main, stale_tickers


def _run(capsys, spark, argv) -> dict:
    assert main(argv, spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_etl_fetch_writes_partitions_and_ledger(tmp_path, capsys, spark, sf_dir):
    wh = str(tmp_path / "facts")
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "--warehouse", wh, "etl", "fetch", "T01"],
    )
    assert out["jobs"] == {"T01": "completed"}
    job = out["recent_jobs"][0]
    assert job["ticker"] == "T01" and job["records_processed"] > 0

    stored = spark.read.parquet(wh)
    assert stored.select("ticker").distinct().collect()[0][0] == "T01"
    assert stored.count() == job["records_processed"]
    # partition pruning must reach the directory layout
    assert (tmp_path / "facts" / "ticker=T01").exists()

    # a second ticker lands beside the first (dynamic overwrite)
    _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "--warehouse", wh, "etl", "fetch", "T02"],
    )
    tickers = {
        r[0] for r in spark.read.parquet(wh).select("ticker").distinct().collect()
    }
    assert tickers == {"T01", "T02"}


def test_etl_incremental_selects_stale_by_policy(tmp_path, capsys, spark, sf_dir):
    wh = str(tmp_path / "facts")
    for t in ("T03", "T04"):
        _run(
            capsys, spark,
            ["--sf-dir", sf_dir, "--warehouse", wh, "etl", "fetch", t],
        )
    # synthetic corpus's latest filing is 2001-07; anchored months
    # after, every stored ticker exceeds its staleness tier
    stale = stale_tickers(spark, wh, as_of="2002-01-01")
    assert stale == ["T03", "T04"]

    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "--warehouse", wh,
         "etl", "incremental", "--as-of", "2002-01-01"],
    )
    assert out["stale_tickers"] == ["T03", "T04"]
    assert out["counts"]["completed"] == 2
    assert out["pipeline_stats"]["success_rate"] == 1.0

    # empty warehouse -> nothing stored -> nothing to refresh
    assert stale_tickers(spark, str(tmp_path / "nope"), "2002-01-01") == []


def test_etl_status_reports_warehouse_watermarks(tmp_path, capsys, spark, sf_dir):
    wh = str(tmp_path / "facts")
    _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "--warehouse", wh, "etl", "fetch", "T05"],
    )
    out = _run(
        capsys, spark, ["--sf-dir", sf_dir, "--warehouse", wh, "etl", "status"]
    )
    wm = out["warehouse"]["tickers"]
    assert set(wm) == {"T05"}
    assert wm["T05"]["n_facts"] > 0 and wm["T05"]["n_years"] > 0


def test_etl_compact_reduces_files(tmp_path, capsys, spark, sf_dir):
    wh = str(tmp_path / "facts")
    for t in ("T06", "T07"):
        _run(
            capsys, spark,
            ["--sf-dir", sf_dir, "--warehouse", wh, "etl", "fetch", t],
        )
    before = spark.read.parquet(wh)
    rows_before = before.count()

    out = _run(
        capsys, spark, ["--sf-dir", sf_dir, "--warehouse", wh, "etl", "compact"]
    )
    # one file per (ticker, fiscal_year) partition directory afterwards
    import os

    part_dirs = 0
    for root, dirs, files in os.walk(wh):
        if any(f.endswith(".parquet") for f in files):
            part_dirs += 1
            assert sum(f.endswith(".parquet") for f in files) == 1, root
    assert out["files_after"] == part_dirs >= 2

    after = spark.read.parquet(wh)
    assert after.count() == rows_before  # lossless rewrite


def test_stale_tickers_missing_vs_corrupt_warehouse(tmp_path, spark):
    # missing path: legitimately "nothing stored yet"
    assert stale_tickers(spark, str(tmp_path / "nope"), "2024-01-01") == []

    # corrupt warehouse: must raise, never report "nothing stale"
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"this is not parquet")
    import pytest as _pytest

    with _pytest.raises(Exception):
        stale_tickers(spark, str(bad), "2024-01-01")


def test_explain_prints_physical_plan(capsys, spark, sf_dir):
    rc = main(
        ["--sf-dir", sf_dir, "explain", "rel_topk"], spark=spark
    )
    out = capsys.readouterr().out
    assert rc == 0 and "TakeOrderedAndProject" in out

    rc = main(["--sf-dir", sf_dir, "explain", "list"], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0 and "rel_topk" in out.splitlines()


def test_dedup_lifecycle_build_ingest_status(tmp_path, capsys, spark, sf_dir):
    """dedup build -> ingest -> status: the CLI face of the incremental
    near-dedup loop. After ingesting a batch against a corpus-built
    store, the emitted pairs equal the full recompute restricted to
    batch-touching pairs, and status reflects the grown store."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import similarity as S
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_dir = str(tmp_path / "corpus")
    batch_dir = str(tmp_path / "batch")
    d.filter(F.col("doc_id") % 5 != 0).write.parquet(corpus_dir)
    d.filter(F.col("doc_id") % 5 == 0).write.parquet(batch_dir)
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")

    built = _run(
        capsys, spark,
        ["dedup", "build", "--docs", corpus_dir, "--store", store],
    )
    assert built["docs"] > 0 and built["band_rows"] == built["docs"] * 4

    ingested = _run(
        capsys, spark,
        ["dedup", "ingest", "--docs", batch_dir, "--store", store,
         "--pairs", pairs],
    )
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
        for r in spark.read.parquet(pairs).collect()
    )
    assert got == expected
    assert ingested["pairs_emitted"] == len(expected)

    status = _run(capsys, spark, ["dedup", "status", "--store", store])
    # batch_docs counts documents actually BANDED (short docs with no
    # shingles are dropped), so this arithmetic holds on any corpus
    assert status["docs"] == built["docs"] + ingested["batch_docs"]
    assert set(status["rows_per_band"]) == {"0", "1", "2", "3"}


def test_bm25_cli_full_lifecycle(tmp_path, capsys, spark, sf_dir):
    """bm25 build -> ingest -> delete -> update -> compact -> query ->
    status: the CLI face of the generational retrieval store. The final
    query results must equal scoring a from-scratch index over the
    equivalent final corpus."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.bm25 import (
        bm25_index,
        bm25_score,
    )
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dirs = {n: str(tmp_path / n) for n in
            ("corpus", "batch", "ids", "upd", "queries", "out")}
    d.filter("doc_id % 3 = 0").write.parquet(dirs["corpus"])
    d.filter("doc_id % 3 != 0").write.parquet(dirs["batch"])
    d.filter("doc_id % 13 = 2").select("doc_id").write.parquet(dirs["ids"])
    new_text = F.concat(F.lit("rev "), F.col("text"))
    d.filter("doc_id % 17 = 3 AND doc_id % 13 != 2").withColumn(
        "text", new_text
    ).write.parquet(dirs["upd"])
    store = str(tmp_path / "store")

    built = _run(
        capsys, spark, ["bm25", "build", "--docs", dirs["corpus"],
                        "--store", store],
    )
    assert built["docs"] > 0
    ing = _run(
        capsys, spark, ["bm25", "ingest", "--docs", dirs["batch"],
                        "--store", store],
    )
    assert ing["docs"] == d.count()
    dele = _run(
        capsys, spark, ["bm25", "delete", "--ids", dirs["ids"],
                        "--store", store],
    )
    assert dele["docs_removed"] == d.filter("doc_id % 13 = 2").count()
    _run(
        capsys, spark, ["bm25", "update", "--docs", dirs["upd"],
                        "--store", store],
    )
    comp = _run(capsys, spark, ["bm25", "compact", "--store", store])
    assert comp["rows_purged"] > 0
    st = _run(capsys, spark, ["bm25", "status", "--store", store])
    assert st["tombstones"] == 0
    assert st["docs"] == d.filter("doc_id % 13 != 2").count()

    # final corpus: deleted docs absent, updated docs carry new text
    corpus = d.filter("doc_id % 13 != 2").withColumn(
        "text",
        F.when(F.col("doc_id") % 17 == 3, new_text).otherwise(F.col("text")),
    )
    corpus.filter("doc_id % 53 = 5").write.parquet(dirs["queries"])
    q = _run(
        capsys, spark, ["bm25", "query", "--queries", dirs["queries"],
                        "--store", store, "--out", dirs["out"],
                        "--top-k", "10"],
    )
    assert q["rows"] > 0
    served = sorted(map(tuple, spark.read.parquet(dirs["out"]).collect()))
    p, i, s = bm25_index(corpus, "doc_id", "text")
    qterms = (
        corpus.filter("doc_id % 53 = 5")
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.split(F.col("text"), " ")).alias("term"),
        )
        .distinct()
    )
    scratch = sorted(map(tuple, bm25_score(p, i, s, qterms, 10).collect()))
    assert served == scratch

    absent = _run(
        capsys, spark, ["bm25", "status", "--store", str(tmp_path / "nope")],
    )
    assert absent == {"store": str(tmp_path / "nope"), "exists": False}


def test_dedup_compact_preserves_store_content(tmp_path, capsys, spark, sf_dir):
    """Each ingest appends files into the store's band partitions;
    dedup compact rewrites them small without changing the band rows."""
    import os

    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    for k in range(3):  # three appends -> many small files per band
        part = str(tmp_path / f"part{k}")
        d.filter(F.col("doc_id") % 3 == k).write.parquet(part)
        _run(
            capsys, spark,
            ["dedup", "ingest", "--docs", part, "--store", store,
             "--pairs", pairs],
        )
    before = sorted(
        tuple(r) for r in spark.read.parquet(store)
        .select("id", "band_no", "band_hash").collect()
    )
    n_files_before = sum(
        1 for _, _, fs in os.walk(store) for f in fs if f.endswith(".parquet")
    )
    out = _run(
        capsys, spark,
        ["dedup", "compact", "--store", store, "--files-per-partition", "1"],
    )
    assert out["files_after"] < n_files_before
    after = sorted(
        tuple(r) for r in spark.read.parquet(store)
        .select("id", "band_no", "band_hash").collect()
    )
    assert after == before


def test_decon_gate_build_and_filter(tmp_path, capsys, spark, sf_dir):
    """decon build -> gate: the CLI face of the ingest-time
    decontamination gate. The gated output equals the operator-level
    filter, and kept + dropped == batch."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.dedup import ngram_contamination
    from sec_financial_pipeline_spark.operators.sampling import hash_uniform
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_eval = hash_uniform(F.col("doc_id"), "eval1") < 0.1
    ev_dir, batch_dir = str(tmp_path / "ev"), str(tmp_path / "batch")
    d.filter(is_eval).write.parquet(ev_dir)
    d.filter(~is_eval).limit(300).write.parquet(batch_dir)
    store, out = str(tmp_path / "shingle_store"), str(tmp_path / "clean")

    built = _run(
        capsys, spark, ["decon", "build", "--docs", ev_dir, "--store", store]
    )
    assert built["shingles"] > 0

    gated = _run(
        capsys, spark,
        ["decon", "gate", "--docs", batch_dir, "--store", store,
         "--out", out, "--min-overlap", "3"],
    )
    assert gated["kept"] + gated["dropped"] == gated["batch"] == 300

    batch = spark.read.parquet(batch_dir)
    expect_kept = {
        r.doc_id
        for r in ngram_contamination(
            batch, spark.read.parquet(ev_dir), "doc_id", "text", k=5
        )
        .filter(F.col("n_overlap") < 3)
        .collect()
    }
    got_kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got_kept == expect_kept


def test_shuffle_writes_deterministic_epoch(tmp_path, capsys, spark, sf_dir):
    """shuffle: the CLI face of write_epoch_shards — reported counts
    cover the corpus, and the materialized assignment equals the
    operator's (pure function of key + seed)."""
    from sec_financial_pipeline_spark.operators.sampling import epoch_shuffle
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    docs_dir = str(tmp_path / "docs")
    d.write.parquet(docs_dir)
    out = str(tmp_path / "epoch")

    res = _run(
        capsys, spark,
        ["shuffle", "--docs", docs_dir, "--out", out,
         "--shards", "4", "--seed", "e9"],
    )
    assert res["rows"] == d.count()
    assert len(res["rows_per_shard"]) <= 4

    got = {
        (r.doc_id, r.shard, r.pos)
        for r in spark.read.parquet(out).collect()
    }
    expect = {
        (r.doc_id, r.shard, r.pos)
        for r in epoch_shuffle(d, "doc_id", 4, seed="e9").collect()
    }
    assert got == expect


def test_boiler_cleans_corpus(tmp_path, capsys, spark, sf_dir):
    """boiler: the CLI face of the line-dedup chain — the cleaned
    corpus matches the operator composition, and docs whose every
    segment was boilerplate come back as empty text, not dropped rows."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.dedup import (
        drop_boilerplate_lines,
        reassemble_lines,
        token_segment_lines,
    )
    from sec_financial_pipeline_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    docs_dir = str(tmp_path / "docs")
    d.write.parquet(docs_dir)
    out = str(tmp_path / "clean")

    res = _run(
        capsys, spark,
        ["boiler", "--docs", docs_dir, "--out", out,
         "--min-docs", "2", "--segment-width", "3"],
    )
    assert res["docs"] == 200
    assert res["line_unit"] == "3-token segments"

    lines = token_segment_lines(spark.read.parquet(docs_dir), "doc_id", "text", 3)
    kept = drop_boilerplate_lines(lines, "doc_id", 2)
    expect = {
        r.doc_id: r.clean_text
        for r in reassemble_lines(kept, "doc_id", sep=" ").collect()
    }
    back = spark.read.parquet(out)
    got = {r.doc_id: r.text for r in back.collect()}
    assert len(got) == 200  # every doc present, emptied ones included
    for did, text in got.items():
        assert text == expect.get(did, "")
    assert res["emptied"] == sum(1 for v in got.values() if v == "")


def test_snap_lifecycle_via_cli(tmp_path, capsys, spark):
    """snap: the full snapshot-table lifecycle through the CLI —
    create -> append -> delete -> rollback -> compact -> vacuum -> log,
    with time travel surviving until vacuum reaps it."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    data1 = str(tmp_path / "d1")
    data2 = str(tmp_path / "d2")
    spark.range(0, 100).select("id", (F.col("id") * 2).alias("v")).write.parquet(data1)
    spark.range(100, 130).select("id", (F.col("id") * 2).alias("v")).write.parquet(data2)
    table = str(tmp_path / "t")

    assert _run(capsys, spark, ["snap", "create", "--table", table, "--data", data1])["version"] == 1
    assert _run(capsys, spark, ["snap", "append", "--table", table, "--data", data2])["version"] == 2
    res = _run(capsys, spark, ["snap", "delete", "--table", table, "--where", "id >= 100"])
    assert res["version"] == 3 and res["rows"] == 100
    assert _run(capsys, spark, ["snap", "rollback", "--table", table, "--to-version", "2"])["version"] == 4
    assert T.read(spark, table).count() == 130
    _run(capsys, spark, ["snap", "compact", "--table", table])
    vac = _run(capsys, spark, ["snap", "vacuum", "--table", table,
                               "--keep-last", "1", "--min-age-sec", "0"])
    assert vac["files_deleted"] > 0
    log = _run(capsys, spark, ["snap", "log", "--table", table])
    assert log["versions"] == [5] and log["rows_head"] == 130
    # dv delete: sidecar commit, no data file rewritten; purge drops it
    dv = _run(capsys, spark, ["snap", "delete", "--table", table,
                              "--where", "id < 10", "--mode", "dv"])
    assert dv["mode"] == "dv" and dv["rows"] == 120
    m = T._manifest(spark, table, None)
    assert any(e.get("dv") for e in m["files"])
    pg = _run(capsys, spark, ["snap", "purge", "--table", table])
    assert pg["rows"] == 120
    assert all(not e.get("dv")
               for e in T._manifest(spark, table, None)["files"])


def test_snap_convert_and_spec_via_cli(tmp_path, capsys, spark):
    """snap convert registers an existing parquet dir in place; snap
    spec evolves the partition spec for future writes."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    lake = str(tmp_path / "lake")
    # p as INT: Hive dir-string inference types partition cols int
    spark.range(30).select(
        "id", (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") * 2).alias("v"),
    ).write.partitionBy("p").parquet(lake)
    res = _run(capsys, spark, ["snap", "convert", "--table", lake,
                               "--partition-by", "p"])
    assert res["version"] == 1 and res["rows"] == 30
    res = _run(capsys, spark, ["snap", "spec", "--table", lake,
                               "--partition-by", "v"])
    assert res["version"] == 2 and res["op"] == "partition-spec:v"
    data = str(tmp_path / "d")
    spark.range(30, 40).select(
        "id", (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") * 2).alias("v"),
    ).write.parquet(data)
    _run(capsys, spark, ["snap", "append", "--table", lake, "--data", data])
    assert T.read(spark, lake).count() == 40
    specs = {frozenset(e.get("partition", {}))
             for e in T._manifest(spark, lake, None)["files"]}
    assert specs == {frozenset({"p"}), frozenset({"v"})}


def test_snap_changes_via_cli(tmp_path, capsys, spark):
    from pyspark.sql import functions as F

    data1 = str(tmp_path / "d1")
    data2 = str(tmp_path / "d2")
    spark.range(0, 50).select("id", (F.col("id") * 2).alias("v")).write.parquet(data1)
    spark.range(50, 70).select("id", (F.col("id") * 2).alias("v")).write.parquet(data2)
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data1])
    _run(capsys, spark, ["snap", "append", "--table", table, "--data", data2])
    _run(capsys, spark, ["snap", "delete", "--table", table, "--where", "id < 5"])
    res = _run(capsys, spark, ["snap", "changes", "--table", table, "--since", "1"])
    assert res["inserts"] == 20 and res["deletes"] == 5
    res = _run(capsys, spark, ["snap", "changes", "--table", table,
                               "--since", "1", "--at", "2"])
    assert res["inserts"] == 20 and res["deletes"] == 0


def test_explain_covers_bench_constituents(capsys, spark, sf_dir):
    """explain resolves bench constituents (serve rows etc.) that are
    consolidated out of the 50-name registry, and lists them."""
    from sec_financial_pipeline_spark.cli import main

    assert main(["--sf-dir", sf_dir, "explain", "list"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "emb_pq_serve" in out
    assert main(
        ["--sf-dir", sf_dir, "explain", "emb_pq_serve", "--mode", "simple"],
        spark=spark,
    ) == 0
    plan = capsys.readouterr().out
    assert "Physical Plan" in plan


def test_dedup_status_reports_absent_store(tmp_path, capsys, spark):
    """status on a never-built store answers {exists: false} instead of
    surfacing a FileNotFoundError traceback."""
    res = _run(
        capsys, spark,
        ["dedup", "status", "--store", str(tmp_path / "never_built")],
    )
    assert res == {"store": str(tmp_path / "never_built"), "exists": False}


def test_snap_scan_reports_pruning(tmp_path, capsys, spark):
    """snap scan: partition and stats filters prune files at the
    manifest level and report how many files were actually touched."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    data = str(tmp_path / "d")
    spark.range(0, 300).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
    ).write.parquet(data)
    table = str(tmp_path / "t")
    T.create(spark.read.parquet(data), table, partition_cols=("p",))

    res = _run(
        capsys, spark,
        ["snap", "scan", "--table", table, "--partition", "p=1"],
    )
    assert res["rows"] == 100
    assert res["files_scanned"] < res["files_total"]

    res2 = _run(
        capsys, spark,
        ["snap", "scan", "--table", table, "--between", "id", "10", "19"],
    )
    assert res2["rows"] == 10


def test_snap_merge_via_cli(tmp_path, capsys, spark):
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    data = str(tmp_path / "d")
    up = str(tmp_path / "u")
    spark.range(0, 10).select("id", (F.col("id") * 2).alias("v")).write.parquet(data)
    spark.createDataFrame([(3, 999), (50, 777)], "id long, v long").write.parquet(up)
    table = str(tmp_path / "t")
    T.create(spark.read.parquet(data), table)
    res = _run(
        capsys, spark,
        ["snap", "merge", "--table", table, "--data", up, "--keys", "id"],
    )
    assert res["version"] == 2 and res["rows"] == 11
    got = {r.id: r.v for r in T.read(spark, table).collect()}
    assert got[3] == 999 and got[50] == 777 and got[4] == 8


def test_snap_optimize_via_cli(tmp_path, capsys, spark):
    """snap optimize + scan: the z-order rewrite measurably reduces
    files_scanned for a range predicate, through the CLI alone."""
    from pyspark.sql import functions as F

    data = str(tmp_path / "d")
    (spark.range(0, 20000).select(
        "id",
        (F.col("id") * 2654435761 % 100000).alias("a"),
        (F.col("id") * 40503 % 100000).alias("b"),
    ).repartition(16).write.parquet(data))
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data])
    pre = _run(capsys, spark, ["snap", "scan", "--table", table,
                               "--between", "b", "10000", "15000"])
    assert pre["files_scanned"] == pre["files_total"]
    res = _run(capsys, spark, ["snap", "optimize", "--table", table,
                               "--cols", "a,b", "--target-files", "16"])
    assert res["version"] == 2
    post = _run(capsys, spark, ["snap", "scan", "--table", table,
                                "--between", "b", "10000", "15000"])
    assert post["files_scanned"] <= post["files_total"] // 2
    assert post["rows"] == pre["rows"]


def test_snap_evolve_via_cli(tmp_path, capsys, spark):
    from pyspark.sql import functions as F

    data = str(tmp_path / "d")
    spark.range(0, 20).select("id", (F.col("id") * 2).alias("v")).write.parquet(data)
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data])
    res = _run(capsys, spark, ["snap", "evolve", "--table", table,
                               "--add", "score:double", "--add", "tag:string"])
    assert res["version"] == 2
    assert res["columns"] == ["id", "v", "score", "tag"]


def test_bpe_train_apply_via_cli(tmp_path, capsys, spark):
    docs = str(tmp_path / "docs")
    corpus = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new newer"),
        (3, "the lowest and the newest"),
    ]
    spark.createDataFrame(corpus, "doc_id long, text string").write.parquet(docs)
    model = str(tmp_path / "bpe.json")
    out = str(tmp_path / "toked")
    res = _run(capsys, spark, ["bpe", "train", "--docs", docs,
                               "--model", model, "--merges", "10"])
    assert res["merges_learned"] == 10
    res = _run(capsys, spark, ["bpe", "apply", "--docs", docs,
                               "--model", model, "--out", out])
    assert res["docs"] == 3 and res["tokens"] > 0
    back = spark.read.parquet(out)
    assert "tokens" in back.columns and back.count() == 3


def test_snap_bloom_point_scan_via_cli(tmp_path, capsys, spark):
    from pyspark.sql import functions as F

    data = str(tmp_path / "d")
    (spark.range(0, 10000).select(F.col("id").alias("doc_id"))
     .repartition(8).write.parquet(data))
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data])
    pre = _run(capsys, spark, ["snap", "scan", "--table", table,
                               "--point", "doc_id", "4242"])
    assert pre["files_scanned"] == pre["files_total"] and pre["rows"] == 1
    res = _run(capsys, spark, ["snap", "bloom", "--table", table,
                               "--col", "doc_id"])
    assert res["version"] == 2
    post = _run(capsys, spark, ["snap", "scan", "--table", table,
                                "--point", "doc_id", "4242"])
    assert post["files_scanned"] < post["files_total"] and post["rows"] == 1


def test_snap_tail_via_cli(tmp_path, capsys, spark):
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    data = str(tmp_path / "d")
    spark.range(0, 100).select("id").write.parquet(data)
    table = str(tmp_path / "t")
    cursor = str(tmp_path / "cursor")
    out = str(tmp_path / "sink")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data])
    res = _run(capsys, spark, ["snap", "tail", "--table", table,
                               "--cursor-file", cursor, "--out", out])
    assert res["new_rows"] == 100 and res["out_rows_total"] == 100
    # nothing new: no rows, no output growth
    res = _run(capsys, spark, ["snap", "tail", "--table", table,
                               "--cursor-file", cursor, "--out", out])
    assert res["new_rows"] == 0 and res["cursor"] == 1
    d2 = str(tmp_path / "d2")
    spark.range(100, 130).select("id").write.parquet(d2)
    _run(capsys, spark, ["snap", "append", "--table", table, "--data", d2])
    res = _run(capsys, spark, ["snap", "tail", "--table", table,
                               "--cursor-file", cursor, "--out", out])
    assert res["new_rows"] == 30 and res["out_rows_total"] == 130
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(130))  # each row delivered exactly once


def test_snap_stats_via_cli(tmp_path, capsys, spark):
    from pyspark.sql import functions as F

    data = str(tmp_path / "d")
    (spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("p")
    ).write.parquet(data))
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data,
                         "--partition-by", "p"])
    _run(capsys, spark, ["snap", "bloom", "--table", table, "--col", "doc_id"])
    res = _run(capsys, spark, ["snap", "stats", "--table", table])
    assert res["rows"] == 300 and res["version"] == 2
    assert res["total_bytes"] > 0 and res["n_files"] >= 3
    assert set(res["files_per_partition"]) == {"p=0", "p=1", "p=2"}
    assert "doc_id" in res["bloom_cols"]


def test_snap_constraint_via_cli(tmp_path, capsys, spark):
    import pytest
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    data = str(tmp_path / "d")
    spark.range(0, 20).select("id", (F.col("id") * 2).alias("v")).write.parquet(data)
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data])
    res = _run(capsys, spark, ["snap", "constraint", "add", "--table", table,
                               "--name", "v_nonneg", "--expr", "v >= 0"])
    assert res["version"] == 2
    lst = _run(capsys, spark, ["snap", "constraint", "list", "--table", table])
    assert lst["constraints"] == {"v_nonneg": "v >= 0"}
    bad = str(tmp_path / "bad")
    spark.createDataFrame([(99, -5)], "id bigint, v bigint").write.parquet(bad)
    with pytest.raises(T.ConstraintViolation):
        _run(capsys, spark, ["snap", "append", "--table", table, "--data", bad])
    _run(capsys, spark, ["snap", "constraint", "drop", "--table", table,
                         "--name", "v_nonneg"])
    assert _run(capsys, spark, ["snap", "constraint", "list", "--table", table])["constraints"] == {}


def test_snap_update_via_cli(tmp_path, capsys, spark):
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    data = str(tmp_path / "d")
    spark.range(0, 20).select("id", (F.col("id") * 2).alias("v")).write.parquet(data)
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data])
    res = _run(capsys, spark, ["snap", "update", "--table", table,
                               "--where", "id < 5", "--set", "v=v+100"])
    assert res["version"] == 2 and res["rows"] == 20
    got = {r.id: r.v for r in T.read(spark, table).collect()}
    assert got[0] == 100 and got[4] == 108 and got[5] == 10


def test_snap_rollback_to_timestamp_via_cli(tmp_path, capsys, spark):
    import time as _time

    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    data1 = str(tmp_path / "d1")
    data2 = str(tmp_path / "d2")
    spark.range(0, 10).select("id", (F.col("id") * 2).alias("v")).write.parquet(data1)
    spark.range(10, 30).select("id", (F.col("id") * 2).alias("v")).write.parquet(data2)
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data1])
    t1 = _time.time()
    _time.sleep(1.2)
    _run(capsys, spark, ["snap", "append", "--table", table, "--data", data2])
    import datetime as dt

    iso = dt.datetime.fromtimestamp(t1, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    res = _run(capsys, spark, ["snap", "rollback", "--table", table,
                               "--to-timestamp", iso])
    assert res["restored_version"] == 1
    assert T.read(spark, table).count() == 10


def test_snap_changes_per_commit_via_cli(tmp_path, capsys, spark):
    from pyspark.sql import functions as F

    data = str(tmp_path / "d")
    spark.range(0, 20).select("id", (F.col("id") * 2).alias("v")).write.parquet(data)
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data])
    _run(capsys, spark, ["snap", "delete", "--table", table,
                         "--where", "id < 3", "--cdf"])
    res = _run(capsys, spark, ["snap", "changes", "--table", table,
                               "--since", "0", "--per-commit"])
    assert res["per_commit"]["1"] == {"insert": 20}
    assert res["per_commit"]["2"] == {"delete": 3}


def test_snap_matview_lifecycle_via_cli(tmp_path, capsys, spark, sf_dir):
    from sec_financial_pipeline_spark.sources import snaptable as T

    src = str(tmp_path / "mv_src")
    view = str(tmp_path / "mv_view")
    T.create(
        spark.createDataFrame(
            [(1, "a", 2.0), (2, "a", 3.5), (3, "b", 10.0)],
            "k bigint, g string, v double",
        ),
        src,
    )
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "matview", "create", "--src", src,
         "--view", view, "--group-by", "g",
         "--agg", "count::n", "--agg", "sum:v:total"],
    )
    assert out["cursor"] == 1
    T.append(
        spark.createDataFrame([(4, "b", 1.0)], "k bigint, g string, v double"),
        src,
    )
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "matview", "refresh", "--view", view],
    )
    assert out["cursor"] == 2
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "matview", "show", "--view", view],
    )
    got = {r["g"]: (r["n"], r["total"]) for r in out["rows"]}
    assert got == {"a": (2, 5.5), "b": (2, 11.0)}
    # stream --once: drain the pending commits via the version-offset
    # stream (T7 daemon analog), exit with the view caught up
    T.append(
        spark.createDataFrame([(5, "c", 4.0)], "k bigint, g string, v double"),
        src,
    )
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "matview", "stream", "--view", view,
         "--checkpoint", str(tmp_path / "ck")],
    )
    assert out["behind_versions"] == 0
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "matview", "show", "--view", view],
    )
    got = {r["g"]: (r["n"], r["total"]) for r in out["rows"]}
    assert got == {"a": (2, 5.5), "b": (2, 11.0), "c": (1, 4.0)}


def test_snap_bounds_via_cli(tmp_path, capsys, spark, sf_dir):
    from sec_financial_pipeline_spark.sources import snaptable as T

    path = str(tmp_path / "bnd")
    T.create(
        spark.createDataFrame(
            [(5, 2.5), (9, -1.0), (2, 7.0)], "k bigint, v double"
        ),
        path,
    )
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "bounds", "--table", path,
         "--col", "k", "--col", "v"],
    )
    assert out["bounds"] == {"k": ["2", "9"], "v": ["-1.0", "7.0"]}


def test_snap_analyze_via_cli(tmp_path, capsys, spark, sf_dir):
    from sec_financial_pipeline_spark.sources import snaptable as T

    path = str(tmp_path / "anl")
    T.create(
        spark.createDataFrame(
            [(i, None if i % 4 == 0 else float(i)) for i in range(200)],
            "k bigint, v double",
        ),
        path,
    )
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "analyze", "--table", path],
    )
    assert out["rows"] == 200
    assert out["columns"]["v"]["nulls"] == 50
    assert out["columns"]["k"]["min"] == 0
    # stats now ride along in snap stats, fresh
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "stats", "--table", path],
    )
    assert out["statistics"]["stale"] is False
    assert out["statistics"]["columns"]["v"]["nulls"] == 50


def test_snap_create_with_transform_spec_via_cli(tmp_path, capsys, spark, sf_dir):
    from sec_financial_pipeline_spark.sources import snaptable as T

    data = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [(i, f"u{i}") for i in range(40)], "k bigint, s string"
    ).write.parquet(data)
    table = str(tmp_path / "hp")
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "create", "--table", table,
         "--data", data, "--partition-by", "bucket(4,k),truncate(2,s)"],
    )
    assert out["version"] == 1
    m = T._manifest(spark, table, None)
    assert all(
        set(e["partition"]) == {"k_bucket_4", "s_trunc_2"}
        for e in m["files"]
    )


def test_snap_maintain_via_cli(tmp_path, capsys, spark, sf_dir):
    from sec_financial_pipeline_spark.sources import snaptable as T

    path = str(tmp_path / "mnt")
    T.create(
        spark.createDataFrame([(i,) for i in range(20)], "k bigint"), path
    )
    for i in range(5):
        T.append(spark.createDataFrame([(100 + i,)], "k bigint"), path)
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "maintain", "--table", path,
         "--max-files", "3", "--target-files", "1"],
    )
    assert out["actions"][0]["action"] == "compact"
    assert T.read(spark, path).count() == 25


def test_snap_export_via_cli(tmp_path, capsys, spark, sf_dir):
    import duckdb

    from sec_financial_pipeline_spark.sources import snaptable as T

    path = str(tmp_path / "exp")
    T.create(
        spark.createDataFrame([(i,) for i in range(10)], "k bigint"), path
    )
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "export", "--table", path],
    )
    assert out["n_files"] >= 1
    con = duckdb.connect()
    assert con.execute(
        f"SELECT sum(k) FROM {out['duckdb_sql']}"
    ).fetchone()[0] == 45


def test_snap_join_chain_via_cli(tmp_path, capsys, spark, sf_dir):
    from sec_financial_pipeline_spark.sources import snaptable as T

    facts = str(tmp_path / "f")
    dim = str(tmp_path / "d")
    T.create(
        spark.createDataFrame(
            [(i, i % 10, float(i)) for i in range(100)],
            "id bigint, a bigint, v double",
        ),
        facts,
    )
    T.create(
        spark.createDataFrame(
            [(i, f"dim-{i}") for i in range(10)], "a bigint, nm string"
        ),
        dim,
    )
    out = _run(
        capsys, spark,
        ["--sf-dir", sf_dir, "snap", "join",
         "--table", f"facts={facts}", "--table", f"dim={dim}",
         "--edge", "facts:dim:a", "--filter", "facts=a = 3",
         "--limit", "5"],
    )
    assert out["n_rows"] == 10
    assert out["order"][0] == "facts"  # big side streams
    assert out["planner"] in ("dp", "greedy")
    assert all(r["a"] == 3 for r in out["rows"])
    assert out["steps"][0]["broadcast"] is True


def test_snap_clone_via_cli(tmp_path, capsys, spark):
    """snap clone: deep by default, --shallow = zero-copy branch."""
    import os

    from pyspark.sql import functions as F

    data = str(tmp_path / "d")
    spark.range(0, 50).select("id", (F.col("id") * 2).alias("v")).write.parquet(data)
    table = str(tmp_path / "t")
    _run(capsys, spark, ["snap", "create", "--table", table, "--data", data])
    deep = str(tmp_path / "deep")
    res = _run(capsys, spark, ["snap", "clone", "--table", table, "--dst", deep])
    assert res["mode"] == "deep" and res["rows"] == 50
    assert os.path.exists(os.path.join(deep, "data"))
    shallow = str(tmp_path / "shallow")
    res = _run(capsys, spark, ["snap", "clone", "--table", table,
                               "--dst", shallow, "--shallow"])
    assert res["mode"] == "shallow" and res["rows"] == 50
    assert not os.path.exists(os.path.join(shallow, "data"))


def test_unigram_train_apply_roundtrip(tmp_path, capsys, spark, sf_dir):
    """CLI unigram lifecycle: train persists the piece table, apply
    tokenizes a corpus with it; every word's pieces concatenate back
    to the (truncated) word."""
    corpus = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the cats sat"),
         (2, "zq unseen chars")],
        "doc_id long, text string",
    ).write.parquet(corpus)
    model = str(tmp_path / "uni_model")
    out = _run(capsys, spark, [
        "unigram", "train", "--docs", corpus, "--model", model,
        "--iters", "1",
    ])
    assert out["op"] == "train" and out["pieces"] > 0
    tok_dir = str(tmp_path / "toks")
    out = _run(capsys, spark, [
        "unigram", "apply", "--docs", corpus, "--model", model,
        "--out", tok_dir,
    ])
    assert out["docs"] == 3 and out["tokens"] > 0
    toks = spark.read.parquet(tok_dir).collect()
    words = {}
    for r in toks:
        words.setdefault((r["doc_id"], r["widx"]), []).append(
            (r["pidx"], r["piece"])
        )
    texts = {0: "the cat sat on the mat", 1: "the cats sat",
             2: "zq unseen chars"}
    import re as _re
    for (d, w), ps in words.items():
        ps.sort()
        assert "".join(p for _, p in ps) == _re.split(
            r"\s+", texts[d].strip()
        )[w - 1][:12]


def test_snap_matview_join_view_cli(tmp_path, capsys, spark):
    """CLI join-view lifecycle: create over fact⨝dim, append to the
    fact, refresh — view state equals the joined recompute."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import snaptable as T

    fact, dim, view = (str(tmp_path / n) for n in ("fact", "dim", "view"))
    T.create(
        spark.createDataFrame(
            [(k, f"r{k % 2}") for k in range(4)], "k bigint, region string"
        ),
        dim,
    )
    T.create(
        spark.range(0, 40).select(
            "id", (F.col("id") % 5).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    out = _run(capsys, spark, [
        "snap", "matview", "create", "--src", fact, "--view", view,
        "--group-by", "region", "--agg", "sum:v:sv",
        "--join-dim", dim, "--join-key", "fk", "--join-dim-key", "k",
        "--join-dim-cols", "region",
    ])
    assert out["op"] == "matview:create"
    T.append(
        spark.range(100, 120).select(
            "id", (F.col("id") % 5).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    out = _run(capsys, spark, ["snap", "matview", "refresh", "--view", view])
    assert out["op"] == "matview:refresh"
    from sec_financial_pipeline_spark.sources import matview as MV

    got = {r.region: r.sv for r in MV.read_matview(spark, view).collect()}
    want = {}
    for i in list(range(40)) + list(range(100, 120)):
        fk = i % 5
        if fk >= 4:  # no dim row
            continue
        want[f"r{fk % 2}"] = want.get(f"r{fk % 2}", 0) + i * 2
    assert got == {k: float(v) for k, v in want.items()}


def test_snap_matview_chain_cli(tmp_path, capsys, spark):
    """CLI snowflake-chain form: repeatable --join DIM|KEY|DIM_KEY|COLS
    [|HOW] builds a two-hop LEFT chain; refresh folds fact DML; the
    NULL group carries the orphans."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.sources import matview as MV
    from sec_financial_pipeline_spark.sources import snaptable as T

    fact, d1, d2, view = (
        str(tmp_path / n) for n in ("fact", "d1", "d2", "view")
    )
    T.create(
        spark.createDataFrame(
            [(k, k % 3) for k in range(4)], "k bigint, sub bigint"
        ),
        d1,
    )
    T.create(
        spark.createDataFrame(
            [(s, f"R{s}") for s in range(2)], "sub2 bigint, region string"
        ),
        d2,
    )
    T.create(
        spark.range(0, 30).select(
            "id", (F.col("id") % 6).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    out = _run(capsys, spark, [
        "snap", "matview", "create", "--src", fact, "--view", view,
        "--group-by", "region", "--agg", "sum:v:sv",
        "--join", f"{d1}|fk|k|sub|left",
        "--join", f"{d2}|sub|sub2|region|left",
    ])
    assert out["op"] == "matview:create"
    T.append(
        spark.range(100, 112).select(
            "id", (F.col("id") % 6).alias("fk"), (F.col("id") * 2).alias("v")
        ),
        fact,
    )
    _run(capsys, spark, ["snap", "matview", "refresh", "--view", view])
    got = {r.region: r.sv for r in MV.read_matview(spark, view).collect()}
    want = {}
    for i in list(range(30)) + list(range(100, 112)):
        fk = i % 6
        sub = fk % 3 if fk < 4 else None
        g = f"R{sub}" if sub is not None and sub < 2 else None
        want[g] = want.get(g, 0) + i * 2
    assert got == {k: float(v) for k, v in want.items()}
    assert None in got  # orphans really flow through both left hops
