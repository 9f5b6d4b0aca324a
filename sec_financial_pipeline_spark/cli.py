"""CLI entry point — the engine-side twin of the reference's
``scripts/run_etl.py`` (SURVEY §3.2: ``fetch TICKER`` / ``incremental``
/ ``refresh`` / ``status``) plus ``serve`` / ``tools`` for the two wire
transports. Completes the reference's three entry points (REST, MCP,
CLI) on the engine.

The ETL "fetch" here is the warehouse-materialization job the reference
runs after its network stage: derive the ticker's facts and write them
partitioned-by-year with dynamic partition overwrite (``sources/sink``),
then record the job in the fetch queue's ledger. ``incremental`` selects
tickers via the T1 staleness policy over the warehouse's own freshness
watermarks — exactly the reference's stale-ticker selection
(``etl/pipeline.py:83-104``) — and runs a deduped job per stale ticker.

Usage (module form; no console-script packaging by design):

    python -m sec_financial_pipeline_spark.cli etl fetch T01
    python -m sec_financial_pipeline_spark.cli etl incremental --as-of 1999-01-01
    python -m sec_financial_pipeline_spark.cli etl refresh
    python -m sec_financial_pipeline_spark.cli etl status
    python -m sec_financial_pipeline_spark.cli serve --port 8000
    python -m sec_financial_pipeline_spark.cli tools
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _fetch_job(spark: SparkSession, sf_dir: str, warehouse: str, ticker: str) -> int:
    """One ETL job: derive the ticker's facts, write its partitions
    (dynamic overwrite — untouched partitions survive), return the
    record count for the ledger."""
    from sec_financial_pipeline_spark.plans import domain
    from sec_financial_pipeline_spark.sources import sink

    facts = domain.facts_df(spark, sf_dir).filter(
        (F.col("ticker") == ticker) & F.col("fiscal_year").isNotNull()
    )
    n = facts.count()
    if n:
        sink.overwrite_partitions(
            facts, warehouse, partition_cols=("ticker", "fiscal_year")
        )
    return n


def make_fetcher(spark: SparkSession, sf_dir: str, warehouse: str):
    """A BackgroundFetcher wired to the warehouse-materialization job."""
    from sec_financial_pipeline_spark.plans.background import BackgroundFetcher

    return BackgroundFetcher(
        lambda t: _fetch_job(spark, sf_dir, warehouse, t)
    )


def _is_path_missing(e: Exception) -> bool:
    """True only for Spark's path-not-found AnalysisException."""
    from pyspark.errors import AnalysisException

    return isinstance(e, AnalysisException) and (
        "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e)
    )


def stale_tickers(spark: SparkSession, warehouse: str, as_of: str) -> list[str]:
    """T1 stale-ticker selection over the warehouse's own watermarks
    (``pipeline.py:83-104``): tickers whose latest filing age exceeds
    their staleness tier. An empty/missing warehouse means everything is
    stale — but with no stored tickers, there is nothing to refresh."""
    from sec_financial_pipeline_spark.streaming.incremental import (
        freshness,
        staleness_policy,
    )

    try:
        stored = spark.read.parquet(warehouse)
    except Exception as e:
        # only a missing warehouse means "nothing stored yet" — a corrupt
        # or unreadable one must surface, not report "nothing stale"
        if _is_path_missing(e):
            return []
        raise
    fresh = freshness(stored, entity_col="ticker")
    policy = staleness_policy(fresh, as_of=as_of)
    rows = policy.filter(F.col("needs_update")).select("ticker").collect()
    return sorted(r["ticker"] for r in rows)


def _cmd_etl(args: argparse.Namespace, spark: SparkSession) -> dict[str, Any]:
    fetcher = make_fetcher(spark, args.sf_dir, args.warehouse)
    if args.etl_cmd == "fetch":
        fetcher.trigger(args.ticker)
        fetcher.run_pending()
        return fetcher.status()
    if args.etl_cmd == "incremental":
        stale = stale_tickers(spark, args.warehouse, args.as_of)
        for t in stale:
            fetcher.trigger(t)
        fetcher.run_pending()
        out = fetcher.status()
        out["stale_tickers"] = stale
        return out
    if args.etl_cmd == "refresh":
        from sec_financial_pipeline_spark.plans import domain

        tickers = sorted(
            r["ticker"]
            for r in domain.companies_df(spark, args.sf_dir)
            .select("ticker")
            .collect()
        )
        fetcher.trigger_all(tickers)
        fetcher.run_pending()
        return fetcher.status()
    if args.etl_cmd == "compact":
        from sec_financial_pipeline_spark.sources.sink import compact

        n = compact(
            spark,
            args.warehouse,
            target_files_per_partition=args.files_per_partition,
            partition_cols=("ticker", "fiscal_year"),
        )
        return {"warehouse": args.warehouse, "files_after": n}
    if args.etl_cmd == "status":
        # a fresh process has an empty queue; status still reports the
        # warehouse-side freshness view, which is the durable state
        from sec_financial_pipeline_spark.streaming.incremental import freshness

        try:
            stored = spark.read.parquet(args.warehouse)
            rows = freshness(stored, entity_col="ticker").orderBy("ticker").collect()
            watermarks = {
                r["ticker"]: {
                    "last_filing_date": str(r["last_filing_date"]),
                    "n_facts": r["n_facts"],
                    "n_years": r["n_years"],
                }
                for r in rows
            }
        except Exception as e:
            if not _is_path_missing(e):
                raise
            watermarks = {}
        out = fetcher.status()
        out["warehouse"] = {"path": args.warehouse, "tickers": watermarks}
        return out
    raise SystemExit(f"unknown etl command: {args.etl_cmd}")


def _cmd_dedup(args, spark: SparkSession) -> dict:
    """Near-dedup ingest lifecycle over a persisted signature store
    (the north-star §2.9 tooling twin of the SEC `etl` commands):
    ``build`` bands a standing corpus once, ``ingest`` probes a batch
    and commits its bands, ``status`` summarizes the store."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import similarity as S

    if args.dedup_cmd == "build":
        docs = spark.read.parquet(args.docs).select("doc_id", "text")
        sigs = S.minhash_signatures(docs, "doc_id", "text")
        S.save_signature_store(sigs, "doc_id", args.store)
        store = S.load_signature_store(spark, args.store)
        return {
            "store": args.store,
            "docs": store.select("id").distinct().count(),
            "band_rows": store.count(),
        }
    if args.dedup_cmd == "ingest":
        from sec_financial_pipeline_spark.streaming.ingest import ingest_batch

        batch = spark.read.parquet(args.docs).select("doc_id", "text")
        out = ingest_batch(batch, args.store, args.pairs)
        return {**out, "store": args.store}
    if args.dedup_cmd == "compact":
        from sec_financial_pipeline_spark.sources.sink import compact

        n = compact(
            spark,
            args.store,
            target_files_per_partition=args.files_per_partition,
            partition_cols=("band_no",),
        )
        return {"store": args.store, "files_after": n}
    if args.dedup_cmd == "status":
        from sec_financial_pipeline_spark.streaming.ingest import store_exists

        # a never-built store is a normal answer for a status probe,
        # not a crash (load_signature_store raises FileNotFoundError);
        # the check goes through the Hadoop FS API so remote store URIs
        # answer correctly
        if not store_exists(spark, args.store):
            return {"store": args.store, "exists": False}
        store = S.load_signature_store(spark, args.store)
        per_band = {
            str(r["band_no"]): r["n"]
            for r in store.groupBy("band_no")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("band_no")
            .collect()
        }
        return {
            "store": args.store,
            "docs": store.select("id").distinct().count(),
            "band_rows": store.count(),
            "rows_per_band": per_band,
        }
    raise SystemExit(f"unknown dedup command: {args.dedup_cmd}")


def _cmd_bm25(args, spark: SparkSession) -> dict:
    """BM25 inverted-index store lifecycle (the retrieval twin of the
    `dedup` signature-store commands): ``build`` indexes a standing
    corpus once, ``ingest`` appends new documents O(batch), ``delete``
    tombstones documents with exact derived-table maintenance,
    ``update`` re-writes documents in place, ``compact`` folds epoch
    dirs + purges tombstoned rows, ``query`` scores a query corpus
    against the store, ``status`` summarizes it."""
    import os

    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import bm25 as B

    if args.bm25_cmd == "build":
        docs = spark.read.parquet(args.docs).select("doc_id", "text")
        B.save_bm25_store(docs, "doc_id", "text", args.store)
        postings, _, stats = B.load_bm25_store(spark, args.store)
        st = stats.collect()[0]
        return {
            "store": args.store,
            "docs": int(st["n_docs"]),
            "postings": postings.count(),
        }
    if args.bm25_cmd == "ingest":
        docs = spark.read.parquet(args.docs).select("doc_id", "text")
        B.ingest_bm25_store(docs, "doc_id", "text", args.store)
        st = spark.read.parquet(os.path.join(args.store, "stats")).collect()[0]
        return {"store": args.store, "docs": int(st["n_docs"])}
    if args.bm25_cmd == "delete":
        ids = spark.read.parquet(args.ids).select(
            F.col(args.id_col).alias("doc_id")
        )
        n = B.delete_from_bm25_store(spark, args.store, ids)
        return {"store": args.store, "docs_removed": n}
    if args.bm25_cmd == "update":
        docs = spark.read.parquet(args.docs).select("doc_id", "text")
        B.update_bm25_docs(docs, "doc_id", "text", args.store)
        st = spark.read.parquet(os.path.join(args.store, "stats")).collect()[0]
        return {"store": args.store, "docs": int(st["n_docs"])}
    if args.bm25_cmd == "compact":
        out = B.compact_bm25_store(spark, args.store)
        return {"store": args.store, **out}
    if args.bm25_cmd == "query":
        postings, idf, stats = B.load_bm25_store(spark, args.store)
        qterms = (
            spark.read.parquet(args.queries)
            .select(
                F.col("doc_id").alias("query_id"),
                F.explode(F.split(F.col("text"), " ")).alias("term"),
            )
            .distinct()
        )
        res = B.bm25_score(postings, idf, stats, qterms, args.top_k)
        res.write.mode("overwrite").parquet(args.out)
        return {"out": args.out, "rows": spark.read.parquet(args.out).count()}
    if args.bm25_cmd == "status":
        from sec_financial_pipeline_spark.streaming.ingest import store_exists

        if not store_exists(spark, args.store):
            return {"store": args.store, "exists": False}
        postings, idf, stats = B.load_bm25_store(spark, args.store)
        st = stats.collect()[0]
        tomb_dir = os.path.join(args.store, "tombstones")
        n_tomb = (
            spark.read.parquet(tomb_dir).count()
            if B._fs_exists(spark, tomb_dir)
            else 0
        )
        return {
            "store": args.store,
            "docs": int(st["n_docs"]),
            "total_len": int(st["total_len"]),
            "max_gen": int(st["max_gen"]) if "max_gen" in stats.columns else 0,
            "vocabulary": idf.count(),
            "live_postings": postings.count(),
            "tombstones": n_tomb,
            # per-lineage replay fences ({namespace: max folded epoch})
            "compaction_fences": B.compaction_fences(spark, args.store),
            # accreted streaming epoch dirs since the last compaction —
            # the debt the auto_compact_epochs daemon policy acts on
            "epoch_debt": B.bm25_epoch_debt(spark, args.store),
        }
    raise SystemExit(f"unknown bm25 command: {args.bm25_cmd}")


def _cmd_decon(args, spark: SparkSession) -> dict:
    """Ingest-time decontamination gate: ``build`` persists the eval
    split's distinct k-gram set once; ``gate`` probes a batch against
    it, writes the clean rows, and reports what was dropped."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.dedup import (
        contamination_vs_store,
        save_eval_shingle_store,
    )

    if args.decon_cmd == "build":
        ev = spark.read.parquet(args.docs).select("doc_id", "text")
        save_eval_shingle_store(ev, "text", args.store, k=args.k)
        return {
            "store": args.store,
            "shingles": spark.read.parquet(args.store).count(),
            "k": args.k,
        }
    if args.decon_cmd == "gate":
        batch = spark.read.parquet(args.docs)
        scored = contamination_vs_store(
            batch, "doc_id", "text", args.store, k=args.k
        )
        kept = scored.filter(F.col("n_overlap") < args.min_overlap).drop(
            "n_overlap"
        )
        kept.write.mode("overwrite").parquet(args.out)
        n_in = batch.count()
        n_kept = spark.read.parquet(args.out).count()
        return {
            "batch": n_in,
            "kept": n_kept,
            "dropped": n_in - n_kept,
            "out": args.out,
        }
    raise SystemExit(f"unknown decon command: {args.decon_cmd}")


def _cmd_shuffle(args, spark: SparkSession) -> dict:
    """Materialize one training epoch: deterministic shuffle of the
    corpus into ordered shard files (pure function of key + seed, so a
    re-run — or another engine — produces the identical epoch)."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.sampling import (
        write_epoch_shards,
    )

    docs = spark.read.parquet(args.docs)
    write_epoch_shards(
        docs, args.key, n_shards=args.shards, seed=args.seed, path=args.out,
        files_per_shard=args.files_per_shard,
    )
    per_shard = {
        str(r["shard"]): r["n"]
        for r in spark.read.parquet(args.out)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("shard")
        .collect()
    }
    return {
        "out": args.out,
        "seed": args.seed,
        "shards": args.shards,
        "files_per_shard": args.files_per_shard,
        "rows": sum(per_shard.values()),
        "rows_per_shard": per_shard,
    }


def _cmd_boiler(args, spark: SparkSession) -> dict:
    """Corpus-level boilerplate removal (CCNet/Gopher line dedup): drop
    lines recurring across >= --min-docs documents, write the cleaned
    corpus. --segment-width switches the line unit from newline-split
    lines to fixed token segments (for corpora without newline
    structure, like the synthetic testdata)."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.dedup import (
        drop_boilerplate_lines,
        line_table,
        reassemble_lines,
        token_segment_lines,
    )

    docs = spark.read.parquet(args.docs)
    if args.segment_width:
        lines = token_segment_lines(docs, args.key, args.text_col, args.segment_width)
        sep = " "
    else:
        lines = line_table(docs, args.key, args.text_col, sep="\n")
        sep = "\n"
    kept = drop_boilerplate_lines(lines, args.key, args.min_docs)
    clean = reassemble_lines(kept, args.key, sep=sep)
    out_df = (
        docs.select(args.key)
        .join(clean, args.key, "left")
        .select(
            args.key,
            F.coalesce(F.col("clean_text"), F.lit("")).alias(args.text_col),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )
    out_df.write.mode("overwrite").parquet(args.out)
    back = spark.read.parquet(args.out)
    n_docs = back.count()
    n_emptied = back.filter(F.col("n_kept") == 0).count()
    return {
        "docs": n_docs,
        "emptied": n_emptied,
        "min_docs": args.min_docs,
        "line_unit": f"{args.segment_width}-token segments"
        if args.segment_width
        else "newline",
        "out": args.out,
    }


def _cmd_unigram(args, spark: SparkSession) -> dict:
    """Unigram-LM tokenizer lifecycle (operators/unigram.py, Kudo
    2018): train learns the piece-score table by Viterbi-EM over the
    corpus' distinct-word table and persists it as parquet; apply
    Viterbi-tokenizes a corpus with a saved model (one fold per
    distinct word, UNK-char fallback)."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import unigram as U

    if args.unigram_cmd == "train":
        docs = spark.read.parquet(args.docs)
        scores = U.train_unigram(
            docs, args.text_col, iters=args.iters,
            max_piece_len=args.max_piece_len,
            max_word_len=args.max_word_len,
            min_seed_count=args.min_seed_count,
        )
        scores.coalesce(1).write.mode("overwrite").parquet(args.model)
        back = spark.read.parquet(args.model)
        return {
            "op": "train",
            "pieces": back.count(),
            "model": args.model,
        }
    if args.unigram_cmd == "apply":
        docs = spark.read.parquet(args.docs)
        scores = spark.read.parquet(args.model)
        out = U.apply_unigram(
            docs, args.id_col, args.text_col, scores,
            max_piece_len=args.max_piece_len,
            max_word_len=args.max_word_len,
        )
        out.write.mode("overwrite").parquet(args.out)
        back = spark.read.parquet(args.out)
        agg = back.agg(
            F.count(F.lit(1)).alias("tokens"),
            F.count_distinct(args.id_col).alias("docs"),
        ).collect()[0]
        return {
            "op": "apply",
            "docs": int(agg["docs"]),
            "tokens": int(agg["tokens"]),
            "out": args.out,
        }
    raise SystemExit(f"unknown unigram command: {args.unigram_cmd}")


def _cmd_bpe(args, spark: SparkSession) -> dict:
    """BPE tokenizer lifecycle (operators/bpe.py): train learns an
    ordered merge list from a parquet corpus (the iterative
    pair-count/merge loop, one shuffled agg per merge); apply tokenizes
    a corpus with a saved merge list."""
    import json as _json

    from sec_financial_pipeline_spark.operators import bpe

    if args.bpe_cmd == "train":
        docs = spark.read.parquet(args.docs)
        merges = bpe.train_bpe(
            docs, args.text_col, n_merges=args.merges,
            min_pair_freq=args.min_pair_freq,
        )
        with open(args.model, "w") as f:
            _json.dump({"eow": bpe.EOW, "merges": merges}, f)
        return {
            "op": "train",
            "merges_learned": len(merges),
            "model": args.model,
        }
    if args.bpe_cmd == "apply":
        with open(args.model) as f:
            model = _json.load(f)
        merges = [tuple(m) for m in model["merges"]]
        docs = spark.read.parquet(args.docs)
        out = bpe.apply_bpe(docs, args.text_col, merges)
        out.write.mode("overwrite").parquet(args.out)
        back = spark.read.parquet(args.out)
        from pyspark.sql import functions as F

        agg = back.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_bpe_tokens").alias("tokens"),
        ).collect()[0]
        return {
            "op": "apply",
            "docs": int(agg["docs"]),
            "tokens": int(agg["tokens"]),
            "out": args.out,
        }
    raise SystemExit(f"unknown bpe command: {args.bpe_cmd}")



def _split_specs(s: str) -> tuple:
    """Comma-split a partition-spec list RESPECTING parentheses:
    'bucket(16,k),days(ts)' -> ('bucket(16,k)', 'days(ts)')."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur).strip())
    return tuple(c for c in out if c)


def _cmd_snap(args, spark: SparkSession) -> dict:
    """Snapshot-table lifecycle (sources/snaptable.py): Delta-semantics
    commits on plain parquet — create/append/delete/compact/rollback/
    vacuum/log, each an atomic manifest publish."""
    from sec_financial_pipeline_spark.sources import snaptable as T

    if args.snap_cmd == "create":
        pcols = _split_specs(args.partition_by)
        v = T.create(
            spark.read.parquet(args.data), args.table, partition_cols=pcols
        )
        return {"table": args.table, "version": v, "op": "create"}
    if args.snap_cmd == "append":
        v = T.append(spark.read.parquet(args.data), args.table)
        return {"table": args.table, "version": v, "op": "append"}
    if args.snap_cmd == "overwrite":
        v = T.overwrite(spark.read.parquet(args.data), args.table)
        return {
            "table": args.table,
            "version": v,
            "op": "overwrite",
            # pin the committed version: an unpinned head read could
            # count a concurrent commit's rows under this version number
            "rows": T.read(spark, args.table, version=v).count(),
        }
    if args.snap_cmd == "tag":
        if args.tag_cmd == "add":
            v = T.tag(spark, args.table, args.name, version=args.version)
            return {"table": args.table, "tag": args.name, "version": v}
        if args.tag_cmd == "list":
            return {"table": args.table, "tags": T.tags(spark, args.table)}
        v = T.delete_tag(spark, args.table, args.name)  # rm
        return {"table": args.table, "tag": args.name, "unpinned": v}
    if args.snap_cmd == "clone":
        v = T.clone(
            spark, args.table, args.dst,
            version=args.version, shallow=args.shallow,
        )
        return {
            "table": args.dst,
            "version": v,
            "op": "clone",
            "mode": "shallow" if args.shallow else "deep",
            "source": args.table,
            "rows": T.read(spark, args.dst).count(),
        }
    if args.snap_cmd == "delete":
        v = T.delete_where(spark, args.table, args.where, mode=args.mode, cdf=args.cdf)
        return {
            "table": args.table,
            "version": v,
            "op": "delete",
            "mode": args.mode,
            "rows": T.read(spark, args.table).count(),
        }
    if args.snap_cmd == "update":
        assignments = {}
        for a in args.set:
            if "=" not in a:
                raise SystemExit(f"snap update --set needs col=expr, got {a!r}")
            k, expr = a.split("=", 1)
            assignments[k.strip()] = expr.strip()
        v = T.update_where(spark, args.table, args.where, assignments)
        return {
            "table": args.table,
            "version": v,
            "op": "update",
            "rows": T.read(spark, args.table).count(),
        }
    if args.snap_cmd == "purge":
        v = T.purge_deletes(spark, args.table)
        return {
            "table": args.table,
            "version": v,
            "op": "purge",
            "rows": T.read(spark, args.table).count(),
        }
    if args.snap_cmd == "constraint":
        if args.constraint_cmd == "add":
            v = T.add_constraint(spark, args.table, args.name, args.expr)
            return {"table": args.table, "version": v,
                    "op": f"constraint:add:{args.name}"}
        if args.constraint_cmd == "drop":
            v = T.drop_constraint(spark, args.table, args.name)
            return {"table": args.table, "version": v,
                    "op": f"constraint:drop:{args.name}"}
        m = T._manifest(spark, args.table, None)
        return {"table": args.table,
                "constraints": m.get("constraints", {})}
    if args.snap_cmd == "spec":
        pcols = _split_specs(args.partition_by)
        v = T.set_partition_spec(spark, args.table, pcols)
        return {"table": args.table, "version": v,
                "op": f"partition-spec:{','.join(pcols)}"}
    if args.snap_cmd == "convert":
        pcols = _split_specs(args.partition_by)
        v = T.convert_in_place(spark, args.table, partition_cols=pcols)
        return {"table": args.table, "version": v, "op": "convert",
                "rows": T.read(spark, args.table, version=v).count()}
    if args.snap_cmd == "compact":
        v = T.compact(spark, args.table, target_files=args.target_files)
        return {"table": args.table, "version": v, "op": "compact"}
    if args.snap_cmd == "rollback":
        target = args.to_version
        if (target is None) == (args.to_timestamp is None):
            raise SystemExit(
                "snap rollback needs exactly one of --to-version / "
                "--to-timestamp"
            )
        if target is None:
            target = T.version_at(spark, args.table, args.to_timestamp)
        v = T.rollback(spark, args.table, to_version=target)
        return {"table": args.table, "version": v, "op": "rollback",
                "restored_version": target}
    if args.snap_cmd == "vacuum":
        n = T.vacuum(
            spark, args.table, keep_last=args.keep_last,
            min_age_sec=args.min_age_sec, dry_run=args.dry_run,
        )
        return {"table": args.table, "files_deleted": n, "op": "vacuum",
                "dry_run": args.dry_run}
    if args.snap_cmd == "log":
        # ONE directory listing; each manifest read directly (going
        # through _manifest would re-list per version — O(V^2) metadata
        # ops) and tolerantly (a concurrent vacuum may reap a version
        # between the listing and the read: report survivors, don't die)
        history = []
        for v in T.versions(spark, args.table):
            try:
                m = T._read_json(spark, T._snap_path(args.table, v))
            except Exception:
                continue  # vacuumed mid-listing
            history.append({
                "version": v,
                "op": m.get("op"),
                "parent": m.get("parent"),
                "n_files": len(m["files"]),
                "txn": m.get("txn", {}),
                "committed_at": m.get("committed_at"),
            })
        return {
            "table": args.table,
            "versions": [h["version"] for h in history],
            "history": history,
            "rows_head": T.read(spark, args.table).count(),
        }
    if args.snap_cmd == "stats":
        m = T._manifest(spark, args.table, None)
        fs, Path = T._hadoop_fs(spark, args.table)
        root = args.table.rstrip("/")
        total_bytes = 0
        per_partition: dict[str, int] = {}
        bloomed: dict[str, int] = {}
        for e in m["files"]:
            try:
                total_bytes += fs.getFileStatus(
                    Path(f"{root}/{e['path']}")
                ).getLen()
            except Exception:
                pass  # racing vacuum: report what survives
            key = ",".join(
                f"{k}={v}" for k, v in sorted(e.get("partition", {}).items())
            ) or "<unpartitioned>"
            per_partition[key] = per_partition.get(key, 0) + 1
            for c in e.get("bloom", {}):
                bloomed[c] = bloomed.get(c, 0) + 1
        return {
            "table": args.table,
            "version": m["version"],
            "op": m.get("op"),
            # metadata-only where entries carry footer counts; exact
            "rows": T.count_rows(spark, args.table, version=m["version"]),
            "n_files": len(m["files"]),
            "total_bytes": int(total_bytes),
            "files_per_partition": per_partition,
            "stats_cols": m.get("stats_cols", []),
            "bloom_cols": {c: f"{n}/{len(m['files'])} files"
                           for c, n in bloomed.items()},
            "dv_files": sum(1 for e in m["files"] if e.get("dv")),
            "constraints": m.get("constraints", {}),
            "txn": m.get("txn", {}),
            "statistics": T.table_statistics(spark, args.table),
        }
    if args.snap_cmd == "export":
        try:
            out = T.export_file_list(spark, args.table, version=args.version)
        except ValueError as e:
            raise SystemExit(str(e))
        return {"table": args.table, "op": "export",
                "version": out["version"], "n_files": len(out["files"]),
                "manifest": out["manifest"], "duckdb_sql": out["duckdb_sql"]}
    if args.snap_cmd == "rename":
        v = T.rename_column(spark, args.table, args.old, args.new)
        return {"table": args.table, "version": v,
                "op": f"rename:{args.old}->{args.new}"}
    if args.snap_cmd == "drop-column":
        v = T.drop_column(spark, args.table, args.col)
        return {"table": args.table, "version": v, "op": f"drop:{args.col}"}
    if args.snap_cmd == "maintain":
        return T.auto_maintain(
            spark, args.table, max_files=args.max_files,
            target_files=args.target_files, reanalyze=args.reanalyze,
            vacuum_keep_last=args.vacuum_keep_last,
        )
    if args.snap_cmd == "analyze":
        cols = args.col or None
        stats = T.analyze_table(spark, args.table, cols=cols, hll_b=args.b)
        return {"table": args.table, "op": "analyze", **stats}
    if args.snap_cmd == "merge":
        v = T.merge_upsert(
            spark.read.parquet(args.data), args.table,
            key_cols=args.keys.split(","),
        )
        return {
            "table": args.table,
            "version": v,
            "op": "merge",
            "rows": T.read(spark, args.table).count(),
        }
    if args.snap_cmd == "scan":
        partitions = None
        if args.partition:
            partitions = dict(kv.split("=", 1) for kv in args.partition)
        between = None
        if args.between:
            between = [
                (col, float(lo), float(hi)) for col, lo, hi in args.between
            ]
        point = None
        if args.point:
            col, val = args.point
            try:
                val = int(val)
            except ValueError:
                pass
            point = (col, val)
        # the resolved version is PINNED so a commit racing in cannot
        # make rows/files_scanned describe different snapshots, and the
        # frame is built from the already-pruned entries (no second
        # manifest read or pruning pass)
        from pyspark.sql import functions as F

        m = T._manifest(spark, args.table, args.version)
        pruned = T._select_entries(m, partitions, between, point)
        df = T._df_for(spark, args.table, m, pruned)
        if partitions:
            for kk, vv in partitions.items():
                df = df.filter(F.col(kk).cast("string") == str(vv))
        for col, lo, hi in T._norm_between(between):
            df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
        if point is not None:
            df = df.filter(F.col(point[0]) == point[1])
        return {
            "table": args.table,
            "version": m["version"],
            "files_total": len(m["files"]),
            "files_scanned": len(pruned),
            "rows": df.count(),
        }
    if args.snap_cmd == "tail":
        import json as _json
        import os as _os

        cursor, delivered = None, 0
        if _os.path.exists(args.cursor_file):
            with open(args.cursor_file) as f:
                raw = f.read().strip()
            try:
                state = _json.loads(raw)
                cursor, delivered = state["cursor"], state.get("delivered", 0)
            except (ValueError, KeyError, TypeError):
                cursor = int(raw)  # pre-JSON cursor files: bare version
        tailer = T.TableTailer(args.table, cursor=cursor)
        inc = tailer.poll(spark)
        new_rows = 0
        if inc is not None:
            # one execution of the increment plan: checkpoint, then both
            # the count and the sink write reuse the materialized rows
            inc = inc.localCheckpoint(eager=True)
            new_rows = int(inc.count())
            if args.out and new_rows:
                inc.write.mode("append").parquet(args.out)
        delivered += new_rows
        # persist the cursor AFTER the output is durable: a crash
        # between write and cursor update re-delivers the batch
        # (at-least-once); exactly-once callers write output + cursor
        # into one snaptable commit instead. Nothing is written while
        # the table does not exist yet (a 'None' cursor would poison
        # every later run).
        if tailer.cursor is not None:
            with open(args.cursor_file, "w") as f:
                _json.dump({"cursor": tailer.cursor, "delivered": delivered}, f)
        return {
            "table": args.table,
            "op": "tail",
            "new_rows": new_rows,
            "cursor": tailer.cursor,
            "out_rows_total": delivered,
        }
    if args.snap_cmd == "bloom":
        v = T.add_bloom_index(
            spark, args.table, args.col, bits=args.bits, k=args.k
        )
        return {
            "table": args.table,
            "version": v,
            "op": "bloom",
            "col": args.col,
        }
    if args.snap_cmd == "evolve":
        fields = []
        for spec in args.add:
            name, typ = spec.split(":", 1)
            fields.append((name, typ))
        v = T.evolve_schema(spark, args.table, fields)
        return {
            "table": args.table,
            "version": v,
            "op": "evolve",
            "added": [f"{n}:{t}" for n, t in fields],
            "columns": T.read(spark, args.table).columns,
        }
    if args.snap_cmd == "optimize":
        prune = {}
        if args.partition:
            parts = {}
            for kv in args.partition:
                if "=" not in kv:
                    raise SystemExit(
                        f"snap optimize --partition needs COL=VALUE, got {kv!r}"
                    )
                k, val = kv.split("=", 1)
                parts[k] = val
            prune["partitions"] = parts
        if args.between:
            prune["between"] = [
                (c, float(lo), float(hi)) for c, lo, hi in args.between
            ]
        v = T.optimize_cluster(
            spark, args.table, cols=args.cols.split(","),
            target_files=args.target_files,
            prune=prune or None,
        )
        m = T._manifest(spark, args.table, None)
        return {
            "table": args.table,
            "version": v,
            "op": "optimize",
            "zorder_by": args.cols,
            "scoped": bool(prune),
            "files": len(m["files"]),
        }
    if args.snap_cmd == "changes":
        if args.per_commit:
            ch = T.change_feed(spark, args.table, args.since, version=args.at)
            per = {
                int(r["_commit_version"]): {r["_change_type"]: int(r["n"])}
                for r in []
            }
            rows = (
                ch.groupBy("_commit_version", "_change_type").count()
                .withColumnRenamed("count", "n").collect()
            )
            for r in rows:
                per.setdefault(int(r["_commit_version"]), {})[
                    r["_change_type"]] = int(r["n"])
            return {
                "table": args.table,
                "since": args.since,
                "at": args.at,
                "per_commit": {str(k): per[k] for k in sorted(per)},
                "op": "changes",
            }
        ch = T.table_changes(
            spark, args.table, args.since, version=args.at
        )
        counts = {r["_change_type"]: r["n"] for r in (
            ch.groupBy("_change_type").count().withColumnRenamed("count", "n")
            .collect()
        )}
        return {
            "table": args.table,
            "since": args.since,
            "at": args.at,
            "inserts": int(counts.get("insert", 0)),
            "deletes": int(counts.get("delete", 0)),
            "op": "changes",
        }
    if args.snap_cmd == "bounds":
        b = T.column_bounds(spark, args.table, args.col, version=args.version)
        return {
            "table": args.table,
            "bounds": {c: [str(v) if v is not None else None for v in mm]
                       for c, mm in b.items()},
            "op": "bounds",
        }
    if args.snap_cmd == "join":
        tables = {}
        for t in args.table:
            if "=" not in t:
                raise SystemExit(
                    f"snap join --table needs NAME=PATH, got {t!r}"
                )
            nm, p = t.split("=", 1)
            tables[nm.strip()] = p.strip()
        edges = []
        for e in args.edge:
            parts = e.split(":")
            if len(parts) != 3:
                raise SystemExit(
                    f"snap join --edge needs A:B:KEY[,KEY2...], got {e!r}"
                )
            edges.append(
                (parts[0].strip(), parts[1].strip(),
                 [k for k in parts[2].split(",") if k])
            )
        filters = {}
        for f in args.filter or ():
            if "=" not in f:
                raise SystemExit(
                    f"snap join --filter needs NAME=PREDICATE, got {f!r}"
                )
            nm, pred = f.split("=", 1)
            filters[nm.strip()] = pred
        fb = None
        qe = None
        try:
            if args.learn:
                # this invocation plans from the store AS LOADED; the
                # measured run's factor updates persist for the NEXT
                # one — each call sees exactly one store state, so two
                # calls demonstrate the durable loop unambiguously
                learned = T.load_chain_feedback(spark, args.learn)
                fb = dict(learned) or None
                qe = T.chain_qerror(
                    spark, tables, edges, filters=filters or None,
                    feedback=learned,
                )
                T.save_chain_feedback(spark, args.learn, learned)
            plan = T.suggest_join_chain(
                spark, tables, edges, filters=filters or None, feedback=fb
            )
            df = T.join_chain(
                spark, tables, edges, how=args.how,
                filters=filters or None, feedback=fb,
            )
        except ValueError as e:
            raise SystemExit(str(e))
        out = {
            "order": plan["order"],
            "planner": plan["planner"],
            "steps": plan["steps"],
            "total_intermediate_bytes": plan["total_intermediate_bytes"],
            "rows": [r.asDict() for r in df.limit(args.limit).collect()],
            # chain_qerror already measured the final cardinality under
            # the identical plan — don't pay a third full execution
            # (its steps are inner joins, so only reuse for how=inner)
            "n_rows": (
                qe["steps"][-1]["true_rows"]
                if qe is not None and args.how == "inner"
                else df.count()
            ),
            "op": "join",
        }
        if qe is not None:
            out["feedback_edges"] = plan["feedback_edges"]
            out["median_qerror"] = qe["median_qerror"]
            out["max_qerror"] = qe["max_qerror"]
        return out
    if args.snap_cmd == "matview":
        from sec_financial_pipeline_spark.sources import matview as MV

        if args.matview_cmd == "create":
            aggs = []
            for a in args.agg:
                parts = a.split(":")
                if len(parts) != 3:
                    raise SystemExit(
                        f"snap matview --agg needs KIND:COL:ALIAS, got {a!r}"
                    )
                kind, col, alias = (s.strip() for s in parts)
                aggs.append((kind, col or None, alias))
            join = None
            if args.join and args.join_dim:
                raise SystemExit(
                    "snap matview: use either --join (chain) or the "
                    "--join-dim flag family, not both"
                )
            if args.join:
                chain = []
                for spec in args.join:
                    parts = spec.split("|")
                    if len(parts) not in (4, 5):
                        raise SystemExit(
                            "snap matview --join needs "
                            f"DIM|KEY|DIM_KEY|COLS[|HOW], got {spec!r}"
                        )
                    how = parts[4] if len(parts) == 5 else "inner"
                    chain.append(
                        {
                            "dim": parts[0],
                            "key": parts[1],
                            "dim_key": parts[2],
                            "dim_cols": [
                                c for c in parts[3].split(",") if c
                            ],
                            "mode": args.join_mode,
                            "how": how,
                        }
                    )
                join = chain if len(chain) > 1 else chain[0]
            elif args.join_dim:
                if not (args.join_key and args.join_dim_key
                        and args.join_dim_cols):
                    raise SystemExit(
                        "snap matview --join-dim needs --join-key, "
                        "--join-dim-key and --join-dim-cols"
                    )
                join = {
                    "dim": args.join_dim,
                    "key": args.join_key,
                    "dim_key": args.join_dim_key,
                    "dim_cols": [
                        c for c in args.join_dim_cols.split(",") if c
                    ],
                    "mode": args.join_mode,
                    "how": args.join_how,
                }
            try:
                cur = MV.create_matview(
                    spark, args.src, args.view,
                    [c for c in args.group_by.split(",") if c], aggs,
                    join=join,
                )
            except MV.MatviewError as e:
                raise SystemExit(str(e))
            return {"view": args.view, "src": args.src,
                    "cursor": cur, "op": "matview:create"}
        if args.matview_cmd == "refresh":
            try:
                cur = MV.refresh_matview(spark, args.view)
            except MV.MatviewError as e:
                raise SystemExit(str(e))
            return {"view": args.view, "cursor": cur, "op": "matview:refresh"}
        if args.matview_cmd == "stream":
            if args.duration is not None and args.interval is None:
                raise SystemExit(
                    "snap matview stream: --for requires --interval "
                    "(the default availableNow mode drains and exits "
                    "on its own)"
                )
            try:
                if args.interval is None:
                    q = MV.stream_refresh_matview(
                        spark, args.view, args.checkpoint, available_now=True
                    )
                    q.awaitTermination()
                else:
                    q = MV.stream_refresh_matview(
                        spark, args.view, args.checkpoint,
                        processing_time=f"{args.interval} seconds",
                    )
                    if args.duration is not None:
                        q.awaitTermination(args.duration)
                        if q.isActive:
                            q.stop()
                    else:
                        q.awaitTermination()
            except MV.MatviewError as e:
                raise SystemExit(str(e))
            return {
                "view": args.view,
                **MV.matview_lag(spark, args.view),
                "op": "matview:stream",
            }
        df = MV.read_matview(spark, args.view)
        return {
            "view": args.view,
            **MV.matview_lag(spark, args.view),
            "rows": [r.asDict() for r in df.limit(args.limit).collect()],
            "op": "matview:show",
        }
    raise SystemExit(f"unknown snap command: {args.snap_cmd}")


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    p = argparse.ArgumentParser(prog="sec_financial_pipeline_spark")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--warehouse", default="spark-warehouse/facts")
    sub = p.add_subparsers(dest="cmd", required=True)

    etl = sub.add_parser("etl", help="warehouse materialization jobs")
    etl_sub = etl.add_subparsers(dest="etl_cmd", required=True)
    fetch = etl_sub.add_parser("fetch")
    fetch.add_argument("ticker")
    inc = etl_sub.add_parser("incremental")
    inc.add_argument("--as-of", required=True, help="YYYY-MM-DD staleness anchor")
    etl_sub.add_parser("refresh")
    comp = etl_sub.add_parser("compact", help="small-file compaction (OPTIMIZE analog)")
    comp.add_argument("--files-per-partition", type=int, default=1)
    etl_sub.add_parser("status")

    dedup = sub.add_parser(
        "dedup", help="near-dedup signature-store lifecycle (§2.9 tooling)"
    )
    dedup_sub = dedup.add_subparsers(dest="dedup_cmd", required=True)
    db = dedup_sub.add_parser("build", help="band a corpus into a new store")
    db.add_argument("--docs", required=True, help="parquet of (doc_id, text)")
    db.add_argument("--store", required=True)
    di = dedup_sub.add_parser(
        "ingest", help="probe a batch against the store, emit pairs, commit"
    )
    di.add_argument("--docs", required=True)
    di.add_argument("--store", required=True)
    di.add_argument("--pairs", required=True, help="parquet pair sink (append)")
    ds = dedup_sub.add_parser("status")
    ds.add_argument("--store", required=True)
    dc = dedup_sub.add_parser(
        "compact",
        help="rewrite the store's band partitions into few files "
        "(each ingest appends files; compaction is the OPTIMIZE analog)",
    )
    dc.add_argument("--store", required=True)
    dc.add_argument("--files-per-partition", type=int, default=1)

    bm25 = sub.add_parser(
        "bm25", help="BM25 inverted-index store lifecycle (§2.9 retrieval)"
    )
    bm25_sub = bm25.add_subparsers(dest="bm25_cmd", required=True)
    bb = bm25_sub.add_parser("build", help="index a corpus into a new store")
    bb.add_argument("--docs", required=True, help="parquet of (doc_id, text)")
    bb.add_argument("--store", required=True)
    bi = bm25_sub.add_parser("ingest", help="append new documents O(batch)")
    bi.add_argument("--docs", required=True)
    bi.add_argument("--store", required=True)
    bd = bm25_sub.add_parser(
        "delete",
        help="tombstone documents (exact df/idf maintenance; postings "
        "files untouched — run compact to reclaim bytes)",
    )
    bd.add_argument("--ids", required=True, help="parquet of doc ids")
    bd.add_argument("--id-col", default="doc_id")
    bd.add_argument("--store", required=True)
    bu = bm25_sub.add_parser(
        "update", help="re-write documents in place (tombstone + re-ingest)"
    )
    bu.add_argument("--docs", required=True)
    bu.add_argument("--store", required=True)
    bc = bm25_sub.add_parser(
        "compact",
        help="fold streaming epoch dirs + purge tombstoned postings "
        "into one doc-clustered flat layout",
    )
    bc.add_argument("--store", required=True)
    bq = bm25_sub.add_parser("query", help="score a query corpus, top-k")
    bq.add_argument("--queries", required=True, help="parquet of (doc_id, text)")
    bq.add_argument("--store", required=True)
    bq.add_argument("--out", required=True)
    bq.add_argument("--top-k", type=int, default=10)
    bst = bm25_sub.add_parser("status")
    bst.add_argument("--store", required=True)

    decon = sub.add_parser(
        "decon", help="ingest-time eval-decontamination gate (§2.9 tooling)"
    )
    decon_sub = decon.add_subparsers(dest="decon_cmd", required=True)
    deb = decon_sub.add_parser(
        "build", help="persist the eval split's distinct k-gram set"
    )
    deb.add_argument("--docs", required=True, help="parquet of (doc_id, text)")
    deb.add_argument("--store", required=True)
    deb.add_argument("--k", type=int, default=5)
    deg = decon_sub.add_parser(
        "gate", help="probe a batch, write the clean rows, report drops"
    )
    deg.add_argument("--docs", required=True)
    deg.add_argument("--store", required=True)
    deg.add_argument("--out", required=True, help="parquet sink for clean rows")
    deg.add_argument("--k", type=int, default=5)
    deg.add_argument("--min-overlap", type=int, default=3)

    shuf = sub.add_parser(
        "shuffle",
        help="materialize a training epoch as ordered shards (§2.9 tooling)",
    )
    shuf.add_argument("--docs", required=True, help="input parquet")
    shuf.add_argument("--out", required=True, help="shard output dir")
    shuf.add_argument("--shards", type=int, default=8)
    shuf.add_argument("--seed", default="epoch0")
    shuf.add_argument("--key", default="doc_id", help="unique key column")
    shuf.add_argument(
        "--files-per-shard",
        type=int,
        default=1,
        help="cut each shard into k contiguous pos ranges (k parallel "
        "sorts instead of one task sorting the whole shard)",
    )

    boiler = sub.add_parser(
        "boiler",
        help="corpus-level boilerplate removal (CCNet/Gopher line dedup)",
    )
    boiler.add_argument("--docs", required=True, help="input parquet")
    boiler.add_argument("--out", required=True, help="cleaned corpus output")
    boiler.add_argument("--min-docs", type=int, default=3)
    boiler.add_argument(
        "--segment-width",
        type=int,
        default=0,
        help="0 = split on newlines; k > 0 = k-token segments",
    )
    boiler.add_argument("--key", default="doc_id")
    boiler.add_argument("--text-col", default="text")

    uni_p = sub.add_parser(
        "unigram",
        help="unigram-LM tokenizer: Viterbi-EM train + corpus apply",
    )
    uni_sub = uni_p.add_subparsers(dest="unigram_cmd", required=True)
    ut = uni_sub.add_parser("train")
    ut.add_argument("--docs", required=True, help="input parquet corpus")
    ut.add_argument("--model", required=True, help="piece-table parquet output")
    ut.add_argument("--iters", type=int, default=2)
    ut.add_argument("--max-piece-len", type=int, default=3)
    ut.add_argument("--max-word-len", type=int, default=12)
    ut.add_argument("--min-seed-count", type=int, default=2)
    ut.add_argument("--text-col", default="text")
    ua = uni_sub.add_parser("apply")
    ua.add_argument("--docs", required=True, help="input parquet corpus")
    ua.add_argument("--model", required=True, help="piece-table parquet")
    ua.add_argument("--out", required=True, help="token-stream parquet output")
    ua.add_argument("--id-col", default="doc_id")
    ua.add_argument("--text-col", default="text")
    ua.add_argument("--max-piece-len", type=int, default=3)
    ua.add_argument("--max-word-len", type=int, default=12)

    bpe_p = sub.add_parser(
        "bpe", help="BPE tokenizer: distributed train + corpus apply"
    )
    bpe_sub = bpe_p.add_subparsers(dest="bpe_cmd", required=True)
    bt = bpe_sub.add_parser("train")
    bt.add_argument("--docs", required=True, help="input parquet corpus")
    bt.add_argument("--model", required=True, help="merge-list JSON output")
    bt.add_argument("--merges", type=int, default=200)
    bt.add_argument("--min-pair-freq", type=int, default=2)
    bt.add_argument("--text-col", default="text")
    ba = bpe_sub.add_parser("apply")
    ba.add_argument("--docs", required=True, help="input parquet corpus")
    ba.add_argument("--model", required=True, help="merge-list JSON")
    ba.add_argument("--out", required=True, help="tokenized parquet output")
    ba.add_argument("--text-col", default="text")

    snap = sub.add_parser(
        "snap",
        help="snapshot-manifest parquet table (Delta-semantics commits)",
    )
    snap_sub = snap.add_subparsers(dest="snap_cmd", required=True)
    for name in ("create", "append", "overwrite"):
        sp = snap_sub.add_parser(name)
        sp.add_argument("--table", required=True)
        sp.add_argument("--data", required=True, help="input parquet")
        if name == "create":
            sp.add_argument(
                "--partition-by",
                default="",
                help="comma-separated partition columns (fixed for the "
                "table's lifetime; appends inherit them)",
            )
    stg = snap_sub.add_parser(
        "tag",
        help="named snapshot pins (vacuum retains tagged versions)",
    )
    stg_sub = stg.add_subparsers(dest="tag_cmd", required=True)
    sta = stg_sub.add_parser("add")
    sta.add_argument("--table", required=True)
    sta.add_argument("--name", required=True)
    sta.add_argument("--version", type=int, default=None)
    stl = stg_sub.add_parser("list")
    stl.add_argument("--table", required=True)
    str_ = stg_sub.add_parser("rm")
    str_.add_argument("--table", required=True)
    str_.add_argument("--name", required=True)
    scl2 = snap_sub.add_parser(
        "clone",
        help="clone a snapshot to a new table (deep copy by default; "
        "--shallow = zero-copy metadata-only branch)",
    )
    scl2.add_argument("--table", required=True, help="source table")
    scl2.add_argument("--dst", required=True, help="new table path")
    scl2.add_argument("--version", type=int, default=None)
    scl2.add_argument("--shallow", action="store_true")
    sd = snap_sub.add_parser("delete")
    sd.add_argument("--table", required=True)
    sd.add_argument("--where", required=True, help="SQL predicate to delete")
    sd.add_argument("--cdf", action="store_true",
                    help="persist a change sidecar for this commit")
    sd.add_argument(
        "--mode", choices=("cow", "dv"), default="cow",
        help="cow rewrites touched files; dv writes a deletion-vector "
        "sidecar (merge-on-read, no file rewritten)",
    )
    spg = snap_sub.add_parser(
        "purge", help="materialize deletion vectors (rewrite only DV files)"
    )
    spg.add_argument("--table", required=True)
    sup = snap_sub.add_parser("update", help="COW UPDATE ... SET ... WHERE")
    sup.add_argument("--table", required=True)
    sup.add_argument("--where", required=True)
    sup.add_argument(
        "--set", action="append", required=True,
        help="col=sql_expr (repeatable)",
    )
    scon = snap_sub.add_parser(
        "constraint", help="CHECK constraints (add/drop/list)"
    )
    scon_sub = scon.add_subparsers(dest="constraint_cmd", required=True)
    sca = scon_sub.add_parser("add")
    sca.add_argument("--table", required=True)
    sca.add_argument("--name", required=True)
    sca.add_argument("--expr", required=True, help="SQL CHECK expression")
    scd = scon_sub.add_parser("drop")
    scd.add_argument("--table", required=True)
    scd.add_argument("--name", required=True)
    scl = scon_sub.add_parser("list")
    scl.add_argument("--table", required=True)
    ssp = snap_sub.add_parser(
        "spec",
        help="partition evolution: set the spec for FUTURE writes "
        "(metadata-only commit; existing files keep their layout)",
    )
    ssp.add_argument("--table", required=True)
    ssp.add_argument(
        "--partition-by", default="",
        help="comma-separated columns; empty un-partitions future writes",
    )
    scv = snap_sub.add_parser(
        "convert",
        help="register an existing parquet dir as a snaptable IN PLACE "
        "(zero rewrite; CONVERT TO DELTA analog)",
    )
    scv.add_argument("--table", required=True, help="the parquet dir itself")
    scv.add_argument(
        "--partition-by", default="",
        help="comma-separated Hive partition columns of the existing layout",
    )
    sc = snap_sub.add_parser("compact")
    sc.add_argument("--table", required=True)
    sc.add_argument("--target-files", type=int, default=1)
    sr = snap_sub.add_parser("rollback")
    sr.add_argument("--table", required=True)
    sr.add_argument("--to-version", type=int)
    sr.add_argument("--to-timestamp",
                    help="ISO instant; restores the version current then")
    sv = snap_sub.add_parser("vacuum")
    sv.add_argument("--table", required=True)
    sv.add_argument("--keep-last", type=int, default=2)
    sv.add_argument("--min-age-sec", type=float, default=3600.0)
    sv.add_argument("--dry-run", action="store_true")
    sl = snap_sub.add_parser("log")
    sl.add_argument("--table", required=True)
    sst = snap_sub.add_parser(
        "stats",
        help="table statistics from the manifest: files/bytes per "
        "partition, stats/bloom coverage, txn watermarks",
    )
    sst.add_argument("--table", required=True)
    sm = snap_sub.add_parser(
        "merge", help="upsert: replace matching keys + insert, one commit"
    )
    sm.add_argument("--table", required=True)
    sm.add_argument("--data", required=True, help="input parquet")
    sm.add_argument("--keys", required=True, help="comma-separated key cols")
    sxp = snap_sub.add_parser(
        "export",
        help="interop file-list export (symlink-manifest analog + ready "
        "DuckDB SQL; identity layouts emit hive_partitioning reads); "
        "refuses DV'd / column-mapped snapshots external readers "
        "would get wrong",
    )
    sxp.add_argument("--table", required=True)
    sxp.add_argument("--version", type=int, default=None)
    srn = snap_sub.add_parser(
        "rename",
        help="RENAME COLUMN, metadata-only (column-mapping): old files "
        "keep their physical name, readers coalesce",
    )
    srn.add_argument("--table", required=True)
    srn.add_argument("--old", required=True)
    srn.add_argument("--new", required=True)
    sdc = snap_sub.add_parser(
        "drop-column",
        help="DROP COLUMN, metadata-only: reads project it away; the "
        "physical name is tombstoned against re-adding",
    )
    sdc.add_argument("--table", required=True)
    sdc.add_argument("--col", required=True)
    smt = snap_sub.add_parser(
        "maintain",
        help="one-call health pass: compact past --max-files, re-bloom "
        "uncovered indexed columns, optionally re-analyze and vacuum",
    )
    smt.add_argument("--table", required=True)
    smt.add_argument("--max-files", type=int, default=64)
    smt.add_argument("--target-files", type=int, default=8)
    smt.add_argument("--reanalyze", action="store_true")
    smt.add_argument("--vacuum-keep-last", type=int, default=None)
    san = snap_sub.add_parser(
        "analyze",
        help="ANALYZE TABLE: exact null counts + min/max (metadata "
        "fast paths) and HLL distinct-count estimates (one scan for "
        "all columns), persisted beside the manifests",
    )
    san.add_argument("--table", required=True)
    san.add_argument("--col", action="append", default=None)
    san.add_argument("--b", type=int, default=12, help="HLL register bits")
    sbn = snap_sub.add_parser(
        "bounds",
        help="exact per-column MIN/MAX from manifest metadata (zero "
        "files opened in the common case; DV'd or statless entries "
        "fall back to one confined scan)",
    )
    sbn.add_argument("--table", required=True)
    sbn.add_argument("--col", action="append", required=True)
    sbn.add_argument("--version", type=int, default=None)
    sjn = snap_sub.add_parser(
        "join",
        help="statistics-driven multi-table join: Selinger-DP order "
        "from ANALYZE NDVs + manifest sizes, per-step broadcasts, "
        "filter-aware selectivity",
    )
    sjn.add_argument(
        "--table", action="append", required=True, metavar="NAME=PATH",
        help="snaptable to join (repeatable)",
    )
    sjn.add_argument(
        "--edge", action="append", required=True, metavar="A:B:KEY[,KEY2]",
        help="equi-join edge on same-named columns (repeatable)",
    )
    sjn.add_argument(
        "--filter", action="append", default=[], metavar="NAME=PREDICATE",
        help="SQL predicate on one table (applied in full; simple "
        "clauses also steer the plan)",
    )
    sjn.add_argument("--how", default="inner")
    sjn.add_argument("--limit", type=int, default=20)
    sjn.add_argument(
        "--learn", default=None, metavar="STORE",
        help="feedback-store directory: load learned per-edge "
        "selectivity factors into the planner, MEASURE this run's "
        "step cardinalities (chain_qerror — pays one count per step), "
        "and persist the updated factors back (crash-safe "
        "stage-then-overwrite)",
    )
    smv = snap_sub.add_parser(
        "matview",
        help="incrementally-maintained materialized aggregate view "
        "(refresh cost is O(rows changed), never O(source table))",
    )
    smv_sub = smv.add_subparsers(dest="matview_cmd", required=True)
    mvc = smv_sub.add_parser("create")
    mvc.add_argument("--src", required=True, help="source snaptable")
    mvc.add_argument("--view", required=True, help="view table to create")
    mvc.add_argument("--group-by", required=True, help="comma-separated cols")
    mvc.add_argument(
        "--agg",
        action="append",
        required=True,
        metavar="KIND:COL:ALIAS",
        help="aggregate, e.g. sum:price:total or count::n (repeatable; "
        "kinds: count sum avg min max)",
    )
    mvc.add_argument("--join-dim", help="dim snaptable for a join view")
    mvc.add_argument("--join-key", help="fact-side join column")
    mvc.add_argument("--join-dim-key", help="dim-side join column")
    mvc.add_argument(
        "--join-dim-cols", help="comma-separated dim columns to expose"
    )
    mvc.add_argument(
        "--join-how", choices=("inner", "left"), default="inner",
        help="inner: unmatched facts leave the view; left: they stay "
        "as NULL-group rows",
    )
    mvc.add_argument(
        "--join-mode", choices=("pin", "follow"), default="pin",
        help="pin: dim frozen at create (repin to move); "
             "follow: dim tracked incrementally (full IVM)",
    )
    mvc.add_argument(
        "--join",
        action="append",
        metavar="DIM|KEY|DIM_KEY|COLS[|HOW]",
        help="one join of a snowflake CHAIN (repeatable; folds "
        "left-to-right, a later KEY may name an earlier dim's column; "
        "HOW = inner|left, default inner; every join takes the chain "
        "mode from --join-mode). Pipe-separated so dim paths may "
        "contain colons.",
    )
    mvr = smv_sub.add_parser("refresh")
    mvr.add_argument("--view", required=True)
    mvt = smv_sub.add_parser(
        "stream",
        help="continuous refresh driven by the source's version-offset "
        "stream (T7 daemon analog); default drains the available "
        "commits once (availableNow) and exits",
    )
    mvt.add_argument("--view", required=True)
    mvt.add_argument("--checkpoint", required=True)
    mvt.add_argument(
        "--interval", type=float, default=None,
        help="processingTime trigger seconds; run continuously",
    )
    mvt.add_argument(
        "--for", dest="duration", type=float, default=None,
        help="with --interval: stop after this many seconds",
    )
    mvs = smv_sub.add_parser("show")
    mvs.add_argument("--view", required=True)
    mvs.add_argument("--limit", type=int, default=20)
    ss = snap_sub.add_parser(
        "scan", help="pruned read: partition equality and/or stats range"
    )
    ss.add_argument("--table", required=True)
    ss.add_argument("--version", type=int, default=None)
    ss.add_argument(
        "--partition",
        action="append",
        default=[],
        metavar="COL=VALUE",
        help="partition equality filter (repeatable)",
    )
    ss.add_argument(
        "--between",
        nargs=3,
        action="append",
        metavar=("COL", "LO", "HI"),
        help="numeric range filter using footer min/max file skipping "
        "(repeatable; multiple ranges AND together and skip "
        "multiplicatively on a z-ordered table)",
    )
    ss.add_argument(
        "--point",
        nargs=2,
        metavar=("COL", "VALUE"),
        help="equality probe using the column's Bloom sidecars "
        "(see snap bloom)",
    )
    stl = snap_sub.add_parser(
        "tail",
        help="incremental consumption: emit only rows added since the "
        "cursor file's version (first run = full snapshot)",
    )
    stl.add_argument("--table", required=True)
    stl.add_argument("--cursor-file", required=True)
    stl.add_argument("--out", default=None, help="append new rows to this parquet")
    sb = snap_sub.add_parser(
        "bloom",
        help="per-file Bloom sidecars for point-lookup file skipping "
        "(metadata-only commit)",
    )
    sb.add_argument("--table", required=True)
    sb.add_argument("--col", required=True)
    sb.add_argument("--bits", type=int, default=4096)
    sb.add_argument("--k", type=int, default=5)
    se = snap_sub.add_parser(
        "evolve",
        help="ADD COLUMNS, metadata-only commit: existing rows read the "
        "new columns as NULL; zero data rewritten",
    )
    se.add_argument("--table", required=True)
    se.add_argument(
        "--add",
        action="append",
        required=True,
        metavar="NAME:TYPE",
        help="column to add, e.g. score:double (repeatable)",
    )
    so = snap_sub.add_parser(
        "optimize",
        help="z-order clustering rewrite: files cover narrow min/max "
        "ranges on every clustered column, so scan --between skips",
    )
    so.add_argument("--table", required=True)
    so.add_argument("--cols", required=True, help="comma-separated numeric cols")
    so.add_argument("--target-files", type=int, default=16)
    so.add_argument(
        "--partition", action="append", default=[], metavar="COL=VALUE",
        help="scope the rewrite to matching files (OPTIMIZE ... WHERE; "
        "repeatable); unscoped rewrites the whole snapshot",
    )
    so.add_argument(
        "--between", nargs=3, action="append", metavar=("COL", "LO", "HI"),
        help="scope the rewrite to files whose footer range intersects "
        "(repeatable)",
    )
    sch = snap_sub.add_parser(
        "changes",
        help="row-level change feed between two versions (insert/delete "
        "counts; cost scales with changed files, not table size)",
    )
    sch.add_argument("--table", required=True)
    sch.add_argument("--since", type=int, required=True)
    sch.add_argument(
        "--per-commit", action="store_true",
        help="per-commit feed (change_feed) instead of the net diff",
    )
    sch.add_argument("--at", type=int, default=None)

    serve = sub.add_parser("serve", help="HTTP facade server (blocking)")
    serve.add_argument("--host", default="127.0.0.1")
    serve.add_argument("--port", type=int, default=8000)

    explain = sub.add_parser(
        "explain",
        help="print a registry query's physical plan (the plan-audit view)",
    )
    explain.add_argument("query", help="registry query name, or 'list'")
    explain.add_argument(
        "--mode",
        choices=("simple", "extended", "formatted", "cost", "codegen"),
        default="formatted",
    )

    tools = sub.add_parser(
        "tools", help="MCP tool server (blocking); --transport picks the mode"
    )
    tools.add_argument(
        "--transport",
        choices=("stdio", "sse", "ws"),
        default="stdio",
        help="stdio JSON lines (default), SSE on --port, or WebSocket on --port",
    )
    tools.add_argument("--host", default="127.0.0.1")
    tools.add_argument(
        "--port",
        type=int,
        default=0,
        help="network transports only; 0 = auto (reference defaults: sse 8001, ws 8002)",
    )

    args = p.parse_args(argv)

    own_session = spark is None
    if spark is None:
        from sec_financial_pipeline_spark.session import get_spark

        spark = get_spark(app_name="sfp-cli")
    try:
        if args.cmd == "etl":
            print(json.dumps(_cmd_etl(args, spark), default=str))
            return 0
        if args.cmd == "dedup":
            print(json.dumps(_cmd_dedup(args, spark), default=str))
            return 0
        if args.cmd == "bm25":
            print(json.dumps(_cmd_bm25(args, spark), default=str))
            return 0
        if args.cmd == "decon":
            print(json.dumps(_cmd_decon(args, spark), default=str))
            return 0
        if args.cmd == "shuffle":
            print(json.dumps(_cmd_shuffle(args, spark), default=str))
            return 0
        if args.cmd == "boiler":
            print(json.dumps(_cmd_boiler(args, spark), default=str))
            return 0
        if args.cmd == "unigram":
            print(json.dumps(_cmd_unigram(args, spark), default=str))
            return 0
        if args.cmd == "bpe":
            print(json.dumps(_cmd_bpe(args, spark), default=str))
            return 0
        if args.cmd == "snap":
            print(json.dumps(_cmd_snap(args, spark), default=str))
            return 0
        if args.cmd == "serve":
            from sec_financial_pipeline_spark.transport.http import serve as http_serve

            http_serve(spark, args.sf_dir, host=args.host, port=args.port)
            return 0
        if args.cmd == "explain":
            from sec_financial_pipeline_spark.registry import all_queries

            qs = all_queries()
            # bench constituents (e.g. emb_pq_serve) are plan-auditable
            # too, even when consolidated out of the 50-name registry;
            # bench.py lives at the repo root, so outside a repo checkout
            # the extras are simply unavailable
            try:
                from bench import _headline_fns

                extras = {
                    k: v for k, v in _headline_fns().items() if k not in qs
                }
            except ImportError:
                extras = {}
            if args.query == "list":
                print("\n".join(list(qs) + sorted(extras)))
                return 0
            if args.query in qs:
                qs[args.query].fn(spark, args.sf_dir).explain(mode=args.mode)
                return 0
            if args.query in extras:
                extras[args.query](spark, args.sf_dir).explain(mode=args.mode)
                return 0
            raise SystemExit(
                f"unknown query: {args.query!r} (try 'explain list')"
            )
        if args.cmd == "tools":
            from sec_financial_pipeline_spark.plans.tools import ToolRegistry

            registry = ToolRegistry(spark, args.sf_dir)
            if args.transport == "sse":
                from sec_financial_pipeline_spark.transport.sse import MCPSSEServer

                MCPSSEServer(
                    registry, host=args.host, port=args.port or 8001
                ).serve_forever()
            elif args.transport == "ws":
                from sec_financial_pipeline_spark.transport.ws import (
                    MCPWebSocketServer,
                )

                MCPWebSocketServer(
                    registry, host=args.host, port=args.port or 8002
                ).serve_forever()
            else:
                from sec_financial_pipeline_spark.transport.stdio import serve_stdio

                serve_stdio(registry, sys.stdin, sys.stdout)
            return 0
        raise SystemExit(f"unknown command: {args.cmd}")
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
