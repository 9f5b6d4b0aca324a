"""Regression tests for operator-contract fixes (round-2 ADVICE items)."""

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.asof import as_of_join


def test_asof_numeric_tiebreaker_orders_natively(spark):
    # Two left rows share (key, ts); the greatest tiebreaker row must win.
    # With ids 9 and 10 a lexicographic (string) order would pick 9.
    left = spark.createDataFrame(
        [("k", 100, 9, "from_id_9"), ("k", 100, 10, "from_id_10")],
        "key string, ts int, row_id int, payload string",
    )
    right = spark.createDataFrame(
        [("k", 150, 1)], "key string, ts int, event int"
    )
    out = as_of_join(
        left,
        right,
        on=["key"],
        left_time="ts",
        right_time="ts",
        value_cols=["payload"],
        left_tiebreakers=["row_id"],
    ).collect()
    assert len(out) == 1
    assert out[0]["payload"] == "from_id_10"


def test_metric_series_total_order_is_deterministic(spark):
    # plans.analytics.metric_series must break (priority, |value|, end_date)
    # ties by fact_id: rows identical up to sign used to be nondeterministic.
    from sec_financial_pipeline_spark.plans.analytics import metric_series

    facts = spark.createDataFrame(
        [
            ("T00", "Revenues", "USD", 2000, None, "2000-12-31", None, 1, -5.0, "10-K", "Revenues", 1),
            ("T00", "Revenues", "USD", 2000, None, "2000-12-31", None, 2, 5.0, "10-K", "Revenues", 1),
        ],
        "ticker string, tag string, unit string, fiscal_year int, fiscal_period string, "
        "end_date string, instant_date string, fact_id long, value double, form string, "
        "label string, cik int",
    )
    alias_map = spark.createDataFrame(
        [("Revenues", "revenue", 0)], "tag string, metric string, priority int"
    )
    for n_part in (1, 7):
        rows = (
            metric_series(facts.repartition(n_part), alias_map, "revenue")
            .select("ticker", "fiscal_year", "value")
            .collect()
        )
        assert [r["value"] for r in rows] == [-5.0], rows


def test_kmeans_lloyd_converges_and_is_deterministic(spark):
    # Two well-separated groups; seeds start inside each group. One
    # iteration must land centroids on the group means; assignment must
    # be identical under different partitioning.
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import kmeans
    from sec_financial_pipeline_spark.operators import similarity as S

    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [1.1, -0.1]),
        (3, [0.0, 1.0]), (4, [0.1, 0.9]), (5, [-0.1, 1.1]),
    ]
    for n_part in (1, 5):
        e = (
            spark.createDataFrame(rows, "vec_id long, emb array<double>")
            .repartition(n_part)
            .withColumn("nrm", S.norm(F.col("emb")))
        )
        seeds = e.filter(F.col("vec_id").isin(0, 3)).select(
            F.col("vec_id").cast("int").alias("cluster"),
            F.col("emb").alias("cvec"),
            F.col("nrm").alias("c_nrm"),
        )
        cents = {r.cluster: r.cvec for r in kmeans.lloyd(e, seeds, 1).collect()}
        assert cents[0] == [1.0, 0.0]  # mean of group A, exact decimals
        assert cents[3] == [0.0, 1.0]
        assign = kmeans.assign_clusters(e, kmeans.lloyd(e, seeds, 2))
        got = {r.vec_id: r.cluster for r in assign.collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


# ---------------------------------------------------------------------------
# Round-8: corpus-level boilerplate removal (CCNet/Gopher line dedup)
# ---------------------------------------------------------------------------


def test_boilerplate_removal_matches_bruteforce(spark, sf_dir):
    """Pure-Python witness over a corpus slice: token-segment lines,
    drop segments present in >= T distinct docs, reassemble in order —
    the operator chain must reproduce it exactly, including docs whose
    every line is boilerplate."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.dedup import (
        drop_boilerplate_lines,
        reassemble_lines,
        token_segment_lines,
    )
    from sec_financial_pipeline_spark.sources.testdata import load_table

    W, T = 3, 2
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(150)
    docs = {r.doc_id: r.text for r in d.collect()}
    # brute force
    seg_docs: dict[str, set] = {}
    doc_segs: dict[int, list] = {}
    for did, text in docs.items():
        w = text.split(" ")
        segs = [" ".join(w[i : i + W]) for i in range(0, len(w), W)]
        doc_segs[did] = segs
        for s in set(segs):
            seg_docs.setdefault(s, set()).add(did)
    boiler = {s for s, ds in seg_docs.items() if len(ds) >= T}
    expect = {
        did: " ".join(s for s in segs if s not in boiler)
        for did, segs in doc_segs.items()
    }
    # operator chain
    lines = token_segment_lines(d, "doc_id", "text", W)
    kept = drop_boilerplate_lines(lines, "doc_id", T)
    clean = reassemble_lines(kept, "doc_id", sep=" ")
    got = {r.doc_id: r.clean_text for r in clean.collect()}
    for did in docs:
        assert got.get(did, "") == expect[did], f"doc {did}"
    assert any(v == "" for v in expect.values()) or boiler  # non-vacuous


def test_boilerplate_newline_path_drops_recurring_lines(spark):
    """The real-corpus path: newline-split lines, normalization folds
    cosmetic variants (case / surrounding whitespace) into one key, the
    ORIGINAL surviving lines come back in order with \\n separators."""
    from sec_financial_pipeline_spark.operators.dedup import (
        drop_boilerplate_lines,
        line_table,
        reassemble_lines,
    )

    rows = [
        (1, "unique first line\nAccept all cookies \nreal content one"),
        (2, "accept all cookies\nreal content two"),
        (3, "ACCEPT ALL COOKIES\nreal content three\nunique tail"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    lines = line_table(d, "doc_id", "text", sep="\n")
    kept = drop_boilerplate_lines(lines, "doc_id", min_docs=3)
    out = {
        r.doc_id: r.clean_text
        for r in reassemble_lines(kept, "doc_id", sep="\n").collect()
    }
    assert out[1] == "unique first line\nreal content one"
    assert out[2] == "real content two"
    assert out[3] == "real content three\nunique tail"


def test_repeated_kgram_spans_match_bruteforce(spark, sf_dir):
    """Pure-Python witness for the ExactSubstr span detector: per-pos
    k-grams, corpus-wide counts, flag >= 2, merge window starts within
    k, emit (start, end=max+k-1, n_windows) — the operator must
    reproduce it exactly on a corpus slice."""
    from sec_financial_pipeline_spark.operators.dedup import (
        repeated_kgram_spans,
    )
    from sec_financial_pipeline_spark.sources.testdata import load_table

    K = 6
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    # plant duplicates the slice is guaranteed to contain: (a) full-doc
    # clones (cross-doc duplicated runs), (b) a doc repeating its own
    # opening phrase (intra-doc span), (c) a shared pasted passage
    # inside two otherwise-unique docs
    clones = base.limit(4).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    extra = spark.createDataFrame(
        [
            (600_001, f"unique lead {passage} unique tail one x y"),
            (600_002, f"other opening words {passage} closing run two"),
            (600_003, "rep one two three four five six rep one two three four five six end"),
        ],
        "doc_id long, text string",
    )
    d = base.unionByName(clones).unionByName(extra)
    docs = {r.doc_id: r.text.split(" ") for r in d.collect()}
    counts: dict[str, int] = {}
    grams: dict[int, list] = {}
    for did, w in docs.items():
        gs = [" ".join(w[i : i + K]) for i in range(len(w) - K + 1)]
        grams[did] = gs
        for g in gs:
            counts[g] = counts.get(g, 0) + 1
    expect = set()
    for did, gs in grams.items():
        flagged = [i for i, g in enumerate(gs) if counts[g] >= 2]
        span: list = []
        for p in flagged:
            if span and p - span[-1] <= K:
                span.append(p)
            else:
                if span:
                    expect.add((did, span[0], span[-1] + K - 1, len(span)))
                span = [p]
        if span:
            expect.add((did, span[0], span[-1] + K - 1, len(span)))
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in repeated_kgram_spans(d, "doc_id", "text", k=K).collect()
    }
    assert got == expect and len(expect) > 0


def test_bigram_support_profile_matches_bruteforce(spark, sf_dir):
    """Pure-Python witness for the corpus-LM fluency profile: corpus
    bigram counts, per-doc capped support sums and rare counts — the
    operator must reproduce them exactly."""
    from sec_financial_pipeline_spark.operators.dedup import (
        bigram_support_profile,
    )
    from sec_financial_pipeline_spark.sources.testdata import load_table

    CAP, RARE = 10, 2
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(150)
    docs = {r.doc_id: r.text.split(" ") for r in d.collect()}
    counts: dict[tuple, int] = {}
    for w in docs.values():
        for i in range(len(w) - 1):
            counts[(w[i], w[i + 1])] = counts.get((w[i], w[i + 1]), 0) + 1
    expect = {}
    for did, w in docs.items():
        bgs = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
        if bgs:
            expect[did] = (
                len(bgs),
                sum(min(counts[b], CAP) for b in bgs),
                sum(1 for b in bgs if counts[b] <= RARE),
            )
    got = {
        r.doc_id: (r.n_bigrams, r.support_sum, r.n_rare)
        for r in bigram_support_profile(
            d, "doc_id", "text", support_cap=CAP, rare_max=RARE
        ).collect()
    }
    assert got == expect and len(expect) > 0
    # signal sanity: rare bigrams exist AND common ones hit the cap
    assert any(v[2] > 0 for v in expect.values())


def test_edit_distance_pairs_verifies_only_candidates(spark):
    """The Levenshtein verifier (dedup family's character-level
    modality): scores ONLY the supplied candidate pairs — never forms
    pairs itself — with distance equal to a pure-Python DP and the
    similarity cut applied. A template-with-substitutions dup passes;
    an unrelated text fails even when a candidate pair names it."""
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators.dedup import (
        edit_distance_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    variant = "the quick brown cat jumps over the lazy dog again and again"
    unrelated = "zzzz qqqq wwww eeee rrrr tttt yyyy uuuu iiii oooo pppp"
    docs = spark.createDataFrame(
        [(1, base), (2, variant), (3, unrelated), (4, base)],
        "doc_id bigint, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a bigint, id_b bigint"
    )

    def py_lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = {
        (r.id_a, r.id_b): (r.edit_dist, r.edit_sim)
        for r in edit_distance_pairs(docs, cand, min_sim=0.4).collect()
    }
    # (1,2): 3 substituted chars; (1,4): identical; (1,3): dropped
    assert set(out) == {(1, 2), (1, 4)}
    assert out[(1, 2)][0] == py_lev(base, variant) == 3
    assert out[(1, 4)] == (0, 1.0)
    assert out[(1, 2)][1] == 1.0 - 3 / max(len(base), len(variant))
    # a pair NOT in candidates is never scored, however similar
    assert (2, 4) not in out and (4, 2) not in out
    # boundary: min_sim exactly at the pair's sim keeps it (>=)
    sim12 = out[(1, 2)][1]
    kept = edit_distance_pairs(docs, cand, min_sim=sim12).collect()
    assert (1, 2) in {(r.id_a, r.id_b) for r in kept}


def test_keep_first_fused_matches_window_form(spark):
    # keep_first_fused must pick the SAME winner per key per policy as
    # the two-window form it replaces (rel_dedup_policies, r14): ties on
    # the leading sort key must fall through the full tiebreaker chain.
    from sec_financial_pipeline_spark.operators import dedup

    rows = [
        # key 1: |price| tie (+8 vs -8) -> argmax_abs falls to ln ASC;
        # lww picks max ln.
        (1, 2, 10, 20, 8.0),
        (1, 1, 11, 21, -8.0),
        # key 2: ln tie -> lww falls to pk DESC; argmax_abs by |price|.
        (2, 3, 30, 40, 1.0),
        (2, 3, 31, 41, -2.0),
        # key 3: single row.
        (3, 7, 70, 80, 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey int, l_linenumber int, l_partkey long, "
        "l_suppkey long, l_extendedprice double",
    )
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_extendedprice"]
    am = dedup.argmax_abs(
        df, ["l_orderkey"], "l_extendedprice",
        tiebreakers=["l_linenumber", "l_partkey", "l_suppkey"],
    ).select(F.lit("argmax_abs").alias("policy"), *cols)
    lw = dedup.last_write_wins(
        df, ["l_orderkey"], "l_linenumber",
        tiebreakers=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).select(F.lit("last_write_wins").alias("policy"), *cols)
    expected = sorted(map(tuple, am.unionByName(lw).collect()))

    for n_part in (1, 5):
        fused = dedup.keep_first_fused(
            df.repartition(n_part),
            ["l_orderkey"],
            [
                ("argmax_abs",
                 [F.abs(F.col("l_extendedprice")), -F.col("l_linenumber"),
                  -F.col("l_partkey"), -F.col("l_suppkey")]),
                ("last_write_wins",
                 [F.col("l_linenumber"), F.col("l_partkey"),
                  F.col("l_suppkey"), F.col("l_extendedprice")]),
            ],
            cols,
        )
        assert fused.columns == ["policy"] + cols
        assert sorted(map(tuple, fused.collect())) == expected
