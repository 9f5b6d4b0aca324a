"""Incremental-pipeline operators (SURVEY §2.7 T1/T2/T4) as oracle-checked
queries: change detection, merge-upsert, freshness + staleness policy.

The "stored" table is the derived facts; the "batch" is the same
derivation with a deterministic perturbation (amended values for a
subset of keys, plus rows only present in later years) — so the
anti-join / merge semantics are observable and exactly reproducible in
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.functions.deterministic import dsum_sql
from sec_financial_pipeline_spark.plans import domain
from sec_financial_pipeline_spark.registry.core import register
from sec_financial_pipeline_spark.streaming import incremental

_KEY = ("ticker", "tag", "unit", "fiscal_year", "fiscal_period", "end_date", "instant_date", "fact_id")
_VALUE = ("value", "form")

#: The perturbed re-fetch batch: facts for fiscal_year >= 1999 where 10%
#: of rows (fact_id % 10 = 4) carry a restated value.
_BATCH_SQL_SUFFIX = """
SELECT ticker, tag, unit, fiscal_year, fiscal_period, end_date, instant_date,
       fact_id,
       CASE WHEN fact_id % 10 = 4 THEN value * 1.01 ELSE value END AS value,
       form
FROM facts
WHERE fiscal_year >= 1999
"""

_STORED_COLS = "ticker, tag, unit, fiscal_year, fiscal_period, end_date, instant_date, fact_id, value, form"


def _stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain.facts_df(spark, sf_dir).select(*(_KEY + _VALUE)).select(
        "ticker", "tag", "unit", "fiscal_year", "fiscal_period",
        "end_date", "instant_date", "fact_id", "value", "form",
    )


def _batch_from(stored: DataFrame) -> DataFrame:
    return stored.filter(F.col("fiscal_year") >= 1999).withColumn(
        "value",
        F.when(F.col("fact_id") % 10 == 4, F.col("value") * 1.01).otherwise(
            F.col("value")
        ),
    )


def _batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _batch_from(_stored(spark, sf_dir))


@register(
    "pipe_incremental",
    domain.duck_prelude(
        f"stored AS (SELECT {_STORED_COLS} FROM facts)",
        f"batch AS ({_BATCH_SQL_SUFFIX})",
    )
    + f"""
SELECT 'changed' AS action, {', '.join('b.' + c for c in (_KEY + _VALUE))} FROM (
  SELECT *, md5(concat_ws(chr(31),
      CAST(ticker AS STRING), CAST(tag AS STRING), CAST(unit AS STRING),
      CAST(fiscal_year AS STRING), CAST(fiscal_period AS STRING),
      CAST(end_date AS STRING), CAST(instant_date AS STRING),
      CAST(fact_id AS STRING), CAST(value AS STRING), CAST(form AS STRING))) AS h
  FROM batch) b
WHERE b.h NOT IN (
  SELECT DISTINCT md5(concat_ws(chr(31),
      CAST(ticker AS STRING), CAST(tag AS STRING), CAST(unit AS STRING),
      CAST(fiscal_year AS STRING), CAST(fiscal_period AS STRING),
      CAST(end_date AS STRING), CAST(instant_date AS STRING),
      CAST(fact_id AS STRING), CAST(value AS STRING), CAST(form AS STRING)))
  FROM stored)
UNION ALL
SELECT 'merged' AS action, {_STORED_COLS} FROM stored
WHERE fact_id NOT IN (SELECT fact_id FROM batch)
UNION ALL
SELECT 'merged' AS action, {_STORED_COLS} FROM batch
""",
    survey="T2 T4 (md5 content-hash change detection via anti-join; merge-upsert replacing matched keys)",
)
def q_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deliberately NOT materialized: the stored table feeds four subtrees
    # (hash side, merge kept/keys, batch perturbation), but the derivation
    # is a codegen'd projection off one parquet scan — measured at sf0.1:
    # recompute 8.5s end-to-end vs persist() 12-15s vs localCheckpoint
    # 22s+. Caching 1.6M wide rows costs more than re-deriving them; the
    # sf-scaling story is the same (derivation is scan-bound, cache is
    # memory-bandwidth-bound on wider-than-input rows).
    stored = _stored(spark, sf_dir)
    batch = _batch_from(stored)
    changed = incremental.detect_changes(
        stored, batch, key_cols=_KEY, value_cols=_VALUE
    ).select(F.lit("changed").alias("action"), *(_KEY + _VALUE))
    # fact_id alone is the row identity in the derived model; the full
    # FACT_KEY composite is exercised by the change-detection branch.
    merged = incremental.merge_upsert(stored, batch, key_cols=("fact_id",)).select(
        F.lit("merged").alias("action"), *(_KEY + _VALUE)
    )
    return changed.unionByName(merged)


# ---------------------------------------------------------------------------
# snap_cdf: the snapshot-manifest table's change feed, driver-checked.
# The query drives the REAL lifecycle — create / append / delete_where /
# table_changes — on a build-once table derived from `orders`, then
# aggregates the feed; the oracle reproduces the multiset algebra in
# pure SQL. v1 = orders with o_orderkey % 7 != 0; v2 appends the rest;
# v3 deletes o_totalprice > 150000 (a rewrite). changes(1 -> 3):
#   inserts = rows(v3) - rows(v1) = {%7 == 0 AND price <= 150000}
#   deletes = rows(v1) - rows(v3) = {%7 != 0 AND price >  150000}
# ---------------------------------------------------------------------------

_SNAP_CDF_ORACLE = f"""
SELECT 'insert' AS change_type, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders WHERE o_orderkey % 7 = 0 AND o_totalprice <= 150000
GROUP BY o_orderpriority
UNION ALL
SELECT 'delete' AS change_type, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders WHERE o_orderkey % 7 <> 0 AND o_totalprice > 150000
GROUP BY o_orderpriority
"""

# changes(3 -> 5): v4 is a DELETION-VECTOR delete (no file rewritten;
# the commit attaches a (file, row position) sidecar), v5 is
# purge_deletes (row-preserving materialization — contributes NOTHING
# to the feed). The net feed is therefore exactly the dv-deleted rows:
# live-at-v3 rows (price <= 150000) with o_orderkey % 11 = 0. The
# oracle replaying that in pure SQL proves dv-delete visibility,
# (path, dv)-keyed diffing AND purge neutrality in one section.
_SNAP_DV_ORACLE = f"""
SELECT 'delete' AS change_type, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders WHERE o_totalprice <= 150000 AND o_orderkey % 11 = 0
GROUP BY o_orderpriority
"""


def _ensure_snap_demo(spark: SparkSession, sf_dir: str) -> str:
    """Build-once snaptable with the three-version history above,
    published atomically (manifest paths are table-relative, so the
    final directory rename is safe); keyed by sf_dir + orders mtime."""
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path(
        "sfp_snapdemo_", sf_dir, "orders", "mod7;del150000;dv11;purge"
    )
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            )
            T.create(orders.filter(F.col("o_orderkey") % 7 != 0), tmp)
            T.append(orders.filter(F.col("o_orderkey") % 7 == 0), tmp)
            T.delete_where(spark, tmp, "o_totalprice > 150000")
            # v4: merge-on-read — a sidecar commit, zero files rewritten
            T.delete_where(spark, tmp, "o_orderkey % 11 = 0", mode="dv")
            # v5: materialize the DVs (row-preserving, CDF-invisible)
            T.purge_deletes(spark, tmp)

        _publish_atomically(build, path)
    return path


def _cdf_rollup(spark: SparkSession, sf_dir: str, lo: int, hi: int) -> DataFrame:
    from sec_financial_pipeline_spark.functions.deterministic import dsum
    from sec_financial_pipeline_spark.sources import snaptable as T

    path = _ensure_snap_demo(spark, sf_dir)
    ch = T.table_changes(spark, path, lo, hi)
    return ch.groupBy(
        F.col("_change_type").alias("change_type"), "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("total_price"),
    )


def q_snap_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cdf_rollup(spark, sf_dir, 1, 3)


def _ensure_snap_dv_demo(spark: SparkSession, sf_dir: str) -> str:
    """Build-once snaptable whose HEAD carries live deletion vectors
    (unlike the purged snap demo): orders in 16 range-clustered files,
    dv-delete of o_orderkey % 13 = 0 — the merge-on-read read path a
    bench row keeps regression-visible."""
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path("sfp_snapdv_", sf_dir, "orders", "dv13;16files")
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            )
            T.create(orders.repartitionByRange(16, "o_orderkey"), tmp)
            T.delete_where(spark, tmp, "o_orderkey % 13 = 0", mode="dv")

        _publish_atomically(build, path)
    return path


def q_snap_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench constituent (not a registry row — the window is full at
    50): read a DV-carrying table (per-file sidecar anti-join inside
    the scan) and aggregate — the merge-on-read tax, measured."""
    from sec_financial_pipeline_spark.functions.deterministic import dsum
    from sec_financial_pipeline_spark.sources import snaptable as T

    path = _ensure_snap_dv_demo(spark, sf_dir)
    return T.read(spark, path).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("total_price"),
    )


def q_snap_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cdf_rollup(spark, sf_dir, 3, 5)


# ---------------------------------------------------------------------------
# matview: incrementally-maintained materialized aggregate view — the
# FILTERED form (VERDICT r9 item 4: the reference's cached responses
# are filtered aggregates, data_service.py:112-186). The view carries a
# WHERE on its definition (o_orderkey % 7 != 0) and two per-aggregate
# FILTER clauses (count/sum over o_totalprice > 150000). v1 of the
# source = orders with o_orderkey % 3 != 0; the view is created THERE
# (cursor = v1), then the source gains the remaining rows (v2 append)
# and loses o_orderkey % 5 = 0 (v3 delete) — ONE refresh folds both
# commits through the change feed by delta arithmetic (never
# rescanning the source). The oracle recomputes the same filtered
# aggregate over the source's FINAL state in pure SQL: equality proves
# the incremental fold is exact under both filter forms, including the
# decimal-sum firewall (incremental addition == recompute, bit-exact)
# and the NULL contract (a group with no filter-passing rows reads
# NULL for the filtered sum, 0 for the filtered count).
# ---------------------------------------------------------------------------

_MATVIEW_ORACLE = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price,
       CAST(count(CASE WHEN o_totalprice > 150000 THEN 1 END) AS BIGINT)
         AS n_hi,
       {dsum_sql('CASE WHEN o_totalprice > 150000 THEN o_totalprice END')}
         AS hi_price
FROM orders WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
GROUP BY o_orderpriority
"""


def _ensure_matview_demo(spark: SparkSession, sf_dir: str) -> str:
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import matview as MV
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path(
        "sfp_mvdemo_", sf_dir, "orders", "mod3;del5;where7;hi150k;onerefresh"
    )
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            src, view = f"{tmp}/src", f"{tmp}/view"
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            )
            T.create(orders.filter(F.col("o_orderkey") % 3 != 0), src)
            MV.create_matview(
                spark, src, view, ["o_orderpriority"],
                [
                    ("count", None, "n_rows"),
                    ("sum", "o_totalprice", "total_price"),
                    ("count", None, "n_hi", "o_totalprice > 150000"),
                    ("sum", "o_totalprice", "hi_price",
                     "o_totalprice > 150000"),
                ],
                where="o_orderkey % 7 != 0",
            )
            T.append(orders.filter(F.col("o_orderkey") % 3 == 0), src)
            T.delete_where(spark, src, "o_orderkey % 5 = 0")
            MV.refresh_matview(spark, view)

        _publish_atomically(build, path)
    return path


def q_snap_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.sources import matview as MV

    path = _ensure_matview_demo(spark, sf_dir)
    return MV.read_matview(spark, f"{path}/view")


# ---------------------------------------------------------------------------
# matview over a JOIN (r12, VERDICT r11 item 8 — the sec_ratios
# fact⨝broadcast-dim shape): the view groups the orders FACT by the
# customer DIM's c_mktsegment through a join PINNED at the dim's
# create-time version. Lifecycle: view created at fact v1 (orders with
# o_orderkey % 3 != 0); then the DIM gains a decoy row (custkey
# 999999999, segment 'PIN-LEAK') — which the pinned refresh must NOT
# see; the fact gains the remaining orders (v2), plus two synthetic
# rows referencing the decoy custkey (v3 — under the pinned dim they
# join to nothing; a refresh that wrongly read the dim HEAD would
# materialize a 'PIN-LEAK' group the oracle lacks), then loses
# o_orderkey % 5 = 0 (v4); ONE refresh folds all three commits. NOTE:
# because the aggregate set includes a min, the ENTIRE refresh routes
# through the holistic touched-group recompute (matview.py routes any
# min/max view that way) — the algebraic __sign delta path is
# exercised by the min-free join fuzz variants in
# tests/test_matview_fuzz.py, not by this demo.
# The oracle recomputes the joined filtered aggregate from scratch over
# the REAL tables — the synthetic fk rows drop out of its join too, so
# equality proves the fold is exact AND the pin held.
# ---------------------------------------------------------------------------

_MATVIEW_JOIN_ORACLE = f"""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price,
       min(o_totalprice) AS min_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
GROUP BY c_mktsegment
"""


def _ensure_matview_join_demo(spark: SparkSession, sf_dir: str) -> str:
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import matview as MV
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path(
        "sfp_mvjdemo_", sf_dir, "orders",
        "join;mod3;del5;where7;minagg;pin1",
    )
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            dim, src, view = f"{tmp}/dim", f"{tmp}/src", f"{tmp}/view"
            T.create(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_mktsegment"
                ),
                dim,
            )
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
            T.create(orders.filter(F.col("o_orderkey") % 3 != 0), src)
            MV.create_matview(
                spark, src, view, ["c_mktsegment"],
                [
                    ("count", None, "n_rows"),
                    ("sum", "o_totalprice", "total_price"),
                    ("min", "o_totalprice", "min_price"),
                ],
                where="o_orderkey % 7 != 0",
                join={"dim": dim, "key": "o_custkey",
                      "dim_key": "c_custkey", "dim_cols": ["c_mktsegment"]},
            )
            # dim moves AFTER the pin...
            T.append(
                spark.createDataFrame(
                    [(999999999, "PIN-LEAK")],
                    "c_custkey bigint, c_mktsegment string",
                ),
                dim,
            )
            T.append(orders.filter(F.col("o_orderkey") % 3 == 0), src)
            # ...and these fact rows reference the post-pin dim row:
            # keys chosen to survive both %5 and %7 filters, so ONLY
            # the pinned join can (and must) drop them
            T.append(
                spark.createDataFrame(
                    [(10**12 + 1, 999999999, 123.45),
                     (10**12 + 2, 999999999, 67.89)],
                    "o_orderkey bigint, o_custkey bigint, "
                    "o_totalprice double",
                ),
                src,
            )
            T.delete_where(spark, src, "o_orderkey % 5 = 0")
            MV.refresh_matview(spark, view)

        _publish_atomically(build, path)
    return path


def q_snap_matview_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.sources import matview as MV

    path = _ensure_matview_join_demo(spark, sf_dir)
    return MV.read_matview(spark, f"{path}/view")


# ---------------------------------------------------------------------------
# FOLLOW-mode join matview (r12 — full IVM): the dim is tracked
# incrementally, so dim updates/deletes fold through the refresh
# rather than requiring a repin. Lifecycle: follow view created at
# (fact v1 = orders %3!=0, dim v1 = customer); then the DIM moves —
# v2 re-segments customers with c_custkey % 10 = 3 to 'SEG-MOVED'
# (merge_upsert = per-row update), v3 deletes customers with
# c_custkey % 13 = 7 — and the FACT moves — v2 appends the remaining
# orders, v3 deletes o_orderkey % 5 = 0. ONE refresh folds all four
# commits through the trilinear signed delta (ΔF⋈D_old + F_old⋈ΔD +
# ΔF⋈ΔD). The oracle recomputes the joined aggregate over the FINAL
# states of both tables in pure SQL; equality proves dim-side IVM is
# exact through updates (group movement: +/- in different groups),
# deletes (facts exiting the view), and the cross term, including the
# decimal-sum firewall and the holistic min through the join.
# ---------------------------------------------------------------------------

_MATVIEW_FOLLOW_ORACLE = f"""
SELECT CASE WHEN c_custkey % 10 = 3 THEN 'SEG-MOVED'
       ELSE c_mktsegment END AS c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price,
       min(o_totalprice) AS min_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
  AND c_custkey % 13 <> 7
GROUP BY 1
"""


def _ensure_matview_follow_demo(spark: SparkSession, sf_dir: str) -> str:
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import matview as MV
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path(
        "sfp_mvfdemo_", sf_dir, "orders",
        "follow;mod3;del5;where7;dimupd10-3;dimdel13-7;minagg",
    )
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            dim, src, view = f"{tmp}/dim", f"{tmp}/src", f"{tmp}/view"
            cust = load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            )
            T.create(cust, dim)
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
            T.create(orders.filter(F.col("o_orderkey") % 3 != 0), src)
            MV.create_matview(
                spark, src, view, ["c_mktsegment"],
                [
                    ("count", None, "n_rows"),
                    ("sum", "o_totalprice", "total_price"),
                    ("min", "o_totalprice", "min_price"),
                ],
                where="o_orderkey % 7 != 0",
                join={"dim": dim, "key": "o_custkey",
                      "dim_key": "c_custkey", "dim_cols": ["c_mktsegment"],
                      "mode": "follow"},
            )
            # dim moves: re-segment + delete
            T.merge_upsert(
                cust.filter(F.col("c_custkey") % 10 == 3).select(
                    "c_custkey", F.lit("SEG-MOVED").alias("c_mktsegment")
                ),
                dim,
                key_cols=["c_custkey"],
            )
            T.delete_where(spark, dim, "c_custkey % 13 = 7")
            # fact moves: append + delete
            T.append(orders.filter(F.col("o_orderkey") % 3 == 0), src)
            T.delete_where(spark, src, "o_orderkey % 5 = 0")
            MV.refresh_matview(spark, view)

        _publish_atomically(build, path)
    return path


def q_snap_matview_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.sources import matview as MV

    path = _ensure_matview_follow_demo(spark, sf_dir)
    return MV.read_matview(spark, f"{path}/view")


# ---------------------------------------------------------------------------
# LEFT follow-mode matview (r13): full IVM over a LEFT join — the
# outer delta terms in action, driver-visibly. Same two-sided lifecycle
# as the follow demo (dim re-segments %10=3, dim DELETES %13=7, fact
# appends + deletes), but with LEFT semantics and algebraic-only aggs:
# the dim deletion flips its orders into the NULL-segment group (the
# per-key count-flip term), the dim update moves groups, and ONE
# refresh folds everything through _algebraic_delta's signed feed —
# inner trilinear + dF▷D_new + flip terms. The oracle left-joins the
# FINAL states (deleted customers absent -> NULL segment) from scratch.
# ---------------------------------------------------------------------------

_MATVIEW_LFOLLOW_ORACLE = f"""
SELECT CASE WHEN c_custkey % 10 = 3 THEN 'SEG-MOVED'
       ELSE c_mktsegment END AS c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders LEFT JOIN (
  SELECT * FROM customer WHERE c_custkey % 13 <> 7
) c ON o_custkey = c_custkey
WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
GROUP BY 1
"""


def _ensure_matview_lfollow_demo(spark: SparkSession, sf_dir: str) -> str:
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import matview as MV
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path(
        "sfp_mvlfdemo_", sf_dir, "orders",
        "lfollow;mod3;del5;where7;dimupd10-3;dimdel13-7;alg",
    )
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            dim, src, view = f"{tmp}/dim", f"{tmp}/src", f"{tmp}/view"
            cust = load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            )
            T.create(cust, dim)
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
            T.create(orders.filter(F.col("o_orderkey") % 3 != 0), src)
            MV.create_matview(
                spark, src, view, ["c_mktsegment"],
                [
                    ("count", None, "n_rows"),
                    ("sum", "o_totalprice", "total_price"),
                ],
                where="o_orderkey % 7 != 0",
                join={"dim": dim, "key": "o_custkey",
                      "dim_key": "c_custkey", "dim_cols": ["c_mktsegment"],
                      "mode": "follow", "how": "left"},
            )
            T.merge_upsert(
                cust.filter(F.col("c_custkey") % 10 == 3).select(
                    "c_custkey", F.lit("SEG-MOVED").alias("c_mktsegment")
                ),
                dim,
                key_cols=["c_custkey"],
            )
            # the LEFT-specific event: these customers' orders flip
            # into the NULL-segment group instead of leaving the view
            T.delete_where(spark, dim, "c_custkey % 13 = 7")
            T.append(orders.filter(F.col("o_orderkey") % 3 == 0), src)
            T.delete_where(spark, src, "o_orderkey % 5 = 0")
            MV.refresh_matview(spark, view)

        _publish_atomically(build, path)
    return path


def q_snap_matview_lfollow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.sources import matview as MV

    path = _ensure_matview_lfollow_demo(spark, sf_dir)
    return MV.read_matview(spark, f"{path}/view")


# ---------------------------------------------------------------------------
# Follow-mode SNOWFLAKE chain matview (r13): orders⋈customer⋈nation
# with EVERY side incrementally maintained — the multilinear signed
# delta (7 terms for two dims, signs multiplying across chosen deltas).
# Lifecycle: create at (fact v1 = orders %3!=0, customer v1, nation
# v1); customer moves (re-route %10=3 to the next nationkey, DELETE
# %13=7), nation moves (rename key 5, DELETE %9=2), the fact moves
# (append the rest, delete %5=0) — ONE refresh folds all seven commits.
# The oracle recomputes the two-hop join over the FINAL states of all
# three tables in pure SQL.
# ---------------------------------------------------------------------------

_MATVIEW_CFOLLOW_ORACLE = f"""
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
JOIN (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 3 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS c_nationkey
  FROM customer WHERE c_custkey % 13 <> 7
) c ON o_custkey = c_custkey
JOIN (
  SELECT n_nationkey,
         CASE WHEN n_nationkey = 5 THEN 'N-RENAMED' ELSE n_name END AS n_name
  FROM nation WHERE n_nationkey % 9 <> 2
) n ON c_nationkey = n_nationkey
WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
GROUP BY n_name
"""


def _ensure_matview_cfollow_demo(spark: SparkSession, sf_dir: str) -> str:
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import matview as MV
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path(
        "sfp_mvcfdemo_", sf_dir, "orders",
        "cfollow;mod3;del5;where7;c10-3;cdel13-7;n5ren;ndel9-2",
    )
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            d1, d2 = f"{tmp}/dim_cust", f"{tmp}/dim_nation"
            src, view = f"{tmp}/src", f"{tmp}/view"
            cust = load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_nationkey"
            )
            T.create(cust, d1)
            nat = load_table(spark, sf_dir, "nation").select(
                "n_nationkey", "n_name"
            )
            T.create(nat, d2)
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
            T.create(orders.filter(F.col("o_orderkey") % 3 != 0), src)
            MV.create_matview(
                spark, src, view, ["n_name"],
                [
                    ("count", None, "n_rows"),
                    ("sum", "o_totalprice", "total_price"),
                ],
                where="o_orderkey % 7 != 0",
                join=[
                    {"dim": d1, "key": "o_custkey",
                     "dim_key": "c_custkey", "dim_cols": ["c_nationkey"],
                     "mode": "follow"},
                    {"dim": d2, "key": "c_nationkey",
                     "dim_key": "n_nationkey", "dim_cols": ["n_name"],
                     "mode": "follow"},
                ],
            )
            # customer (hop 1) moves: re-route + delete
            T.merge_upsert(
                cust.filter(F.col("c_custkey") % 10 == 3).select(
                    "c_custkey",
                    ((F.col("c_nationkey") + 1) % 25).alias("c_nationkey"),
                ),
                d1,
                key_cols=["c_custkey"],
            )
            T.delete_where(spark, d1, "c_custkey % 13 = 7")
            # nation (hop 2) moves: rename + delete
            T.merge_upsert(
                spark.createDataFrame(
                    [(5, "N-RENAMED")], "n_nationkey bigint, n_name string"
                ).select(
                    F.col("n_nationkey").cast(
                        dict(nat.dtypes)["n_nationkey"]
                    ).alias("n_nationkey"),
                    "n_name",
                ),
                d2,
                key_cols=["n_nationkey"],
            )
            T.delete_where(spark, d2, "n_nationkey % 9 = 2")
            # fact moves: append + delete
            T.append(orders.filter(F.col("o_orderkey") % 3 == 0), src)
            T.delete_where(spark, src, "o_orderkey % 5 = 0")
            MV.refresh_matview(spark, view)

        _publish_atomically(build, path)
    return path


def q_snap_matview_cfollow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.sources import matview as MV

    path = _ensure_matview_cfollow_demo(spark, sf_dir)
    return MV.read_matview(spark, f"{path}/view")


# ---------------------------------------------------------------------------
# SNOWFLAKE + LEFT-JOIN matview (r13 — VERDICT r12 item 3): the view
# chains TWO pinned dims (orders ⟕ customer ⟕ nation — the second join
# keys on c_nationkey, a column the FIRST dim introduced) with LEFT
# semantics: two synthetic fact rows reference custkeys absent from the
# customer dim and must SURVIVE as the NULL n_name group (an inner-join
# view would drop them — the r12 pin demo proved exactly that).
# Lifecycle: create at fact v1 (orders %3!=0), append the rest + the
# two orphan rows (v2/v3), delete %5=0 (v4); ONE refresh folds all
# three commits through the ALGEBRAIC branch (count/sum only — no
# min routes it holistic), i.e. the _change_type delta fold through a
# two-dim left chain. The oracle replays the same left joins over the
# final fact state (orders ∪ synthetic orphans, minus deletes) in pure
# SQL, NULL group included.
# ---------------------------------------------------------------------------

_MATVIEW_SNOW_ORACLE = f"""
WITH fact AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  UNION ALL
  SELECT * FROM (VALUES
    (999999991, 999999995, CAST(111.11 AS DOUBLE)),
    (999999992, 999999996, CAST(222.22 AS DOUBLE))
  ) AS t(o_orderkey, o_custkey, o_totalprice)
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price
FROM fact
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
GROUP BY n_name
"""


def _ensure_matview_snow_demo(spark: SparkSession, sf_dir: str) -> str:
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import matview as MV
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path(
        "sfp_mvsdemo_", sf_dir, "orders",
        "snow;left2;mod3;del5;where7;orphan2",
    )
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            d1, d2 = f"{tmp}/dim_cust", f"{tmp}/dim_nation"
            src, view = f"{tmp}/src", f"{tmp}/view"
            T.create(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                ),
                d1,
            )
            T.create(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_name"
                ),
                d2,
            )
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
            T.create(orders.filter(F.col("o_orderkey") % 3 != 0), src)
            MV.create_matview(
                spark, src, view, ["n_name"],
                [
                    ("count", None, "n_rows"),
                    ("sum", "o_totalprice", "total_price"),
                ],
                where="o_orderkey % 7 != 0",
                join=[
                    {"dim": d1, "key": "o_custkey",
                     "dim_key": "c_custkey", "dim_cols": ["c_nationkey"],
                     "how": "left"},
                    {"dim": d2, "key": "c_nationkey",
                     "dim_key": "n_nationkey", "dim_cols": ["n_name"],
                     "how": "left"},
                ],
            )
            T.append(orders.filter(F.col("o_orderkey") % 3 == 0), src)
            # orphan fact rows: custkeys with NO customer row — the
            # left chain must keep them in the NULL n_name group
            # (keys survive the %5 and %7 filters by construction)
            T.append(
                spark.createDataFrame(
                    [(999999991, 999999995, 111.11),
                     (999999992, 999999996, 222.22)],
                    "o_orderkey bigint, o_custkey bigint, "
                    "o_totalprice double",
                ),
                src,
            )
            T.delete_where(spark, src, "o_orderkey % 5 = 0")
            MV.refresh_matview(spark, view)

        _publish_atomically(build, path)
    return path


def q_snap_matview_snow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.sources import matview as MV

    path = _ensure_matview_snow_demo(spark, sf_dir)
    return MV.read_matview(spark, f"{path}/view")


#: bench-local matview state per sf_dir (NOT the shared artifact cache:
#: this row MUTATES its table every call, which would poison a shared
#: immutable artifact — each bench process gets its own mkdtemp copy).
_MVBENCH: dict = {}


def q_matview_refresh_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only constituent (never registered): ONE incremental
    refresh cycle — append a fixed ~5% delta batch of orders to the
    source snaptable, fold it into the grouped-aggregate view through
    the change feed, return the refreshed view. Per-call work is
    constant (the feed reads only the new commit; the merge rewrites
    only the view files the touched groups hit), so the row is
    comparable across reps and rounds — the regression-visible form of
    PERF.md's O(delta)-refresh claim (VERDICT r9 item 4). The first
    call (bench warm-up, untimed) pays the full initial build."""
    from sec_financial_pipeline_spark.sources import matview as MV
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    base = _MVBENCH.get(sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    if base is None:
        import tempfile

        base = tempfile.mkdtemp(prefix="sfp_mvbench_")
        T.create(orders, f"{base}/src")
        MV.create_matview(
            spark, f"{base}/src", f"{base}/view", ["o_orderpriority"],
            [
                ("count", None, "n_rows"),
                ("sum", "o_totalprice", "total_price"),
            ],
        )
        _MVBENCH[sf_dir] = base
    T.append(orders.filter(F.col("o_orderkey") % 20 == 3), f"{base}/src")
    MV.refresh_matview(spark, f"{base}/view")
    return MV.read_matview(spark, f"{base}/view")


# ---------------------------------------------------------------------------
# colmap: the column-mapping schema lifecycle, driver-checked. v1 =
# orders columns (o_orderkey, o_orderpriority, price0=o_totalprice) for
# o_orderkey % 4 != 0; RENAME price0 -> total_price (metadata-only —
# v1's files keep the physical name); dv-delete total_price > 180000
# (probing the RENAMED column against pre-rename files); append the
# %4 == 0 rows under the NEW name. The head read mixes both file
# generations; the oracle recomputes the final state in pure SQL.
# ---------------------------------------------------------------------------

_COLMAP_ORACLE = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
WHERE o_orderkey % 4 = 0 OR o_totalprice <= 180000
GROUP BY o_orderpriority
"""


def _ensure_colmap_demo(spark: SparkSession, sf_dir: str) -> str:
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path(
        "sfp_colmapdemo_", sf_dir, "orders", "mod4;rename;dvdel180000"
    )
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey",
                "o_orderpriority",
                F.col("o_totalprice").alias("price0"),
            )
            T.create(orders.filter(F.col("o_orderkey") % 4 != 0), tmp)
            T.rename_column(spark, tmp, "price0", "total_price")
            # dv-delete probes the RENAMED name against v1's physical
            # files — only pre-rename rows can match (> 180000 appended
            # rows arrive after), proving the delete's read path maps
            T.delete_where(spark, tmp, "total_price > 180000", mode="dv")
            T.append(
                orders.filter(F.col("o_orderkey") % 4 == 0)
                .withColumnRenamed("price0", "total_price"),
                tmp,
            )

        _publish_atomically(build, path)
    return path


def q_snap_colmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.functions.deterministic import dsum
    from sec_financial_pipeline_spark.sources import snaptable as T

    path = _ensure_colmap_demo(spark, sf_dir)
    return T.read(spark, path).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("total_price").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# joinchain: the multi-way statistics-driven join planner, driver-
# checked end-to-end (VERDICT r9 item 6). Three snaptables (customer/
# nation/region with shared key names), ANALYZEd so HLL NDVs feed the
# System-R estimates; join_chain picks the order (the tiny nation-
# region edge seeds, customer attaches broadcast) and the aggregate
# over the joined chain must equal the plain 3-way SQL join.
# ---------------------------------------------------------------------------

_JOINCHAIN_ORACLE = f"""
SELECT r_name,
       CAST(count(*) AS BIGINT) AS n_cust,
       {dsum_sql('c_acctbal')} AS acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def _ensure_joinchain_demo(spark: SparkSession, sf_dir: str) -> str:
    import os

    from sec_financial_pipeline_spark.registry.similarity import (
        _artifact_path,
        _publish_atomically,
    )
    from sec_financial_pipeline_spark.sources import snaptable as T
    from sec_financial_pipeline_spark.sources.testdata import load_table

    path = _artifact_path(
        "sfp_jchain_", sf_dir, "customer", "cust-nat-reg;analyzed"
    )
    if not os.path.exists(path):
        def build(tmp: str) -> None:
            cust = load_table(spark, sf_dir, "customer").select(
                "c_custkey",
                F.col("c_nationkey").alias("nationkey"),
                "c_acctbal",
            )
            nat = load_table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("nationkey"),
                F.col("n_regionkey").alias("regionkey"),
                "n_name",
            )
            reg = load_table(spark, sf_dir, "region").select(
                F.col("r_regionkey").alias("regionkey"), "r_name"
            )
            for name, df, cols in (
                ("cust", cust, ["nationkey"]),
                ("nat", nat, ["nationkey", "regionkey"]),
                ("reg", reg, ["regionkey"]),
            ):
                T.create(df, f"{tmp}/{name}")
                T.analyze_table(spark, f"{tmp}/{name}", cols=cols)

        _publish_atomically(build, path)
    return path


def q_joinchain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sec_financial_pipeline_spark.functions.deterministic import dsum
    from sec_financial_pipeline_spark.sources import snaptable as T

    path = _ensure_joinchain_demo(spark, sf_dir)
    tables = {
        "cust": f"{path}/cust", "nat": f"{path}/nat", "reg": f"{path}/reg"
    }
    edges = [("cust", "nat", "nationkey"), ("nat", "reg", "regionkey")]
    joined = T.join_chain(spark, tables, edges)
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum("c_acctbal").alias("acctbal"),
    )


_POLICY_ORACLE = (
    domain.duck_prelude()
    + """
SELECT cik,
       last_filing_date,
       n_facts,
       n_years,
       CASE WHEN datediff('day', last_filing_date, DATE '2002-01-15') < 30 THEN 1
            WHEN datediff('day', last_filing_date, DATE '2002-01-15') < 90 THEN 3
            ELSE 7 END AS check_interval_days,
       datediff('day', last_filing_date, DATE '2002-01-15') >=
       CASE WHEN datediff('day', last_filing_date, DATE '2002-01-15') < 30 THEN 1
            WHEN datediff('day', last_filing_date, DATE '2002-01-15') < 90 THEN 3
            ELSE 7 END AS needs_update
FROM (
  SELECT cik,
         max(coalesce(end_date, instant_date)) AS last_filing_date,
         count(*) AS n_facts,
         CAST(count(DISTINCT fiscal_year) AS BIGINT) AS n_years
  FROM facts
  GROUP BY cik
)
"""
)


def q_freshness_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = domain.facts_df(spark, sf_dir)
    fresh = incremental.freshness(facts, entity_col="cik")
    return incremental.staleness_policy(fresh, as_of="2002-01-15")


_PIPE_ROW_SCHEMA = [
    ("cik", "string"),
    ("last_filing_date", "date"),
    ("n_facts", "bigint"),
    ("n_years", "bigint"),
    ("check_interval_days", "int"),
    ("needs_update", "boolean"),
    ("change_type", "string"),
    ("o_orderpriority", "string"),
    ("n_rows", "bigint"),
    ("total_price", "double"),
    ("n_hi", "bigint"),
    ("hi_price", "double"),
    ("r_name", "string"),
    ("n_cust", "bigint"),
    ("acctbal", "double"),
    # matview_join section (r12)
    ("c_mktsegment", "string"),
    ("min_price", "double"),
    # matview_snow section (r13): snowflake + left-join group column
    ("n_name", "string"),
]

from sec_financial_pipeline_spark.registry.merge import (  # noqa: E402
    union_sections as _union_sections,
    union_sections_sql as _union_sections_sql,
)


@register(
    "pipe_freshness_policy",
    _union_sections_sql(
        [
            (
                "policy",
                _POLICY_ORACLE,
                ["cik", "last_filing_date", "n_facts", "n_years",
                 "check_interval_days", "needs_update"],
            ),
            (
                "snap_cdf",
                _SNAP_CDF_ORACLE,
                ["change_type", "o_orderpriority", "n_rows", "total_price"],
            ),
            (
                "snap_dv",
                _SNAP_DV_ORACLE,
                ["change_type", "o_orderpriority", "n_rows", "total_price"],
            ),
            (
                "matview",
                _MATVIEW_ORACLE,
                ["o_orderpriority", "n_rows", "total_price",
                 "n_hi", "hi_price"],
            ),
            (
                "matview_join",
                _MATVIEW_JOIN_ORACLE,
                ["c_mktsegment", "n_rows", "total_price", "min_price"],
            ),
            (
                "matview_follow",
                _MATVIEW_FOLLOW_ORACLE,
                ["c_mktsegment", "n_rows", "total_price", "min_price"],
            ),
            (
                "matview_lfollow",
                _MATVIEW_LFOLLOW_ORACLE,
                ["c_mktsegment", "n_rows", "total_price"],
            ),
            (
                "matview_cfollow",
                _MATVIEW_CFOLLOW_ORACLE,
                ["n_name", "n_rows", "total_price"],
            ),
            (
                "matview_snow",
                _MATVIEW_SNOW_ORACLE,
                ["n_name", "n_rows", "total_price"],
            ),
            (
                "colmap",
                _COLMAP_ORACLE,
                ["o_orderpriority", "n_rows", "total_price"],
            ),
            (
                "joinchain",
                _JOINCHAIN_ORACLE,
                ["r_name", "n_cust", "acctbal"],
            ),
        ],
        _PIPE_ROW_SCHEMA,
    ),
    survey=(
        "T1 (freshness watermark + tiered staleness policy) + snapshot-"
        "table change feed (create/append/delete/dv-delete/purge "
        "lifecycle on the real snaptable; table_changes(1,3) and (3,5) "
        "aggregated — the oracle replays the multiset algebra in pure "
        "SQL, the dv section proving deletion-vector visibility and "
        "purge neutrality) + incrementally-maintained FILTERED "
        "materialized view (WHERE on the view definition plus per-"
        "aggregate FILTER clauses; one refresh folds an append + a "
        "delete through the change feed by exact delta arithmetic; the "
        "oracle recomputes the filtered aggregate over the final source "
        "state from scratch) + matview over a fact⨝broadcast-dim JOIN "
        "(group by a dim column through a dim PINNED at create-time "
        "version; one refresh folds a fact append + synthetic rows "
        "referencing a post-pin dim row + a delete — the min agg "
        "routes the refresh through the holistic touched-group "
        "recompute through the join; the decoy group proves "
        "the pin) + FOLLOW-mode join matview (full IVM: dim segment "
        "updates and key deletes fold through the trilinear signed "
        "delta dF⋈D_old + F_old⋈dD + dF⋈dD in the same refresh as "
        "fact append/delete; oracle recomputes over both FINAL "
        "states) + LEFT follow-mode matview (outer-delta IVM: a dim "
        "key-deletion flips its facts into the NULL-segment group via "
        "the per-key count-flip term, folded algebraically in the "
        "same refresh as dim updates and fact append/delete) "
        "+ follow-mode SNOWFLAKE-chain matview (orders-customer-nation "
        "with EVERY side incrementally maintained: the multilinear "
        "signed delta, 7 terms for two dims, folds customer re-routes/"
        "deletes + nation renames/deletes + fact append/delete in ONE "
        "refresh; oracle recomputes the two-hop join over all three "
        "final states) "
        "+ SNOWFLAKE LEFT-join matview (two pinned dims "
        "chained — the second keys on a column the first introduced — "
        "with left semantics: orphan facts survive as the NULL-name "
        "group; one algebraic refresh folds append+orphans+delete) + "
        "column-mapping schema lifecycle (metadata-only RENAME, a "
        "dv-delete probing the renamed name against pre-rename files, "
        "a post-rename append — the head read mixes both file "
        "generations) + multi-way statistics-driven join chain "
        "(suggest_join_chain orders customer-nation-region smallest-"
        "intermediate-first from ANALYZE HLL NDVs and manifest sizes; "
        "the aggregated chain equals the plain 3-way SQL join)"
    ),
)
def q_freshness_and_snap_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _union_sections(
        [
            ("policy", q_freshness_policy(spark, sf_dir)),
            ("snap_cdf", q_snap_cdf(spark, sf_dir)),
            ("snap_dv", q_snap_dv(spark, sf_dir)),
            ("matview", q_snap_matview(spark, sf_dir)),
            ("matview_join", q_snap_matview_join(spark, sf_dir)),
            ("matview_follow", q_snap_matview_follow(spark, sf_dir)),
            ("matview_lfollow", q_snap_matview_lfollow(spark, sf_dir)),
            ("matview_cfollow", q_snap_matview_cfollow(spark, sf_dir)),
            ("matview_snow", q_snap_matview_snow(spark, sf_dir)),
            ("colmap", q_snap_colmap(spark, sf_dir)),
            ("joinchain", q_joinchain(spark, sf_dir)),
        ],
        _PIPE_ROW_SCHEMA,
    )
