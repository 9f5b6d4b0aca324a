"""Incrementally-maintained materialized aggregate views over snaptables.

The serving layer the reference keeps warm with response caches
(reference: app/cache.py — TTL'd whole-response memoization) has a
stronger distributed analog: a MATERIALIZED VIEW whose refresh cost is
O(rows changed since the last refresh), not O(source table). This
module maintains a grouped-aggregate snaptable on top of any source
snaptable using the table's own change feed:

- ``create_matview`` runs the aggregation once at the source's current
  version and records that version as an exactly-once transaction id
  (``txn=("matview", src_version)``) on the VIEW table itself — the
  cursor lives in the view's manifest, not a side-channel file, so a
  crashed refresh can never be double-applied (same discipline as the
  streaming sinks' epoch ids).
- ``refresh_matview`` reads ``table_changes(src, last, head)`` — the
  net multiset diff, O(changed rows) for append/DV commits — and folds
  it into the view with ONE atomic conditional ``merge_into``:
  a group whose row count reaches zero is DELETED, an existing group
  is UPDATED by pure delta arithmetic, a new group is INSERTED. At
  100 TB the refresh touches |delta| feed rows + the view files whose
  key ranges the changed groups hit (copy-on-write confinement) — the
  source table is never rescanned on the algebraic path.

Aggregate kinds:

- ``count`` / ``sum`` / ``avg`` are ALGEBRAIC: maintained by delta
  addition alone. Sums are stored as ``DECIMAL(30,6)`` (the repo-wide
  deterministic-sum firewall, ``functions/deterministic.py``): decimal
  addition is exact and order-independent, so the incrementally
  maintained value is BIT-IDENTICAL to a from-scratch recompute —
  double sums would drift by accumulation order. ``avg`` derives as
  exact-sum / non-null-count at read time. SQL null semantics hold
  exactly: each sum/avg carries a non-null counter so a group whose
  last non-null value is deleted reads NULL again, not 0.
- ``min`` / ``max`` are HOLISTIC (a delete can raise a min, which the
  delta alone cannot reveal): the refresh recomputes ONLY the groups
  the feed touched — one semi-join-confined scan of the source — and
  merges those rows in. Still O(touched groups' data), never O(table).

The stored view schema is ``group_cols + [__n BIGINT] + one column per
aggregate (+ __nn_<alias> BIGINT per sum/avg)``; ``read_matview``
projects the user-facing shape (sums/avgs as DOUBLE via one final
rounding, the dsum/davg contract).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.sources import snaptable as T

_SPEC_FILE = "matview.json"
_APP = "matview"
_DIMPIN_APP = "matview_dimpin"
_DEC = "decimal(30,6)"
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_ALGEBRAIC = ("count", "sum", "avg")
_HOLISTIC = ("min", "max")

#: follow-mode join views track ALL cursors (fact version + one per
#: dim) in one monotone txn epoch, base-_CURSOR_K positional:
#: epoch = ((fact * K) + dim1) * K + dim2 ... Monotone because every
#: version only grows, so the table's own txn-replay guard (recorded
#: epoch >= ours -> skip) keeps working unchanged. The epoch lives in
#: the manifest JSON (python arbitrary-precision ints), never in a
#: fixed-width column.
_CURSOR_K = 1_000_000_000


def _encode_cursor(fact_v: int, dim_vs: list[int]) -> int:
    out = fact_v
    for d in dim_vs:
        out = out * _CURSOR_K + d
    return out


def _decode_cursor(epoch: int, n_dims: int) -> tuple[int, list[int]]:
    dims = []
    for _ in range(n_dims):
        epoch, d = divmod(epoch, _CURSOR_K)
        dims.append(d)
    return epoch, list(reversed(dims))


def _join_list(spec: dict) -> list[dict]:
    """The view's dimension joins, normalized to a list: a single-join
    spec (every view created before r13, plus any current single-dim
    view) stores a dict under ``join``; snowflake views store a list."""
    j = spec.get("join")
    if not j:
        return []
    return list(j) if isinstance(j, list) else [j]


def _follow(spec: dict) -> bool:
    js = _join_list(spec)
    return bool(js) and js[0].get("mode") == "follow"


class MatviewError(RuntimeError):
    pass


def _validate_spec(group_cols, aggs) -> list[dict]:
    if not group_cols:
        raise MatviewError("matview: at least one group column required")
    norm = []
    seen = set(group_cols) | {"__n"}
    for a in aggs:
        if len(a) == 3:
            (kind, col, alias), filt = a, None
        elif len(a) == 4:
            kind, col, alias, filt = a
        else:
            raise MatviewError(
                "matview: each aggregate is (kind, col, alias[, filter])"
            )
        if kind not in _ALGEBRAIC + _HOLISTIC:
            raise MatviewError(f"matview: unknown aggregate kind {kind!r}")
        if kind != "count" and not col:
            raise MatviewError(f"matview: {kind} needs a column")
        if not _IDENT.match(alias) or alias in seen:
            raise MatviewError(
                f"matview: alias {alias!r} must be a fresh simple identifier"
            )
        for name in (col,) if col else ():
            if not _IDENT.match(name):
                raise MatviewError(
                    f"matview: column {name!r} must be a simple identifier"
                )
        seen.add(alias)
        norm.append(
            {"kind": kind, "col": col, "alias": alias, "filter": filt}
        )
    for g in group_cols:
        if not _IDENT.match(g):
            raise MatviewError(
                f"matview: group column {g!r} must be a simple identifier"
            )
    return norm


def _dimpin_entries(joins: list[dict]) -> list[tuple]:
    """(app_id, dim_version) txn entries recording each pin in the
    view's own txn map. A single-join view uses the bare app id (the
    pre-snowflake name, so r12 views keep their guard); a chain
    suffixes the join index."""
    if len(joins) == 1:
        return [(_DIMPIN_APP, joins[0]["dim_version"])]
    return [
        (f"{_DIMPIN_APP}_{i}", j["dim_version"])
        for i, j in enumerate(joins)
    ]


def _eff(a: dict):
    """The aggregate's EFFECTIVE value column: the aggregated column
    (or 1 for count(*)) gated by the per-aggregate FILTER clause —
    rows failing the filter contribute NULL, which every aggregate
    kind already ignores. One expression serves both the full
    aggregate and the incremental delta, so they stay bit-identical."""
    v = F.col(a["col"]) if a["col"] else F.lit(1)
    if a.get("filter"):
        return F.when(F.expr(a["filter"]), v)
    return v


def _stored_agg_exprs(aggs: list[dict]) -> list:
    """The stored-shape aggregation: exact, order-independent state.
    SQL ``agg(col) FILTER (WHERE f)`` maps to aggregating
    ``CASE WHEN f THEN col END`` — identical semantics, and the same
    CASE drives the delta path."""
    exprs = [F.count(F.lit(1)).alias("__n")]
    for a in aggs:
        kind, alias = a["kind"], a["alias"]
        e = _eff(a)
        if kind == "count":
            exprs.append(F.count(e).alias(alias))
        elif kind in ("sum", "avg"):
            exprs.append(
                F.coalesce(
                    F.sum(e.cast(_DEC)), F.lit(0).cast(_DEC)
                ).cast(_DEC).alias(alias)
            )
            exprs.append(F.count(e).alias(f"__nn_{alias}"))
        else:  # min / max
            exprs.append(getattr(F, kind)(e).alias(alias))
    return exprs


def _filtered(df: DataFrame, spec: dict) -> DataFrame:
    """Apply the view's WHERE clause (row-local, so filtering the
    change feed IS the change feed of the filtered source)."""
    w = spec.get("where")
    return df.filter(w) if w else df


def _joined(
    spark: SparkSession,
    spec: dict,
    fact_df: DataFrame,
    dim_version: int | None = None,
) -> DataFrame:
    """Apply the view's dimension join CHAIN + WHERE to a fact-side
    frame (the full read OR the change feed — both work because the
    chain is ROW-LOCAL per fact row: for a fixed dim state, each fact
    insert/delete maps to a deterministic multiset of joined
    inserts/deletes and the delta algebra is unchanged; the sec_ratios
    fact⨝broadcast-dim shape, VERDICT r11 item 8, generalized r13 to
    snowflake chains and left joins).

    Each join folds left-to-right onto the accumulating frame, so a
    snowflake's second dim may key on a column the FIRST dim
    introduced. ``how`` per join: "inner" (fact rows with no dim match
    are outside the view definition) or "left" (kept, dim columns
    NULL — SQL left-join semantics; a NULL-key fact row is unmatched
    and therefore kept null-padded).

    ``dim_version`` (follow-mode refreshes only) overrides the pinned
    version(s): an int for a single join, a list with one entry per
    join for a chain — pin-mode views always use the spec's recorded
    versions (dim evolution is an explicit :func:`repin_matview_join`
    or drop + recreate)."""
    out = fact_df
    for idx, j in enumerate(_join_list(spec)):
        if dim_version is None:
            v = j["dim_version"]
        elif isinstance(dim_version, (list, tuple)):
            v = dim_version[idx]
        else:
            v = dim_version
        dim = T.read(spark, j["dim"], version=v).select(
            F.col(j["dim_key"]).alias("__mv_dimk"), *j["dim_cols"]
        )
        # plain equality (SQL join semantics): NULL keys never match,
        # symmetrically in the full build and the feed
        out = out.join(
            F.broadcast(dim),
            out[j["key"]] == F.col("__mv_dimk"),
            j.get("how", "inner"),
        ).drop("__mv_dimk")
    return _filtered(out, spec)


def _full_aggregate(df: DataFrame, spec: dict) -> DataFrame:
    return df.groupBy(*spec["group_cols"]).agg(
        *_stored_agg_exprs(spec["aggs"])
    )


def _spec_path(dst: str) -> str:
    return os.path.join(dst, _SPEC_FILE)


def _load_spec(dst: str) -> dict:
    p = _spec_path(dst)
    if not os.path.exists(p):
        raise MatviewError(
            f"matview: no {_SPEC_FILE} at {dst} — not a materialized view "
            "(create_matview writes it)"
        )
    with open(p) as f:
        return json.load(f)


def create_matview(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    group_cols: list[str],
    aggs: list[tuple],
    range_files: int | None = None,
    where: str | None = None,
    join: dict | None = None,
) -> int:
    """Full initial build at the source's CURRENT version; returns that
    version (the view's cursor). ``aggs`` is a list of
    ``(kind, col, alias)`` or ``(kind, col, alias, filter_sql)`` with
    kind in count/sum/avg/min/max (``col=None`` for ``count(*)``;
    ``filter_sql`` is SQL's per-aggregate ``FILTER (WHERE ...)``).
    ``where`` filters the VIEW DEFINITION (``SELECT ... FROM src WHERE
    ...``): both clauses are row-local, so the incremental refresh
    stays exact — the filtered change feed IS the change feed of the
    filtered source, and filtered aggregates fold by the same delta
    algebra over the gated value column.

    ``join={"dim": path, "key": fact_col, "dim_key": dim_col,
    "dim_cols": [cols]}`` defines the view over
    ``fact JOIN dim ON fact.key = dim.dim_key`` (the sec_ratios
    fact⨝broadcast-dim shape): group/aggregate/filter columns may then
    come from the dim. The dim is a snaptable PINNED at its version at
    create time (recorded in the spec); refresh folds the FACT side's
    change feed joined to that pinned dim — row-local, so the delta
    algebra is unchanged and refresh == recompute exactly. Dim
    evolution is an explicit :func:`repin_matview_join` (or drop +
    recreate).

    ``join`` may also be a LIST of such specs — a SNOWFLAKE chain
    (fact⨝dim⨝dim...; VERDICT r12 item 3): joins fold left-to-right,
    so a later join's ``key`` may name a column an earlier dim
    introduced. Each spec takes ``how: "inner"|"left"`` (default
    inner) — a left join KEEPS fact rows with no dim match, dim
    columns NULL, and those NULL groups are first-class view rows
    (null-safe merge keys throughout). Both generalizations stay
    row-local per fact row under pinned dims, so the pin-mode
    incremental refresh is exact unchanged. Follow mode (every join in
    the chain shares the mode) supports the FULL shape lattice: a
    single join, inner or left — the left case extends the trilinear
    inner delta with the OUTER terms, signed ΔF▷D_new null rows plus
    per-key match-count flips confined to ΔD's keys (a dim insert
    RETRACTS previously null-padded rows, a dim key-deletion re-emits
    them; see :func:`_follow_feed`) — and chains with ANY inner/left
    mix, folded hop-by-hop (each hop applies the same trilinear +
    outer algebra to the previous hop's signed delta; see
    :func:`_follow_feed_chain`).

    ``range_files`` range-clusters the view by its group key into that
    many files — the 100 TB layout knob: with group-key-clustered files
    the refresh merge's footer min/max pre-prune confines the copy-on-
    write rewrite to the few files whose key range the delta actually
    hits, carrying the rest by reference."""
    norm = _validate_spec(group_cols, aggs)
    src_head = T._manifest(spark, src_path, None)["version"]
    jspec = None
    if join is not None:
        raw_joins = join if isinstance(join, list) else [join]
        # columns visible so far: the fact's, then each dim's as the
        # chain folds — a snowflake's later join may key on an
        # earlier dim's column, and collisions are refused against
        # everything already in scope (a shadowed column would make
        # every downstream reference ambiguous)
        avail = set(T.read(spark, src_path).columns)
        norm_joins = []
        for j in raw_joins:
            for k in ("dim", "key", "dim_key", "dim_cols"):
                if k not in j:
                    raise MatviewError(f"matview: join spec missing {k!r}")
            for name in [j["key"], j["dim_key"], *j["dim_cols"]]:
                if not _IDENT.match(name):
                    raise MatviewError(
                        f"matview: join column {name!r} must be a simple "
                        "identifier"
                    )
            mode = j.get("mode", "pin")
            if mode not in ("pin", "follow"):
                raise MatviewError(
                    f"matview: join mode must be pin|follow, got {mode!r}"
                )
            how = j.get("how", "inner")
            if how not in ("inner", "left"):
                raise MatviewError(
                    f"matview: join how must be inner|left, got {how!r}"
                )
            if norm_joins and mode != norm_joins[0]["mode"]:
                raise MatviewError(
                    "matview: every join in a chain must share one "
                    "mode (all pin or all follow)"
                )
            if j["key"] not in avail:
                raise MatviewError(
                    f"matview: join key {j['key']!r} is not a fact "
                    "column or a column introduced by an earlier join "
                    "in the chain"
                )
            clash = sorted(set(j["dim_cols"]) & avail)
            if clash:
                raise MatviewError(
                    f"matview: dim column(s) {clash} collide with fact "
                    "or earlier-dim columns — alias them in the dim "
                    "table first"
                )
            avail |= set(j["dim_cols"])
            norm_joins.append(
                {
                    "dim": os.path.abspath(j["dim"]),
                    "key": j["key"],
                    "dim_key": j["dim_key"],
                    "dim_cols": list(j["dim_cols"]),
                    "mode": mode,
                    "how": how,
                    # pin: refresh must join the SAME dim state as the
                    # build; follow: this is the INITIAL dim cursor
                    # (thereafter the combined txn epoch carries both
                    # cursors)
                    "dim_version": T._manifest(spark, j["dim"], None)[
                        "version"
                    ],
                }
            )
        jspec = norm_joins[0] if len(norm_joins) == 1 else norm_joins
    spec = {
        "src": os.path.abspath(src_path),
        "group_cols": list(group_cols),
        "aggs": norm,
        "where": where,
        "join": jspec,
    }
    df = _full_aggregate(
        _joined(spark, spec, T.read(spark, src_path, version=src_head)), spec
    )
    if range_files:
        df = df.repartitionByRange(range_files, *group_cols)
    # spec sidecar FIRST: a crash between the two steps then leaves a
    # spec with no table, and create_matview is simply re-runnable —
    # the reverse order left a table whose refresh/read raised with no
    # recovery path (ADVICE r9). A pre-existing spec is only
    # overwritten when its table is absent (a crashed create); a table
    # with NO spec is someone else's plain snaptable — refuse BEFORE
    # writing the spec, or the residue would re-badge that table as a
    # view of src (its reads/refreshes silently misattributed).
    os.makedirs(dst_path, exist_ok=True)
    if T.versions(spark, dst_path):
        raise MatviewError(
            f"matview: {dst_path} already holds a materialized view"
            if os.path.exists(_spec_path(dst_path))
            else f"matview: {dst_path} already holds a snaptable that is "
            "not a materialized view — refusing to re-badge it"
        )
    tmp = _spec_path(dst_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(spec, f, indent=1, sort_keys=True)
    os.replace(tmp, _spec_path(dst_path))
    cursor = (
        _encode_cursor(
            src_head, [j["dim_version"] for j in _join_list(spec)]
        )
        if _follow(spec)
        else src_head
    )
    txn = (_APP, cursor)
    if jspec is not None and not _follow(spec):
        # pin-mode join views ALSO record the dim pin(s) in the table's
        # own txn map, so refresh can detect a spec/table disagreement
        # (a crashed or interleaved repin) instead of silently folding
        # new-pin deltas onto old-pin aggregates (ADVICE r12)
        txn = (txn, *_dimpin_entries(_join_list(spec)))
    T.create(df, dst_path, txn=txn)
    return cursor


def _algebraic_delta(feed: DataFrame, spec: dict) -> DataFrame:
    """Per-group delta of every stored column from the net change feed:
    +row for inserts, -row for deletes. Exact (decimal / integer) —
    adding it to the stored state reproduces the full recompute bit-
    for-bit. A ``__sign`` column (follow-mode joined deltas, where the
    cross term carries PRODUCT signs) takes precedence over
    ``_change_type``."""
    if "__sign" in feed.columns:
        sgn = F.col("__sign")
    else:
        sgn = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
    exprs = [F.sum(sgn).alias("d___n")]
    for a in spec["aggs"]:
        kind, alias = a["kind"], a["alias"]
        e = _eff(a)
        nn = F.sum(F.when(e.isNotNull(), sgn).otherwise(F.lit(0)))
        if kind == "count":
            exprs.append(nn.alias(f"d_{alias}"))
        else:  # sum / avg
            exprs.append(
                F.coalesce(
                    F.sum(sgn.cast(_DEC) * e.cast(_DEC)),
                    F.lit(0).cast(_DEC),
                ).cast(_DEC).alias(f"d_{alias}")
            )
            exprs.append(nn.alias(f"d___nn_{alias}"))
    return feed.groupBy(*spec["group_cols"]).agg(*exprs)


def _follow_feed(
    spark: SparkSession,
    spec: dict,
    f_last: int,
    f_head: int,
    d_last: int,
    d_head: int,
) -> DataFrame:
    """The SIGNED joined delta of a follow-mode join view: three terms
    of the trilinear identity, each a broadcast join, unioned with a
    ``__sign`` column (+1/-1; the cross term multiplies signs). The
    view WHERE applies per term — it is row-local over the joined row,
    so it distributes over the multiset union. Cost: the fact-side
    term is O(|ΔF|); the dim-side terms scan the fact at its cursor
    version ONCE joined to the (broadcast) dim delta — dim changes are
    the rare event, and this is exactly the recompute a pinned view
    would need anyway, confined to the delta'd dim keys.

    LEFT follow views (r13) add the OUTER part of the delta — writing
    the left join as inner(F,D) ⊎ nullpad(anti(F,D)), the inner half
    is the same trilinear feed and the anti half decomposes exactly
    (anti is linear in F; in D it depends only on each key's
    match-COUNT flipping between zero and positive):

      anti(F_new,D_new) - anti(F_old,D_old)
        = ΔF ▷ D_new                         (signed by the fact sign)
        + F_old(keys whose count hit 0)       (+1: rows BECOME unmatched)
        - F_old(keys whose count left 0)      (-1: rows STOP being unmatched)

    both flip sets are confined to ΔD's keys (a key the dim delta
    never touched cannot flip), so the extra cost is two count
    aggregates over the delta'd keys plus F_old semi-joins against
    those (broadcast) key sets."""
    j = _join_list(spec)[0]  # follow mode is single-join only
    key = j["key"]
    left = j.get("how", "inner") == "left"

    def _sgn():
        return F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )

    def _fact_delta():
        ff = T.table_changes(spark, spec["src"], f_last, f_head)
        ff = ff.withColumn("__sign", _sgn())
        return ff.drop("_change_type", "_commit_version")

    parts = []
    if f_head > f_last:
        dim_old = T.read(spark, j["dim"], version=d_last).select(
            F.col(j["dim_key"]).alias("__mv_dimk"), *j["dim_cols"]
        )
        ff = _fact_delta()
        parts.append(
            ff.join(
                F.broadcast(dim_old),
                ff[key] == F.col("__mv_dimk"),
                "inner",
            ).drop("__mv_dimk")
        )
    if d_head > d_last:
        dd = T.table_changes(spark, j["dim"], d_last, d_head)
        dd_sel = dd.select(
            F.col(j["dim_key"]).alias("__mv_dimk"),
            *j["dim_cols"],
            _sgn().alias("__dsign"),
        )
        f_old = T.read(spark, spec["src"], version=f_last)
        parts.append(
            f_old.join(
                F.broadcast(dd_sel),
                f_old[key] == F.col("__mv_dimk"),
                "inner",
            )
            .drop("__mv_dimk")
            .withColumn("__sign", F.col("__dsign"))
            .drop("__dsign")
        )
        if f_head > f_last:
            ff = _fact_delta().withColumnRenamed("__sign", "__fsign")
            parts.append(
                ff.join(
                    F.broadcast(dd_sel),
                    ff[key] == F.col("__mv_dimk"),
                    "inner",
                )
                .drop("__mv_dimk")
                .withColumn("__sign", F.col("__fsign") * F.col("__dsign"))
                .drop("__fsign", "__dsign")
            )
    if left:
        parts.extend(
            _follow_anti_parts(spark, spec, f_last, f_head, d_last, d_head)
        )
    feed = parts[0]
    for p in parts[1:]:
        feed = feed.unionByName(p)
    return _filtered(feed, spec)


def _follow_anti_parts(
    spark: SparkSession,
    spec: dict,
    f_last: int,
    f_head: int,
    d_last: int,
    d_head: int,
) -> list[DataFrame]:
    """The OUTER half of a LEFT follow view's signed delta (see
    :func:`_follow_feed`): null-padded fact rows entering/leaving the
    unmatched set."""
    j = _join_list(spec)[0]
    key = j["key"]
    dim_new = T.read(spark, j["dim"], version=d_head)
    dtypes = dict(dim_new.dtypes)
    nulls = [F.lit(None).cast(dtypes[c]).alias(c) for c in j["dim_cols"]]
    parts = []
    if f_head > f_last:
        # ΔF ▷ D_new: signed fact-delta rows with no match at the NEW
        # dim state (inserts gain a null row, deletes retract one)
        ff = T.table_changes(spark, spec["src"], f_last, f_head)
        ff = ff.withColumn(
            "__sign",
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
                F.lit(-1)
            ),
        ).drop("_change_type", "_commit_version")
        dim_new_keys = dim_new.select(
            F.col(j["dim_key"]).alias("__mv_dimk")
        ).distinct()
        parts.append(
            ff.join(
                F.broadcast(dim_new_keys),
                ff[key] == F.col("__mv_dimk"),
                "left_anti",
            ).select("*", *nulls)
        )
    if d_head > d_last:
        # match-count flips, confined to the delta'd keys: count each
        # such key in D_old and D_new (two broadcast-semi-confined
        # aggregates over the dim)
        dd = T.table_changes(spark, j["dim"], d_last, d_head)
        dkeys = dd.select(F.col(j["dim_key"]).alias("__k")).distinct()
        dim_old = T.read(spark, j["dim"], version=d_last)

        def _cnt(dim_df, alias):
            return (
                dim_df.join(
                    F.broadcast(dkeys),
                    dim_df[j["dim_key"]] == F.col("__k"),
                    "left_semi",
                )
                .groupBy(F.col(j["dim_key"]).alias("__k"))
                .agg(F.count(F.lit(1)).alias(alias))
            )

        flips = (
            dkeys.join(_cnt(dim_old, "__co"), "__k", "left")
            .join(_cnt(dim_new, "__cn"), "__k", "left")
            .select(
                "__k",
                F.coalesce("__co", F.lit(0)).alias("__co"),
                F.coalesce("__cn", F.lit(0)).alias("__cn"),
            )
        ).localCheckpoint(eager=True)
        f_old = T.read(spark, spec["src"], version=f_last)
        for cond, sgn in (
            # rows BECOME unmatched: key had matches, now has none
            ((F.col("__co") > 0) & (F.col("__cn") == 0), 1),
            # rows STOP being unmatched: key had none, now has some
            ((F.col("__co") == 0) & (F.col("__cn") > 0), -1),
        ):
            keys = flips.filter(cond).select("__k")
            parts.append(
                f_old.join(
                    F.broadcast(keys),
                    f_old[key] == F.col("__k"),
                    "left_semi",
                ).select(
                    "*", *nulls, F.lit(sgn).cast("int").alias("__sign")
                )
            )
    return parts


def _follow_feed_chain(
    spark: SparkSession,
    spec: dict,
    f_last: int,
    f_head: int,
    d_lasts: list[int],
    d_heads: list[int],
) -> DataFrame:
    """The SIGNED joined delta of a follow-mode snowflake CHAIN with
    any inner/left mix, by PER-HOP COMPOSITION: the (inner or left)
    join-with-one-dim is an operator on multisets whose exact delta
    needs only its input's delta and old state, so folding hops
    left-to-right —

        (Δ_0, old_0) = (signed ΔF, F_old)
        (Δ_i, old_i) = hop_i(Δ_{i-1}, old_{i-1}, D_i old/Δ/new)
        old_i        = old_{i-1} ⋈/⟕ D_i_old

    — yields the chain's exact delta at Δ_n. Each INNER hop emits the
    trilinear terms (Δ⋈D_old, old⋈ΔD, Δ⋈ΔD, signs multiplying); each
    LEFT hop adds the outer terms (signed Δ▷D_new null-padded, plus
    old-rows of keys whose match-count flipped between zero and
    positive, confined to ΔD's keys — the same algebra as the
    single-dim left view, :func:`_follow_anti_parts`). For an all-inner
    chain this expands to exactly the 2^(n+1)−1 multilinear choice
    terms; quiet sides contribute nothing, so the common
    fact-only-moved window folds one term per hop — pinned-refresh
    cost. Dims broadcast throughout; terms referencing ``old_{i-1}``
    re-evaluate the fact joined to the earlier old dims (dim changes
    are the rare event, and that is the recompute a pinned view would
    need anyway)."""
    js = _join_list(spec)

    def _sgn():
        return F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )

    if f_head > f_last:
        ff = T.table_changes(spark, spec["src"], f_last, f_head)
        delta = ff.withColumn("__sign", _sgn()).drop(
            "_change_type", "_commit_version"
        )
    else:
        delta = None
    old = T.read(spark, spec["src"], version=f_last)

    for i, j in enumerate(js):
        key, how = j["key"], j.get("how", "inner")
        dim_moved = d_heads[i] > d_lasts[i]
        dim_old = T.read(spark, j["dim"], version=d_lasts[i]).select(
            F.col(j["dim_key"]).alias("__mv_dimk"), *j["dim_cols"]
        )
        parts = []
        if delta is not None:
            # Δ ⋈ D_old (sign carried)
            parts.append(
                delta.join(
                    F.broadcast(dim_old),
                    delta[key] == F.col("__mv_dimk"),
                    "inner",
                ).drop("__mv_dimk")
            )
        if dim_moved:
            dd = T.table_changes(spark, j["dim"], d_lasts[i], d_heads[i])
            dd_sel = dd.select(
                F.col(j["dim_key"]).alias("__mv_dimk"),
                *j["dim_cols"],
                _sgn().alias("__dsign"),
            )
            # old ⋈ ΔD (sign = dim sign)
            parts.append(
                old.join(
                    F.broadcast(dd_sel),
                    old[key] == F.col("__mv_dimk"),
                    "inner",
                )
                .drop("__mv_dimk")
                .withColumn("__sign", F.col("__dsign"))
                .drop("__dsign")
            )
            if delta is not None:
                # Δ ⋈ ΔD (sign product)
                dprev = delta.withColumnRenamed("__sign", "__psign")
                parts.append(
                    dprev.join(
                        F.broadcast(dd_sel),
                        dprev[key] == F.col("__mv_dimk"),
                        "inner",
                    )
                    .drop("__mv_dimk")
                    .withColumn(
                        "__sign", F.col("__psign") * F.col("__dsign")
                    )
                    .drop("__psign", "__dsign")
                )
        if how == "left":
            parts.extend(
                _left_hop_anti_parts(
                    spark, j, delta, old, d_lasts[i], d_heads[i]
                )
            )
        new_delta = None
        for p in parts:
            new_delta = p if new_delta is None else new_delta.unionByName(p)
        delta = new_delta
        # the next hop's OLD state: this hop applied at the dim's
        # CURSOR version (no sign columns — an unsigned +1 frame)
        old = old.join(
            F.broadcast(dim_old),
            old[key] == F.col("__mv_dimk"),
            how,
        ).drop("__mv_dimk")
    return _filtered(delta, spec)


def _left_hop_anti_parts(
    spark: SparkSession,
    j: dict,
    delta,
    old: DataFrame,
    d_last: int,
    d_head: int,
) -> list[DataFrame]:
    """Outer terms of ONE left hop over an arbitrary signed input
    delta / old frame (the chain twin of :func:`_follow_anti_parts`,
    which reads the fact table directly). NULL input keys never match
    any dim row, so they fall through the anti-join null-padded — the
    left-join semantics an earlier left hop's null rows need."""
    key = j["key"]
    dim_new = T.read(spark, j["dim"], version=d_head)
    dtypes = dict(dim_new.dtypes)
    nulls = [F.lit(None).cast(dtypes[c]).alias(c) for c in j["dim_cols"]]
    parts = []
    if delta is not None:
        dim_new_keys = dim_new.select(
            F.col(j["dim_key"]).alias("__mv_dimk")
        ).distinct()
        parts.append(
            delta.join(
                F.broadcast(dim_new_keys),
                delta[key] == F.col("__mv_dimk"),
                "left_anti",
            ).select("*", *nulls)
        )
    if d_head > d_last:
        dd = T.table_changes(spark, j["dim"], d_last, d_head)
        dkeys = dd.select(F.col(j["dim_key"]).alias("__k")).distinct()
        dim_old = T.read(spark, j["dim"], version=d_last)

        def _cnt(dim_df, alias):
            return (
                dim_df.join(
                    F.broadcast(dkeys),
                    dim_df[j["dim_key"]] == F.col("__k"),
                    "left_semi",
                )
                .groupBy(F.col(j["dim_key"]).alias("__k"))
                .agg(F.count(F.lit(1)).alias(alias))
            )

        flips = (
            dkeys.join(_cnt(dim_old, "__co"), "__k", "left")
            .join(_cnt(dim_new, "__cn"), "__k", "left")
            .select(
                "__k",
                F.coalesce("__co", F.lit(0)).alias("__co"),
                F.coalesce("__cn", F.lit(0)).alias("__cn"),
            )
        ).localCheckpoint(eager=True)
        for cond, sgn in (
            ((F.col("__co") > 0) & (F.col("__cn") == 0), 1),
            ((F.col("__co") == 0) & (F.col("__cn") > 0), -1),
        ):
            keys = flips.filter(cond).select("__k")
            parts.append(
                old.join(
                    F.broadcast(keys),
                    old[key] == F.col("__k"),
                    "left_semi",
                ).select(
                    "*", *nulls, F.lit(sgn).cast("int").alias("__sign")
                )
            )
    return parts


def refresh_matview(spark: SparkSession, dst_path: str) -> int:
    """Fold every source commit since the last refresh into the view;
    returns the new cursor (source version). No-op — no Spark job —
    when the source hasn't moved. Crash-safe: the commit carries
    ``txn=("matview", head)``, so a replayed refresh of an already-
    applied range is a no-op by the table's own transaction map."""
    spec = _load_spec(dst_path)
    src = spec["src"]
    last = T.last_txn(spark, dst_path, _APP)
    if last is None:
        raise MatviewError(
            f"matview: {dst_path} carries no '{_APP}' transaction — "
            "was the table created by create_matview?"
        )
    if _follow(spec):
        # full IVM over the join (mode "follow"): fold EVERY side's
        # change feed through the multilinear multiset identity — for
        # one dim the trilinear ΔF⋈D_old + F_old⋈ΔD + ΔF⋈ΔD (plus the
        # outer terms when the join is LEFT), for a chain every
        # old/delta choice vector with at least one delta — signs
        # multiplying across the chosen deltas. All cursors ride one
        # monotone txn epoch (base-_CURSOR_K positional).
        js = _join_list(spec)
        n = len(js)
        f_last, d_lasts = _decode_cursor(last, n)
        f_head = T._manifest(spark, src, None)["version"]
        d_heads = [
            T._manifest(spark, j["dim"], None)["version"] for j in js
        ]
        if f_head <= f_last and all(
            h <= l for h, l in zip(d_heads, d_lasts)
        ):
            return last
        head = _encode_cursor(f_head, d_heads)
        if n == 1:
            feed = _follow_feed(
                spark, spec, f_last, f_head, d_lasts[0], d_heads[0]
            )
        else:
            feed = _follow_feed_chain(
                spark, spec, f_last, f_head, d_lasts, d_heads
            )
        fresh_src = lambda: _joined(  # noqa: E731
            spark, spec, T.read(spark, src, version=f_head),
            dim_version=d_heads,
        )
    else:
        # pin coherence guard (ADVICE r12): the spec sidecar and the
        # table overwrite are two steps — a crash (or an interleaved
        # refresh) between a repin's spec write and its overwrite
        # would otherwise fold deltas joined to the NEW dim pin onto
        # aggregates built under the OLD pin, silently wrong until
        # the repin is re-run.
        for app, want in _dimpin_entries(_join_list(spec)):
            pinned = T.last_txn(spark, dst_path, app)
            if pinned is not None and pinned != want:
                raise MatviewError(
                    f"matview: {dst_path} spec pins dim version {want} "
                    f"({app}) but the table was built at dim version "
                    f"{pinned} — a repin did not complete; re-run "
                    "repin_matview_join to converge"
                )
        head = T._manifest(spark, src, None)["version"]
        if head <= last:
            return last
        feed = _joined(spark, spec, T.table_changes(spark, src, last, head))
        fresh_src = lambda: _joined(  # noqa: E731
            spark, spec, T.read(spark, src, version=head)
        )
    groups = spec["group_cols"]
    holistic = [a for a in spec["aggs"] if a["kind"] in _HOLISTIC]
    if not holistic:
        delta = _algebraic_delta(feed, spec)
        # an all-zero delta group (e.g. an update that changed only
        # columns the view ignores) is a no-op — dropping it keeps the
        # copy-on-write rewrite confined to files of groups that moved
        nonzero = F.col("d___n") != 0
        for c in delta.columns:
            if c.startswith("d_") and c != "d___n":
                nonzero = nonzero | (F.col(c) != 0)
        # merge_into runs several internal jobs over its source (key
        # bounds, touch confirm, the rewrite itself) — pin the delta
        # once instead of re-reading the change feed and re-aggregating
        # per job. The small-delta collapse to one partition (so each
        # of those jobs schedules 1 task, not shuffle-partition-many)
        # rides merge_into's own bounds aggregation since r14 — the
        # separate count() job per refresh is gone.
        delta = delta.filter(nonzero).localCheckpoint(eager=True)
        updates = {"__n": "t.__n + s.d___n"}
        for a in spec["aggs"]:
            al = a["alias"]
            updates[al] = f"t.`{al}` + s.`d_{al}`"
            if a["kind"] in ("sum", "avg"):
                updates[f"__nn_{al}"] = (
                    f"t.`__nn_{al}` + s.`d___nn_{al}`"
                )
        inserts = {"__n": "s.d___n"}
        for a in spec["aggs"]:
            al = a["alias"]
            inserts[al] = f"s.`d_{al}`"
            if a["kind"] in ("sum", "avg"):
                inserts[f"__nn_{al}"] = f"s.`d___nn_{al}`"
        T.merge_into(
            delta,
            dst_path,
            key_cols=groups,
            when_matched=[
                ("t.__n + s.d___n = 0", "delete"),
                (None, updates),
            ],
            when_not_matched=inserts,
            txn=(_APP, head),
            unique_source=True,  # delta is a groupBy on exactly groups
            # a NULL-able group column materializes a NULL-key view
            # row; plain-equality merge keys would never match it and
            # every refresh would insert a duplicate (ADVICE r9)
            null_safe_keys=True,
            small_source_rows=100_000,
        )
    else:
        # a delete can raise a min — recompute ONLY the touched groups
        # from the source head (semi-join-confined scan), then merge:
        # vanished groups (no source rows left) delete, the rest
        # replace, new groups insert.
        touched = feed.select(*groups).distinct()
        # null-safe joins throughout: a NULL group is a real group
        fresh = _full_aggregate(
            T._key_join(
                fresh_src(),
                touched,
                groups,
                "left_semi",
                null_safe=True,
            ),
            spec,
        )
        merged_src = T._key_join(
            touched, fresh, groups, "left", null_safe=True
        ).localCheckpoint(eager=True)
        stored_cols = [c for c in fresh.columns if c not in groups]
        T.merge_into(
            merged_src,
            dst_path,
            key_cols=groups,
            when_matched=[
                ("s.__n IS NULL", "delete"),
                (None, {c: f"s.`{c}`" for c in stored_cols}),
            ],
            when_not_matched={c: f"s.`{c}`" for c in stored_cols},
            txn=(_APP, head),
            unique_source=True,  # touched is a distinct() on groups
            null_safe_keys=True,
            small_source_rows=100_000,
        )
    return head


def stream_refresh_matview(
    spark: SparkSession,
    dst_path: str,
    checkpoint: str,
    processing_time: str | None = None,
    available_now: bool = False,
    signal_path: str | None = None,
):
    """Continuous lakehouse-native refresh (the reference's T7
    background-refresh loop, re-expressed on the table's own log;
    VERDICT r9 item 7): a micro-batch stream over the SOURCE
    snaptable's version offsets drives :func:`refresh_matview` once
    per epoch. The micro-batch DATA is never read — the stream is the
    change SIGNAL (version offsets + checkpoint give restart-exactly-
    once scheduling for free); the refresh itself reads the change
    feed from the view's own ``txn=("matview", head)`` cursor, so a
    replayed epoch after a crash re-folds nothing, and an epoch whose
    refresh raced ahead of its offset range folds early, never twice.
    ``skipChangeCommits`` keeps the trigger alive across delete/
    rewrite commits — the refresh handles those through the feed, the
    signal stream must simply not fail on them. Returns the started
    ``StreamingQuery``.

    ``signal_path`` overrides WHICH table's commits wake the refresh
    (default: the view's fact source). For a follow-mode JOIN view,
    dim-only commits fold on the next fact commit with the default
    signal; when dim-only latency matters, start a SECOND daemon with
    ``signal_path=<dim path>`` and its own checkpoint — refreshes are
    exactly-once by the view's txn cursor, so two daemons never
    double-fold."""
    spec = _load_spec(dst_path)
    from sec_financial_pipeline_spark.sources.snap_datasource import (
        register_snaptable_source,
    )

    register_snaptable_source(spark)
    stream = (
        spark.readStream.format("snaptable")
        .option("skipChangeCommits", "true")
        .load(signal_path or spec["src"])
    )

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        # two-daemon mode (fact-signal + dim-signal): when both fold
        # the same range at once, the losing merge_into raises
        # SnapshotConflict — but the raced range is by construction
        # already applied (or re-foldable from the re-read cursor), so
        # a bounded retry converges; re-raising would kill this
        # streaming query on a genuine race (ADVICE r12). The loop is
        # bounded (not single-shot): on a busy view BOTH daemons can
        # lose their first retry to each other's next fold — three
        # consecutive losses means something other than the peer
        # daemon holds the table, which should surface.
        import time as _time

        for attempt in range(3):
            try:
                refresh_matview(spark, dst_path)
                return
            except T.SnapshotConflict:
                if attempt == 2:
                    raise
                _time.sleep(0.2 * (attempt + 1))

    w = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time is not None:
        w = w.trigger(processingTime=processing_time)
    return w.start()


def matview_lag(spark: SparkSession, dst_path: str) -> dict:
    """How far the view trails its source: ``behind_versions`` (0 =
    fresh) plus both cursors — the number a scheduler polls before
    deciding to refresh (no Spark job runs; two manifest reads)."""
    spec = _load_spec(dst_path)
    last = T.last_txn(spark, dst_path, _APP) or 0
    head = T._manifest(spark, spec["src"], None)["version"]
    if _follow(spec):
        js = _join_list(spec)
        f_last, d_lasts = _decode_cursor(last, len(js))
        out = {
            "src": spec["src"],
            "src_version": head,
            "view_cursor": f_last,
            "behind_versions": max(0, head - f_last),
        }
        if len(js) == 1:
            d_head = T._manifest(spark, js[0]["dim"], None)["version"]
            out.update(
                dim=js[0]["dim"],
                dim_version=d_head,
                dim_cursor=d_lasts[0],
                dim_behind_versions=max(0, d_head - d_lasts[0]),
            )
        else:
            out["dims"] = [
                {
                    "dim": j["dim"],
                    "dim_version": (
                        dh := T._manifest(spark, j["dim"], None)["version"]
                    ),
                    "dim_cursor": dl,
                    "dim_behind_versions": max(0, dh - dl),
                }
                for j, dl in zip(js, d_lasts)
            ]
        return out
    return {
        "src": spec["src"],
        "src_version": head,
        "view_cursor": last,
        "behind_versions": max(0, head - last),
    }


def read_matview(
    spark: SparkSession, dst_path: str, version: int | None = None
) -> DataFrame:
    """User-facing projection of the stored state: group columns, then
    each aggregate under its alias — counts as BIGINT, sums as DOUBLE
    (one final rounding of the exact decimal, NULL when the group holds
    no non-null values), avgs as exact-sum / non-null-count."""
    spec = _load_spec(dst_path)
    df = T.read(spark, dst_path, version=version)
    cols = [F.col(g) for g in spec["group_cols"]]
    for a in spec["aggs"]:
        kind, alias = a["kind"], a["alias"]
        if kind == "count":
            cols.append(F.col(alias).cast("bigint").alias(alias))
        elif kind == "sum":
            cols.append(
                F.when(F.col(f"__nn_{alias}") > 0, F.col(alias))
                .cast("double")
                .alias(alias)
            )
        elif kind == "avg":
            cols.append(
                (
                    F.col(alias).cast("double")
                    / F.when(
                        F.col(f"__nn_{alias}") > 0, F.col(f"__nn_{alias}")
                    )
                ).alias(alias)
            )
        else:
            cols.append(F.col(alias))
    return df.select(*cols)


def repin_matview_join(spark: SparkSession, dst_path: str) -> int:
    """Move a JOIN view to its dims' CURRENT versions (every join in a
    snowflake chain re-pins together): one full recompute committed as
    an atomic overwrite, spec re-pinned. This is the view-definition
    change the refresh path refuses to do implicitly (a dim commit
    must never silently mix into incremental history) — the
    operational alternative to drop + recreate.

    The recompute is evaluated at the FACT version the view's cursor
    already covers (``last_txn``), not the fact head: repin changes
    only the dim pins, so the ``matview`` cursor is untouched and a
    subsequent :func:`refresh_matview` folds later fact commits
    normally against the new pins. The overwrite carries its own
    ``txn=("matview_repin", sum of dim heads)`` — dim versions are
    monotone, so the sum strictly grows whenever any dim moved and a
    replayed repin of the same dim state is a no-op. Crash contract:
    spec-then-overwrite is not atomic as a pair — re-run repin to
    converge. The overwrite ALSO records each pin under the
    ``matview_dimpin`` app id(s), so a refresh that runs between the
    two steps (or after a crash) fails loudly on the spec/table
    disagreement instead of folding new-pin deltas onto old-pin
    aggregates. The cursor's fact version must still be retained
    (refresh before vacuum, as the module documents). Returns the
    single dim version pinned (single-join view) or the sum of pinned
    versions (chain)."""
    spec = _load_spec(dst_path)
    js = _join_list(spec)
    if not js:
        raise MatviewError(
            f"matview: {dst_path} is not a join view — nothing to repin"
        )
    if _follow(spec):
        raise MatviewError(
            f"matview: {dst_path} is a follow-mode join view — the dim "
            "is tracked incrementally, there is no pin to move"
        )
    last = T.last_txn(spark, dst_path, _APP)
    if last is None:
        raise MatviewError(
            f"matview: {dst_path} carries no '{_APP}' transaction"
        )
    new_joins = [
        dict(j, dim_version=T._manifest(spark, j["dim"], None)["version"])
        for j in js
    ]
    epoch = sum(j["dim_version"] for j in new_joins)
    new_spec = dict(
        spec, join=new_joins[0] if len(new_joins) == 1 else new_joins
    )
    df = _full_aggregate(
        _joined(spark, new_spec,
                T.read(spark, spec["src"], version=last)),
        new_spec,
    )
    tmp = _spec_path(dst_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_spec, f, indent=1, sort_keys=True)
    os.replace(tmp, _spec_path(dst_path))
    T.overwrite(
        df,
        dst_path,
        txn=(("matview_repin", epoch), *_dimpin_entries(new_joins)),
    )
    return epoch
