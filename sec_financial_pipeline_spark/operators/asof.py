"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY §2.3 notes the reference has no range/as-of joins either;
north-star OLAP surface).

Implemented as the *union + last-ignore-nulls window* composition, not a
pairwise join: both sides are tagged and unioned, sorted per key by event
time; each right-side row then picks up the latest left-side value
at-or-before its timestamp via ``last(..., ignorenulls=True)`` over an
unbounded-preceding window.

Why this shape at 100 TB: a naive as-of as a range join explodes into a
BroadcastNestedLoop theta join (O(n x m) per key); the union-window form
is ONE shuffle on the key and a linear in-partition scan — the same cost
as any windowed aggregate, with AQE handling skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    left_tiebreakers: Sequence[str] = (),
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For each ``right`` row, attach the ``value_cols`` of the matching
    ``left`` row under ``direction``:

    - ``backward`` (default): latest left row with time <= right time;
    - ``forward``: earliest left row with time >= right time;
    - ``nearest``: whichever of the two is closer in time; exact-middle
      ties resolve backward (pandas ``merge_asof`` semantics).

    Ties at equal time resolve left-visible-to-right in every direction.
    If multiple left rows can share (key, time), pass
    ``left_tiebreakers`` — the greatest row under that order wins for
    ``backward``/``nearest``-backward, the least for ``forward`` — or
    the result is nondeterministic.

    ``tolerance`` (optional, in the time column's numeric units — epoch
    seconds for timestamps) voids matches farther than that from the
    right row's time, yielding NULL instead (pandas ``merge_asof``
    tolerance semantics).

    Returns all ``right`` columns plus ``value_cols`` (NULL when no left
    row qualifies). All three directions stay ONE shuffle on the key:
    ``nearest`` adds a second window over the same sorted data, not a
    second shuffle.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    on = list(on)
    left_types = dict(left.dtypes)
    right_cols = list(right.columns)
    right_types = dict(right.dtypes)

    # Tiebreakers keep their native type: casting to string would order
    # numeric ids lexicographically ('9' > '10') and silently violate the
    # greatest-row-wins contract. Only the right side's NULL placeholders
    # are cast, to each left column's own dtype.
    tagged_left = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(left_tiebreakers)],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast(right_types[c]).alias(f"__r_{c}") for c in right_cols],
    )
    tagged_right = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(left_types[c]).alias(f"__tb{i}")
            for i, c in enumerate(left_tiebreakers)
        ],
        *[F.lit(None).cast(left_types[c]).alias(f"__v_{c}") for c in value_cols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    tb_asc = [
        F.col(f"__tb{i}").asc_nulls_first() for i in range(len(left_tiebreakers))
    ]
    tb_desc = [
        F.col(f"__tb{i}").desc_nulls_first() for i in range(len(left_tiebreakers))
    ]
    # backward scan: ascending time, left rows before right at equal t,
    # greatest tiebreaker closest to the right row (last() wins).
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), *tb_asc)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward scan: DESCENDING time — "last preceding in this order" is
    # the left row with the smallest time >= t; the least tiebreaker
    # must win, so it sorts closest under descending tiebreakers.
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").desc(), F.col("__side").asc(), *tb_desc)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def picks(w) -> list:
        return [F.last(f"__v_{c}", ignorenulls=True).over(w) for c in value_cols]

    # matched-left time per scan (numeric distance: timestamps cast to
    # double = epoch seconds) — drives both `nearest` and `tolerance`
    tnum = F.col("__t").cast("double")
    left_t = F.when(F.col("__side") == 0, tnum)
    back_t = F.last(left_t, ignorenulls=True).over(w_back)
    fwd_t = F.last(left_t, ignorenulls=True).over(w_fwd)

    if direction == "backward":
        vals = picks(w_back)
        dist = tnum - back_t
    elif direction == "forward":
        vals = picks(w_fwd)
        dist = fwd_t - tnum
    else:  # nearest: run both scans, choose per row by time distance
        use_back = fwd_t.isNull() | (
            back_t.isNotNull() & ((tnum - back_t) <= (fwd_t - tnum))
        )
        vals = [
            F.when(use_back, b).otherwise(f)
            for b, f in zip(picks(w_back), picks(w_fwd))
        ]
        dist = F.when(use_back, tnum - back_t).otherwise(fwd_t - tnum)
    if tolerance is not None:
        vals = [F.when(dist <= tolerance, v) for v in vals]
    picked = unioned.select(
        F.col("__side"),
        *[F.col(f"__r_{c}").alias(c) for c in right_cols],
        *[v.alias(c) for v, c in zip(vals, value_cols)],
    )
    return picked.filter(F.col("__side") == 1).drop("__side")
