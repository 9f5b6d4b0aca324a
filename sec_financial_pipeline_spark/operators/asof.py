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
) -> DataFrame:
    """For each ``right`` row, attach the ``value_cols`` of the latest
    ``left`` row with equal ``on`` keys and time <= the right row's time.

    Ties at equal time resolve left-before-right (a left row at exactly
    t is visible to a right row at t). If multiple left rows can share
    (key, time), pass ``left_tiebreakers`` — the greatest row under that
    order wins — or the result is nondeterministic.

    Returns all ``right`` columns plus ``value_cols`` (NULL when no left
    row precedes).
    """
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
    order = [F.col("__t").asc(), F.col("__side").asc()] + [
        F.col(f"__tb{i}").asc_nulls_first() for i in range(len(left_tiebreakers))
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    picked = unioned.select(
        F.col("__side"),
        *[F.col(f"__r_{c}").alias(c) for c in right_cols],
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return picked.filter(F.col("__side") == 1).drop("__side")
