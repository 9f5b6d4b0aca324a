"""Range (interval) join — an operator Spark lacks natively
(SURVEY §2.3 north-star surface; the reference has no range joins
either — this is part of the "operations a large-scale pipeline needs"
extension mandate).

``point_in_interval_join`` matches point rows to interval rows where
``start <= point < end`` with NO equi-key. Spark plans a raw inequality
join as BroadcastNestedLoopJoin (O(n x m) comparisons, and undistributable
once the interval side outgrows a broadcast). The scale-safe form used
here is the classic *bucketed* rewrite:

1. pick a bucket width comparable to the typical interval length;
2. each point maps to exactly ONE bucket (``floor(epoch / width)``);
3. each interval explodes to the buckets it overlaps
   (``sequence(floor(start/width), floor(end/width))`` — a few rows when
   width ~ interval length);
4. equi-join on the bucket id (hash shuffle, AQE-skew-safe), then apply
   the exact range predicate as a post-join filter.

Each (point, interval) match is produced exactly once — a point lives in
one bucket, so no distinct pass is needed. Cost is one shuffle plus a
small interval blow-up factor, vs. the nested-loop's n x m; at 100 TB the
bucket id is also a natural partition key for co-locating repeated range
joins against the same interval table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner-join each ``points`` row to every ``intervals`` row whose
    ``[start, end)`` window contains ``point_ts`` (end-exclusive).
    Column names must not collide across the two inputs.

    ``bucket_seconds`` tunes the shuffle: too small explodes the interval
    side, too large degrades the equi-join to few hot keys. A width near
    the median interval length keeps the explode factor ~2.
    """
    p = points.withColumn(
        _BUCKET, F.floor(F.unix_timestamp(F.col(point_ts)) / F.lit(bucket_seconds))
    )
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / F.lit(bucket_seconds)),
                # end is exclusive but its bucket still overlaps
                # [start, end); the exact predicate below discards the
                # false positives this admits.
                F.floor(F.unix_timestamp(F.col(end)) / F.lit(bucket_seconds)),
            )
        ),
    )
    cond = (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
    return p.join(i, on=_BUCKET, how="inner").filter(cond).drop(_BUCKET)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner-join interval rows whose half-open windows OVERLAP:
    ``left.[start, end) ∩ right.[start, end) != ∅`` — the
    interval-interval sibling of :func:`point_in_interval_join`
    (session-vs-campaign, downtime-vs-deploy, shift-vs-incident).
    Column names must not collide across the two inputs.

    Same bucketed rewrite, with one twist: BOTH sides explode to their
    covering buckets, so a pair overlapping across several buckets would
    match once per shared bucket. Rather than a post-join ``distinct``
    (a second shuffle over the matched set), each pair is attributed to
    the ONE bucket containing ``greatest(left_start, right_start)`` —
    the overlap's first instant — which both sides are guaranteed to
    cover. The dedup is a per-row predicate; the join stays one shuffle.
    """
    w = F.lit(bucket_seconds)
    l = left.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(left_start)) / w),
                F.floor(F.unix_timestamp(F.col(left_end)) / w),
            )
        ),
    )
    r = right.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(right_start)) / w),
                F.floor(F.unix_timestamp(F.col(right_end)) / w),
            )
        ),
    )
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    anchor = F.floor(
        F.unix_timestamp(F.greatest(F.col(left_start), F.col(right_start))) / w
    )
    return (
        l.join(r, on=_BUCKET, how="inner")
        .filter(overlap & (F.col(_BUCKET) == anchor))
        .drop(_BUCKET)
    )
