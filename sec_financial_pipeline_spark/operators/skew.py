"""Skew-mitigation operators (PERF.md; pyspark guide "Partitioning &
shuffle").

AQE's skew-join splitting handles joins; for *aggregations* over a hot
key the standard fix is two-phase salted aggregation: shuffle on
(key, salt) first — spreading the hot key over ``n_salts`` reducers —
then combine the partials per key. Correct for any algebraic aggregate;
here sums/counts (the engine's deterministic decimal sums compose
exactly, so salting does not perturb results).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    out_col: str,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe sum: partial decimal sums per (key, salt),
    then exact combine per key. ``salt_source`` names a column whose
    hash spreads rows (defaults to ``spark_partition_id`` being
    unavailable at plan time, we hash all non-key columns' first one —
    pass an id column for a deterministic spread).
    """
    src = F.col(salt_source) if salt_source else F.monotonically_increasing_id()
    salt = F.pmod(F.hash(src), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(*keys, salt, value.cast("decimal(30,6)").alias("__v"))
        .groupBy(*keys, "__salt")
        .agg(F.sum("__v").alias("__partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__partial").cast("double").alias(out_col))
    )
