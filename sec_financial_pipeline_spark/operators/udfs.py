"""Pandas-UDF surface (SURVEY §2.8).

The reference registers no UDFs — all custom logic is plain pandas.
Here the same logic classes appear as Arrow-vectorized Pandas UDFs, the
*only* sanctioned Python path in this engine (row-at-a-time Python UDFs
are banned from hot paths). Everything expressible with built-ins stays
built-in; these exist for (a) parity with the reference's
pandas-function style and (b) genuinely non-SQL per-group math.

Determinism note: scalar Pandas UDFs compute per-row float64 with the
same IEEE ops as the SQL expression they mirror, so results are
bit-identical to the oracle; grouped regressions aggregate few points
per group and round their outputs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def quality_score_udf(len_chars: pd.Series, n_tokens: pd.Series, n_distinct: pd.Series) -> pd.Series:
    """Vectorized quality composite — the pandas twin of the
    ``doc_quality_score`` SQL expression (same op order => same bits)."""
    import numpy as np

    len_norm = (len_chars.astype("float64") / 400.0).clip(upper=1.0)
    uniq_ratio = n_distinct.astype("float64") / n_tokens
    score = len_norm * 0.5 + uniq_ratio * 0.5
    # half-up rounding (SQL ROUND semantics); pandas .round() is
    # half-even and disagrees on exact .5 boundaries
    return np.floor(score * 1e6 + 0.5) / 1e6


def ols_slope_per_group(
    df: DataFrame,
    group: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS slope/intercept via ``applyInPandas`` — grouped-map
    UDF shape (one pandas frame per group in, one row out).

    Uses exact integer arithmetic internally: x must be integral and y a
    <= 6-decimal value; sums run over micro-units as unbounded Python
    ints, so the two final float divisions are the only FP ops — the
    result is bit-identical under any row order or engine (the oracle
    mirrors the same formula with exact BIGINT sums):

        slope = (n*Σxy - Σx*Σy) / (n*Σx² - (Σx)²)
        intercept = (Σy - slope*Σx) / n
    """
    out_schema = T.StructType(
        [
            *[df.schema[g] for g in group],
            T.StructField("slope", T.DoubleType()),
            T.StructField("intercept", T.DoubleType()),
            T.StructField("n_points", T.IntegerType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) for v in pdf[x_col]]
        ys = [int(round(float(v) * 1_000_000)) for v in pdf[y_col]]  # micro-units
        n = len(xs)
        sx = sum(xs)
        sy = sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        den = n * sxx - sx * sx
        if den:
            # float() each exact int BEFORE dividing — the same
            # CAST(... AS DOUBLE) sequence as the SQL twin, so the one
            # rounding per operand matches bit-for-bit (Python's big-int
            # true division would round once overall and can differ in
            # the last ulp).
            slope = float(n * sxy - sx * sy) / (float(den) * 1_000_000)
            intercept = (float(sy) / 1_000_000 - slope * sx) / n
        else:
            slope = intercept = None
        row = {g: pdf[g].iloc[0] for g in group}
        row.update({"slope": slope, "intercept": intercept, "n_points": n})
        return pd.DataFrame([row])

    return df.groupBy(*group).applyInPandas(fit, schema=out_schema)
