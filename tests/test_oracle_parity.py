"""Operator-by-operator parity against the DuckDB oracle — a local mirror
of the driver's correctness gate (row count + schema width + values).

Comparison is stricter than the driver's: rows are fully sorted and every
cell compared (exact for non-floats, 1e-9 relative for floats). Queries
registered without an oracle get a determinism check instead (two runs,
identical results).
"""

from __future__ import annotations

import math

import pytest

from sec_financial_pipeline_spark.registry import all_queries

QUERIES = all_queries()


def _canon(x):
    """Canonicalize a cell: midnight datetimes == dates (DuckDB's pandas
    fetch renders DATE as datetime64; Spark yields datetime.date)."""
    import datetime as dt

    if hasattr(x, "to_pydatetime"):
        x = x.to_pydatetime()
    if isinstance(x, dt.datetime) and x.time() == dt.time(0, 0):
        return str(x.date())
    return str(x)


def _normalize(df):
    """pandas frame -> (sorted column names, sorted row tuples)."""
    cols = sorted(df.columns)
    out = df[cols]
    rows = [tuple(r) for r in out.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, _canon(x)) for x in r))
    return cols, rows


def _cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    # The driver hashes rendered values exactly, so a numeric cell on one
    # side and a string on the other ('4.0' vs '4') is a REAL mismatch —
    # never coerce a str through float() to excuse it.
    if isinstance(a, str) != isinstance(b, str):
        return False
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return _canon(a) == _canon(b)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, duck, sf_dir):
    q = QUERIES[name]
    got = q.fn(spark, sf_dir).toPandas()
    got = got.astype(object).where(got.notna(), None)

    if q.oracle is None:
        again = q.fn(spark, sf_dir).toPandas()
        again = again.astype(object).where(again.notna(), None)
        assert _normalize(got) == _normalize(again), f"{name}: nondeterministic"
        return

    want = duck.execute(q.oracle).fetchdf()
    want = want.astype(object).where(want.notna(), None)

    got_cols, got_rows = _normalize(got)
    want_cols, want_rows = _normalize(want)

    assert [c.lower() for c in got_cols] == [
        c.lower() for c in want_cols
    ], f"{name}: column mismatch {got_cols} vs {want_cols}"
    assert len(got_rows) == len(want_rows), (
        f"{name}: row count {len(got_rows)} vs oracle {len(want_rows)}"
    )
    bad = []
    for i, (g, w) in enumerate(zip(got_rows, want_rows)):
        if not all(_cell_eq(a, b) for a, b in zip(g, w)):
            bad.append((i, g, w))
            if len(bad) >= 3:
                break
    assert not bad, f"{name}: value mismatches (first 3): {bad}"


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert df.columns == ["ticker", "fiscal_year", "tag", "value"]


def test_registry_consistency():
    import __spark_entry__ as E

    qs = E.queries()
    os_ = E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(QUERIES)


def test_editdist_oracle_non_ascii_divergence(spark, duck):
    """Pins the byte-vs-codepoint disagreement that bounds the editdist
    oracle's validity (ADVICE r11): DuckDB levenshtein counts BYTES
    ('é' is 2 in UTF-8), Spark counts CODEPOINTS. The fuzzy-dedup
    oracle parity is therefore ASCII-only; if the corpus ever gains
    non-ASCII text this test is the loud documentation of why the
    oracle would diverge (and the row's SQL must switch to a
    codepoint-safe distance)."""
    s_val = spark.sql("SELECT levenshtein('é', 'a') AS d").collect()[0]["d"]
    d_val = duck.execute("SELECT levenshtein('é', 'a') AS d").fetchone()[0]
    assert s_val == 1  # codepoint-based
    assert d_val == 2  # byte-based (UTF-8 'é' = 2 bytes)
    # and agreement on pure ASCII — the regime the oracle relies on
    s_a = spark.sql("SELECT levenshtein('kitten','sitting') AS d").collect()[0]["d"]
    d_a = duck.execute("SELECT levenshtein('kitten','sitting')").fetchone()[0]
    assert s_a == d_a == 3
