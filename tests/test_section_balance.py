"""Section row-count balance audit (VERDICT r9 item 9).

Several driver rows are section-tagged unions of constituent operators
(``registry/merge.py``). A constituent whose result set silently went
EMPTY would still hash-match its (equally empty) oracle section, so the
merged row could go green while an operator stopped producing rows —
a mismatch that would not localize. This audit pins, for every merged
row, that each DECLARED section contributes at least one row at the
test scale factor.

The check runs on the ORACLE side (DuckDB — milliseconds per row):
``tests/test_oracle_parity.py`` already proves the Spark result set
equals the oracle result set cell-for-cell, so oracle-side section
counts >= 1 imply Spark-side section counts >= 1. Declared sections are
parsed from the oracle SQL itself (``'tag' AS section`` — the exact
projection :func:`merge.pad_section_sql` emits), so a section added to
the Spark union but forgotten in the oracle (or vice versa) surfaces
here as a declared/observed set mismatch.
"""

from __future__ import annotations

import re

import pytest

from sec_financial_pipeline_spark.registry import all_queries

_TAG = re.compile(r"'([A-Za-z0-9_]+)'\s+AS\s+section", re.IGNORECASE)

QUERIES = all_queries()
MERGED = sorted(
    name
    for name, q in QUERIES.items()
    if q.oracle is not None and _TAG.search(q.oracle)
)


def test_merged_rows_discovered():
    # the consolidation pattern is load-bearing (registry window = 50);
    # if this list collapses, the audit itself has gone blind
    assert len(MERGED) >= 8, MERGED


@pytest.mark.parametrize("name", MERGED)
def test_every_section_contributes_rows(name, duck):
    declared = set(_TAG.findall(QUERIES[name].oracle))
    assert declared, f"{name}: no declared sections parsed"
    counts = dict(
        duck.execute(
            f"SELECT section, count(*) FROM ({QUERIES[name].oracle}) "
            "GROUP BY section"
        ).fetchall()
    )
    assert set(counts) == declared, (
        f"{name}: declared sections {sorted(declared)} but observed "
        f"{sorted(counts)} — a section produced zero rows or the "
        f"Spark/oracle section lists diverged"
    )
    empty = sorted(s for s, n in counts.items() if n < 1)
    assert not empty, f"{name}: empty sections {empty}"
