from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SFP_TEST_SF_DIR", "/root/testdata/sf0.01")

# AQE stays ON in tests (production parity): A/B-measured, its
# tiny-shuffle task coalescing beats the per-materialized-stage job
# overhead on compute-shaped files (sketches 29s vs 33s) and is a wash
# on DML-shaped ones. SFP_AQE=off remains available in session.get_spark
# for experiments.

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _install_fast_create_dataframe(s):
    """Route list-of-tuples createDataFrame through the Arrow/pandas
    path: the classic path materializes a PYTHON-worker-backed RDD, so
    EVERY downstream action on that input pays ~250ms of worker
    dispatch on this box, while the Arrow path ships the rows as JVM
    local data once (~5ms per action after that). With 257 call sites
    feeding most of the suite's actions this is the difference between
    a 28-minute and a sub-15-minute gate.

    Semantics are preserved, not assumed: object-dtype Series keep
    None as SQL NULL in every column type (pinned with timestamps,
    decimals, arrays, unicode and 2^62 longs by
    tests/test_conftest_shim.py, which compares against the classic
    path row-for-row); Arrow fallback is DISABLED on the session so a
    shape Arrow can't convert raises and this wrapper retries on the
    CLASSIC path — never Spark's internal non-Arrow pandas fallback,
    whose null handling differs. Genuine NaN literals (Arrow would
    null them; the classic path keeps NaN) and non-tuple rows (Rows,
    dicts, nested structs) also take the classic path."""
    import pandas as pd
    from pyspark.sql.types import StructType

    orig = s.createDataFrame

    def fast(data=None, schema=None, **kw):
        if (
            not kw
            and isinstance(data, list)
            and data
            and isinstance(schema, (str, StructType))
            and all(type(r) in (tuple, list) for r in data)
        ):
            try:
                ncol = len(data[0])
                ok = all(len(r) == ncol for r in data) and not any(
                    isinstance(c, float) and c != c  # NaN
                    or isinstance(c, (tuple, dict))  # struct/map cells
                    for r in data
                    for c in r
                )
                if ok:
                    pdf = pd.DataFrame(
                        {
                            i: pd.Series([r[i] for r in data], dtype=object)
                            for i in range(ncol)
                        }
                    )
                    return orig(pdf, schema)
            except Exception:
                pass  # anything Arrow refuses -> classic path below
        if schema is not None:
            return orig(data, schema, **kw)
        return orig(data, **kw)

    s.createDataFrame = fast
    return s


@pytest.fixture(scope="session")
def spark():
    from sec_financial_pipeline_spark.session import get_spark

    s = get_spark(app_name="sfp-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", 8))
    # a failed Arrow conversion must RAISE (and be retried classic by
    # the shim), not silently take Spark's non-Arrow pandas fallback
    s.conf.set("spark.sql.execution.arrow.pyspark.fallback.enabled", "false")
    # skip janino compilation: the suite runs thousands of UNIQUE tiny
    # plans exactly once each, so whole-stage codegen pays ~110ms of
    # compile per query (A/B-measured) and never amortizes; interpreted
    # execution is semantically identical (it is Spark's own compile-
    # failure fallback) and the driver-sim/oracle gate still runs the
    # engine under default codegen, so codegen-path coverage is not lost
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    _install_fast_create_dataframe(s)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
