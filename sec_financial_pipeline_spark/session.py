"""SparkSession factory.

Local-mode defaults are tuned for the test environment (single JVM,
``local[$SPARK_GRAFT_CPUS]``), but every setting here is the one you
would also want on a real cluster at 100 TB:

- AQE on (runtime re-planning, partition coalescing, skew-join handling);
- Arrow on (vectorized pandas interchange for the few Pandas-UDF paths);
- session timezone pinned to UTC (parquet timestamps are naive; keeps
  semantics identical to the DuckDB oracle and to any other engine);
- shuffle partitions sized to the core count locally — on a cluster this
  would be ~2-3x total executor cores, and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "sec_financial_pipeline_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    ui: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-sane defaults.
    ``ui=True`` enables the Spark UI so its REST status API can serve
    deterministic plan metrics (job/stage/task counts, shuffle and
    input bytes) — bench.py uses it; tests keep it off for speed."""
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, int(cpus))
        except (TypeError, ValueError):
            shuffle_partitions = 32
    driver_memory = driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "16g")

    # AQE is the production default (runtime coalescing + skew joins are
    # exactly what a 100 TB shuffle needs). On kilobyte-scale unit-test
    # data it buys nothing and COSTS a lot of wall: every materialized
    # shuffle stage becomes its own scheduled job (a 4-exchange plan =
    # ~5 jobs instead of 1), and the suite's wall time is almost pure
    # job-scheduling latency. SFP_AQE=off lets the test/CI entrypoint
    # opt out; semantics are identical by construction (the repo is
    # partition-layout-deterministic — tests/test_determinism.py).
    aqe = os.environ.get("SFP_AQE", "on").lower() != "off"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true" if aqe else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "true" if ui else "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
