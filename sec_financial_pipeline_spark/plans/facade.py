"""Thin serving façade over the engine — the reference's API surface
(``reference/src/api/main.py:105-233``: per-ticker facts, metric series,
multi-company compare) expressed as plain functions: validate -> result
cache -> engine plan -> serving-edge sink.

Deliberately framework-free: the reference wraps these in FastAPI route
handlers; the engine contract is the function signature, so any HTTP/MCP
layer (or none) can mount them. Results are *collected* bounded payloads
(the reference's endpoints serve single-company series and small
comparisons), so caching stores materialized values — a cached DataFrame
would re-execute its plan on every hit.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.plans import analytics, domain
from sec_financial_pipeline_spark.plans.serving import (
    ResultCache,
    cache_key,
    validate_ticker,
)
from sec_financial_pipeline_spark.sources import sink


class ServingFacade:
    """Endpoint semantics of the reference API over the Spark engine.

    One instance per process; holds the TTL+LRU result cache
    (``reference/src/api/cache.py``) and the session/table handles.
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        cache: ResultCache | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.cache = cache if cache is not None else ResultCache()

    # -- engine plans (lazy DataFrames) -----------------------------------

    def _facts(self) -> DataFrame:
        return domain.facts_df(self.spark, self.sf_dir)

    def _series_df(self, ticker: str, metric: str) -> DataFrame:
        series = analytics.metric_series(
            self._facts(), domain.alias_df(self.spark), metric
        )
        return series.filter(F.col("ticker") == ticker).orderBy("fiscal_year")

    # -- endpoints --------------------------------------------------------

    def company_facts(self, ticker: str) -> dict[str, Any]:
        """GET /financials/{ticker} — all facts for one company
        (``main.py:105-144``)."""
        t = validate_ticker(ticker)
        key = cache_key(endpoint="facts", ticker=t)
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        rows = sink.to_json_records(
            self._facts()
            .filter(F.col("ticker") == t)
            .orderBy("fiscal_year", "tag", "fact_id")
        )
        out = {"ticker": t, "n_facts": len(rows), "facts": rows}
        self.cache.put(key, out, tickers=(t,))
        return out

    def metric_series(
        self, ticker: str, metric: str, fmt: str = "json", years: int | None = None
    ) -> dict[str, Any] | bytes:
        """GET /financials/{ticker}/{metric}?format=&years= — one
        metric's annual series, JSON / CSV / parquet download
        (``main.py:146-186``, ``data_service.py:188-299``).

        ``years`` clips to the N most recent fiscal years PRESENT for
        the ticker (the reference anchors to the wall-clock year,
        ``data_service.py:180-185`` — nondeterministic on a fixed
        corpus, so the engine serves the same last-N contract from the
        data itself). Bounds 1..20 as the reference's Query(ge=1, le=20).
        """
        t = validate_ticker(ticker)
        if years is not None and not 1 <= years <= 20:
            raise ValueError(f"years must be in 1..20, got {years}")
        key = cache_key(endpoint="series", ticker=t, metric=metric, fmt=fmt, years=years)
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        df = self._series_df(t, metric)
        if years is not None:
            df = (
                df.orderBy(F.col("fiscal_year").desc())
                .limit(years)
                .orderBy("fiscal_year")
            )
        if fmt == "csv":
            out: dict[str, Any] | bytes = sink.to_csv_bytes(df)
        elif fmt == "parquet":
            out = sink.to_parquet_bytes(df)
        elif fmt == "json":
            rows = sink.to_json_records(df)
            out = {"ticker": t, "metric": metric, "n_periods": len(rows), "series": rows}
        else:
            raise ValueError(f"unsupported format: {fmt!r}")
        self.cache.put(key, out, tickers=(t,))
        return out

    def compare(self, tickers: Sequence[str], metric: str) -> dict[str, Any]:
        """GET /compare?tickers=&metric= — year x ticker alignment
        (``main.py:188-233``)."""
        ts = tuple(validate_ticker(t) for t in tickers)
        key = cache_key(endpoint="compare", tickers=ts, metric=metric)
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        wide = analytics.compare_companies(
            self._facts(), domain.alias_df(self.spark), metric, list(ts)
        ).orderBy("fiscal_year")
        rows = sink.to_json_records(wide)
        out = {"metric": metric, "tickers": list(ts), "rows": rows}
        self.cache.put(key, out, tickers=ts)
        return out

    def invalidate(self, ticker: str) -> int:
        """Ingest hook: drop every cached result involving ``ticker``
        (``cache.py:242-254``) — called after a merge/refresh lands."""
        return self.cache.invalidate_ticker(validate_ticker(ticker))

    # -- data-management endpoints (main.py:235-300, 373-408) -------------

    def tickers_overview(self, sample: int = 50) -> dict[str, Any]:
        """GET /data/tickers — every ticker plus a bounded freshness
        sample (the reference samples its first 50, ``main.py:244``)."""
        key = cache_key(endpoint="tickers", sample=sample)
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        from sec_financial_pipeline_spark.operators.aggregates import (
            freshness_watermark,
        )

        fresh = freshness_watermark(
            self._facts().filter(F.col("fiscal_year").isNotNull()),
            ["ticker"],
            ["end_date", "instant_date"],
            "fiscal_year",
        ).orderBy("ticker")
        rows = fresh.collect()
        out = {
            "total_tickers": len(rows),
            "tickers": [r["ticker"] for r in rows],
            "freshness_sample": {
                r["ticker"]: {
                    "last_updated": str(r["latest_date"]),
                    "covered_periods": r["covered_periods"],
                    "n_facts": r["n_facts"],
                }
                for r in rows[:sample]
            },
        }
        self.cache.put(key, out)
        return out

    def ticker_info(self, ticker: str) -> dict[str, Any]:
        """GET /data/ticker/{t}/info — freshness + backing-file stats
        (``main.py:264-300``). Raises ``KeyError`` (-> 404) when the
        engine has no facts for the ticker. On Spark the catalog IS the
        filesystem: files come from the ``_metadata`` column of the
        dataset that derives the facts, not a side ledger."""
        t = validate_ticker(ticker)
        key = cache_key(endpoint="ticker_info", ticker=t)
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        from sec_financial_pipeline_spark.operators.aggregates import (
            freshness_watermark,
        )
        from sec_financial_pipeline_spark.sources.catalog import file_inventory

        fresh = (
            freshness_watermark(
                self._facts().filter(
                    (F.col("ticker") == t) & F.col("fiscal_year").isNotNull()
                ),
                ["ticker"],
                ["end_date", "instant_date"],
                "fiscal_year",
            ).collect()
        )
        if not fresh:
            raise KeyError(f"No data found for {t}")
        r = fresh[0]
        files = file_inventory(
            self.spark, f"{self.sf_dir}/orders.parquet"
        ).orderBy("file_path").collect()
        out = {
            "ticker": t,
            "data_freshness": {
                "last_updated": str(r["latest_date"]),
                "covered_periods": r["covered_periods"],
                "n_facts": r["n_facts"],
            },
            "files": [
                {
                    "file_path": f["file_path"],
                    "file_size_mb": round(f["file_size"] / (1024 * 1024), 2),
                    "record_count": f["n_rows"],
                }
                for f in files
            ],
            "total_files": len(files),
            "total_records": sum(f["n_rows"] for f in files),
        }
        self.cache.put(key, out, tickers=(t,))
        return out

    def storage_overview(self) -> dict[str, Any]:
        """GET /storage/stats — per-table file/byte/row rollup over the
        engine's datasets (``data_manager.py:426-447``)."""
        key = cache_key(endpoint="storage")
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        from sec_financial_pipeline_spark.schemas import TESTDATA_TABLES
        from sec_financial_pipeline_spark.sources.catalog import storage_stats

        tables = {}
        for t in TESTDATA_TABLES:
            s = storage_stats(self.spark, f"{self.sf_dir}/{t}.parquet").collect()[0]
            tables[t] = {
                "n_files": s["n_files"],
                "total_bytes": s["total_bytes"],
                "total_rows": s["total_rows"],
            }
        out = {
            "tables": tables,
            "total_files": sum(v["n_files"] for v in tables.values()),
            "total_bytes": sum(v["total_bytes"] for v in tables.values()),
            "total_rows": sum(v["total_rows"] for v in tables.values()),
        }
        self.cache.put(key, out)
        return out
