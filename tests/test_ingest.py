"""Ingest-path tests (SURVEY §2.1 S2/S3/S4, §3.2) on local fixtures —
no network, mirroring FIXTURES.md §B3/§B4."""

from __future__ import annotations

import json

import pytest

COMPANYFACTS = {
    "cik": 320193,
    "entityName": "Example Corp A",
    "facts": {
        "us-gaap": {
            "Revenues": {
                "label": "Revenues, Total",
                "description": "Total revenue",
                "units": {
                    "USD": [
                        {
                            "val": 100.0,
                            "start": "2022-01-01",
                            "end": "2022-12-31",
                            "fy": 2022,
                            "fp": "FY",
                            "form": "10-K",
                            "frame": "CY2022",
                        },
                        {
                            "val": 55.0,
                            "start": "2022-01-01",
                            "end": "2022-06-30",
                            "fy": 2022,
                            "fp": "Q2",
                            "form": "10-Q",
                            "frame": None,
                        },
                        {
                            # malformed date -> tolerant parse -> NULL
                            "val": 7.0,
                            "start": "not-a-date",
                            "end": "also-bad",
                            "fy": 2021,
                            "fp": "FY",
                            "form": "10-K",
                            "frame": None,
                        },
                    ],
                    "shares": [
                        {
                            "val": 16.0,
                            "end": "2022-12-31",
                            "fy": 2022,
                            "fp": "FY",
                            "form": "10-K",
                            "frame": None,
                        }
                    ],
                },
            },
            "Assets": {
                "label": "Assets, Total",
                "description": None,
                "units": {
                    "USD": [
                        {
                            "val": 500.0,
                            "instant": "2022-12-31",
                            "fy": 2022,
                            "fp": "FY",
                            "form": "10-K/A",
                            "frame": None,
                        }
                    ]
                },
            },
        },
        "dei": {
            "EntityCommonStockSharesOutstanding": {
                "label": "Shares Outstanding",
                "description": None,
                "units": {
                    "shares": [
                        {
                            "val": 16000.0,
                            "instant": "2022-12-31",
                            "fy": 2022,
                            "fp": "FY",
                            "form": "10-Q",
                            "frame": None,
                        }
                    ]
                },
            }
        },
    },
}

TICKERS_INDEXED = {
    "0": {"cik_str": 320193, "ticker": "exa", "title": "Example Corp A"},
    "1": {"cik_str": 789019, "ticker": "EXB", "title": "Example Corp B"},
}

TICKERS_FIELDS = {
    "fields": ["cik", "ticker", "title"],
    "data": [[320193, "EXA", "Example Corp A"], [789019, "exb", "Example Corp B"]],
}


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest")
    (d / "companyfacts.json").write_text(json.dumps(COMPANYFACTS))
    (d / "tickers_indexed.json").write_text(json.dumps(TICKERS_INDEXED))
    (d / "tickers_fields.json").write_text(json.dumps(TICKERS_FIELDS))
    return d


def test_flatten_companyfacts(spark, fixture_dir):
    from sec_financial_pipeline_spark.sources.companyfacts import (
        flatten_companyfacts,
        read_companyfacts_json,
    )

    raw = read_companyfacts_json(spark, str(fixture_dir / "companyfacts.json"))
    facts = flatten_companyfacts(raw)
    rows = {
        (r.taxonomy, r.tag, r.unit, r.fiscal_period, r.value): r
        for r in facts.collect()
    }
    # 6 entries across taxonomies/tags/units
    assert len(rows) == 6
    fy = rows[("us-gaap", "Revenues", "USD", "FY", 100.0)]
    assert fy.cik == "0000320193"  # zero-padded
    assert str(fy.end_date) == "2022-12-31"
    assert fy.form_type == "10-K"
    # malformed dates -> NULL, row preserved
    bad = rows[("us-gaap", "Revenues", "USD", "FY", 7.0)]
    assert bad.start_date is None and bad.end_date is None
    # instant fact: instant_date set, start/end NULL
    assets = rows[("us-gaap", "Assets", "USD", "FY", 500.0)]
    assert str(assets.instant_date) == "2022-12-31" and assets.start_date is None
    assert assets.form_type == "10-K"  # 10-K/A canonicalized
    # dei taxonomy survives the explode
    assert ("dei", "EntityCommonStockSharesOutstanding", "shares", "FY", 16000.0) in rows


def test_flatten_with_ticker_join(spark, fixture_dir):
    from sec_financial_pipeline_spark.sources.companyfacts import (
        flatten_companyfacts,
        read_companyfacts_json,
    )
    from sec_financial_pipeline_spark.sources.tickers import read_tickers_indexed

    raw = read_companyfacts_json(spark, str(fixture_dir / "companyfacts.json"))
    dim = read_tickers_indexed(spark, str(fixture_dir / "tickers_indexed.json"))
    facts = flatten_companyfacts(raw, ticker_dim=dim)
    assert set(r.ticker for r in facts.collect()) == {"EXA"}


def test_ticker_formats_agree(spark, fixture_dir):
    from sec_financial_pipeline_spark.sources.tickers import (
        read_tickers_fields,
        read_tickers_indexed,
    )

    a = read_tickers_indexed(spark, str(fixture_dir / "tickers_indexed.json"))
    b = read_tickers_fields(spark, str(fixture_dir / "tickers_fields.json"))
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb == [
        ("0000320193", "EXA", "Example Corp A"),
        ("0000789019", "EXB", "Example Corp B"),
    ]


def test_partitioned_sink_roundtrip(spark, fixture_dir, tmp_path):
    from sec_financial_pipeline_spark.sources.companyfacts import (
        flatten_companyfacts,
        read_companyfacts_json,
    )
    from sec_financial_pipeline_spark.sources.sink import write_facts

    raw = read_companyfacts_json(spark, str(fixture_dir / "companyfacts.json"))
    facts = flatten_companyfacts(raw)
    out = str(tmp_path / "facts")
    write_facts(facts, out)
    back = spark.read.parquet(out)
    assert back.count() == facts.count()
    # partition pruning: only the fy=2022 directory is read
    pruned = back.filter("fiscal_year = 2021")
    assert pruned.count() == 1
    plan = pruned.explain(mode="formatted") or ""


def test_serving_edge_sinks(spark, fixture_dir):
    from sec_financial_pipeline_spark.sources.companyfacts import (
        flatten_companyfacts,
        read_companyfacts_json,
    )
    from sec_financial_pipeline_spark.sources.sink import (
        to_csv_bytes,
        to_json_records,
        to_parquet_bytes,
    )

    raw = read_companyfacts_json(spark, str(fixture_dir / "companyfacts.json"))
    facts = flatten_companyfacts(raw).select("tag", "unit", "value", "fiscal_year")
    csv = to_csv_bytes(facts).decode()
    assert csv.splitlines()[0] == "tag,unit,value,fiscal_year"
    assert len(csv.splitlines()) == 7

    import io

    import pandas as pd

    pq = pd.read_parquet(io.BytesIO(to_parquet_bytes(facts)))
    assert len(pq) == 6

    recs = to_json_records(facts)
    assert len(recs) == 6 and {"tag", "unit", "value", "fiscal_year"} <= set(recs[0])
