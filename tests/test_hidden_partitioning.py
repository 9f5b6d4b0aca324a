"""Iceberg-style hidden partitioning (snaptable partition transforms):
bucket(N, col) / truncate(W, col) / days(col) / months(col) derive the
DIRECTORY layout while the data files keep the source column — queries
filter on the raw column and manifest pruning maps the probe through
the bit-identical Python transform mirror."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sec_financial_pipeline_spark.sources import snaptable as T


def _files(spark, path, **probe):
    m = T._manifest(spark, path, None)
    return T._select_entries(m, probe.get("partitions"),
                             probe.get("between"), probe.get("point"))


def test_bucket_layout_prunes_source_column_probes(spark, tmp_path):
    path = str(tmp_path / "b")
    rows = [(i, f"u{i:04d}") for i in range(400)]
    T.create(
        spark.createDataFrame(rows, "k bigint, s string"),
        path,
        partition_cols=("bucket(8,k)",),
    )
    m = T._manifest(spark, path, None)
    dirs = {e["partition"].get("k_bucket_8") for e in m["files"]}
    assert dirs <= {str(i) for i in range(8)} and len(dirs) > 1
    # the source column stays IN the data (hidden partitioning's point)
    got = T.read(spark, path)
    assert set(got.columns) == {"k", "s"}
    assert got.count() == 400

    probe = 123
    kept = _files(spark, path, partitions={"k": probe})
    want_bucket = str(T._transform_py("bucket", 8, probe))
    assert kept and all(
        e["partition"]["k_bucket_8"] == want_bucket for e in kept
    )
    assert len(kept) < len(m["files"])
    out = T.scan(spark, path, partitions={"k": probe}).collect()
    assert [(r["k"], r["s"]) for r in out] == [(123, "u0123")]


def test_python_mirror_matches_spark_exprs(spark):
    vals = [0, 1, 7, 123, 10**12, -5]
    df = spark.createDataFrame([(v,) for v in vals], "k bigint")
    got = df.select(
        "k",
        T._transform_expr("bucket", "k", 16, "long").alias("b"),
        T._transform_expr("truncate", "k", 10, "long").alias("t"),
    ).collect()
    for r in got:
        assert r["b"] == T._transform_py("bucket", 16, r["k"])
        assert r["t"] == T._transform_py("truncate", 10, r["k"])
    sdf = spark.createDataFrame([("hello",), ("hi",), ("a:b",)], "s string")
    got = sdf.select(
        "s",
        T._transform_expr("bucket", "s", 4, "string").alias("b"),
        T._transform_expr("truncate", "s", 3, "string").alias("t"),
    ).collect()
    for r in got:
        assert r["b"] == T._transform_py("bucket", 4, r["s"])
        assert r["t"] == T._transform_py("truncate", 3, r["s"])


def test_days_transform_prunes_equality_and_ranges(spark, tmp_path):
    path = str(tmp_path / "d")
    base = dt.date(1995, 3, 1)
    rows = [
        (i, base + dt.timedelta(days=i % 10), float(i)) for i in range(200)
    ]
    T.create(
        spark.createDataFrame(rows, "k bigint, d date, v double"),
        path,
        partition_cols=("days(d)",),
    )
    m = T._manifest(spark, path, None)
    assert {e["partition"].get("d_day") for e in m["files"]} == {
        (base + dt.timedelta(days=i)).isoformat() for i in range(10)
    }
    # equality probe on the SOURCE column
    kept = _files(spark, path, partitions={"d": dt.date(1995, 3, 4)})
    assert {e["partition"]["d_day"] for e in kept} == {"1995-03-04"}
    got = T.scan(
        spark, path, partitions={"d": dt.date(1995, 3, 4)}
    ).count()
    assert got == sum(1 for _, d, _ in rows if d == dt.date(1995, 3, 4))
    # RANGE probe prunes calendar dirs lexicographically
    lo, hi = dt.date(1995, 3, 2), dt.date(1995, 3, 4)
    kept = _files(spark, path, between=("d", lo, hi))
    assert {e["partition"]["d_day"] for e in kept} == {
        "1995-03-02", "1995-03-03", "1995-03-04",
    }
    got = T.scan(spark, path, between=("d", lo, hi)).count()
    assert got == sum(1 for _, d, _ in rows if lo <= d <= hi)


def test_truncate_and_months_and_null_dirs(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = [
        ("alpha", dt.date(1995, 1, 5), 1),
        ("alps", dt.date(1995, 2, 5), 2),
        ("beta", dt.date(1995, 2, 20), 3),
        (None, None, 4),
    ]
    T.create(
        spark.createDataFrame(rows, "s string, d date, k bigint"),
        path,
        partition_cols=("truncate(3,s)", "months(d)"),
    )
    m = T._manifest(spark, path, None)
    layouts = {
        (e["partition"].get("s_trunc_3"), e["partition"].get("d_month"))
        for e in m["files"]
    }
    assert ("alp", "1995-01") in layouts and (None, None) in layouts
    # probe 'alps' -> trunc dir 'alp' only
    kept = _files(spark, path, partitions={"s": "alps"})
    assert all(e["partition"]["s_trunc_3"] == "alp" for e in kept)
    assert [r["k"] for r in T.scan(
        spark, path, partitions={"s": "alps"}
    ).collect()] == [2]
    # NULL probe matches only the NULL dir
    kept = _files(spark, path, partitions={"s": None})
    assert all(e["partition"]["s_trunc_3"] is None for e in kept)
    assert [r["k"] for r in T.scan(
        spark, path, partitions={"s": None}
    ).collect()] == [4]
    # a month WINDOW is a range probe on the source date: the month
    # dirs prune it (partitions={"d": ...} stays exact equality on d)
    lo, hi = dt.date(1995, 2, 1), dt.date(1995, 2, 28)
    kept = _files(spark, path, between=("d", lo, hi))
    # January's dir is pruned; the NULL dir is conservatively kept
    # (its rows die in scan's exact post-filter)
    assert {e["partition"]["d_month"] for e in kept} == {"1995-02", None}
    assert sorted(
        r["k"] for r in T.scan(spark, path, between=("d", lo, hi)).collect()
    ) == [2, 3]


def test_spec_evolution_identity_to_bucket_mixes_and_converges(
    spark, tmp_path
):
    path = str(tmp_path / "ev")
    T.create(
        spark.createDataFrame(
            [(i, i % 3) for i in range(60)], "k bigint, g bigint"
        ),
        path,
        partition_cols=("g",),
    )
    T.set_partition_spec(spark, path, ("bucket(4,k)",))
    T.append(
        spark.createDataFrame(
            [(i, i % 3) for i in range(60, 120)], "k bigint, g bigint"
        ),
        path,
    )
    m = T._manifest(spark, path, None)
    assert any("g" in e["partition"] for e in m["files"])
    assert any("k_bucket_4" in e["partition"] for e in m["files"])
    # a probe on k prunes NEW-layout entries; old-layout entries keep
    kept = _files(spark, path, partitions={"k": 70})
    assert len(kept) < len(m["files"])
    assert T.scan(spark, path, partitions={"k": 70}).count() == 1
    # probes on g prune OLD-layout entries symmetrically; exactness holds
    assert T.scan(spark, path, partitions={"g": 1}).count() == 40
    # compaction converges everything onto the current (bucket) spec
    T.compact(spark, path)
    m = T._manifest(spark, path, None)
    assert all("k_bucket_4" in e["partition"] for e in m["files"])
    assert T.read(spark, path).count() == 120


def test_dml_on_hidden_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "dml")
    T.create(
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], "k bigint, v double"
        ),
        path,
        partition_cols=("bucket(4,k)",),
    )
    T.delete_where(spark, path, "k % 10 = 0")
    assert T.read(spark, path).count() == 45
    T.merge_upsert(
        spark.createDataFrame([(3, 99.0), (1000, 1.0)], "k bigint, v double"),
        path,
        key_cols=["k"],
    )
    got = {r["k"]: r["v"] for r in T.read(spark, path).collect()}
    assert got[3] == 99.0 and got[1000] == 1.0
    # rewritten files land back in the bucket layout
    m = T._manifest(spark, path, None)
    assert all("k_bucket_4" in e["partition"] for e in m["files"])


def test_spec_validation_guards(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 1.5, "x", dt.date(2020, 1, 1))],
        "k bigint, f double, s string, d date",
    )
    path = str(tmp_path / "g")
    with pytest.raises(ValueError, match="int/string/date"):
        T.create(df, path, partition_cols=("bucket(4,f)",))
    with pytest.raises(ValueError, match="int/string column"):
        T.create(df, path, partition_cols=("truncate(3,d)",))
    with pytest.raises(ValueError, match="date/timestamp"):
        T.create(df, path, partition_cols=("days(k)",))
    with pytest.raises(ValueError, match="unparseable"):
        T.create(df, path, partition_cols=("bucket[4,k]",))
    with pytest.raises(ValueError, match="not a table column"):
        T.create(df, path, partition_cols=("bucket(4,zz)",))
    with pytest.raises(ValueError, match="width must be > 0"):
        T.create(df, path, partition_cols=("bucket(0,k)",))
    collider = df.withColumnRenamed("s", "k_bucket_4")
    with pytest.raises(ValueError, match="collides"):
        T.create(collider, path, partition_cols=("bucket(4,k)",))
    with pytest.raises(ValueError, match="EXISTING Hive layout"):
        T.convert_in_place(spark, path, partition_cols=("bucket(4,k)",))


def test_datasource_prunes_hidden_partitions(spark, tmp_path):
    """format('snaptable') pushes an equality filter on the SOURCE
    column through the transform mirror: only matching-bucket entries
    become input partitions, and results stay exact."""
    from sec_financial_pipeline_spark.sources.snap_datasource import (
        register_snaptable_source,
    )

    register_snaptable_source(spark)
    path = str(tmp_path / "dsb")
    T.create(
        spark.createDataFrame(
            [(i, f"u{i}") for i in range(200)], "k bigint, s string"
        ),
        path,
        partition_cols=("bucket(8,k)",),
    )
    df = spark.read.format("snaptable").load(path).filter(F.col("k") == 42)
    rows = df.collect()
    assert [(r["k"], r["s"]) for r in rows] == [(42, "u42")]


def test_identity_column_named_like_derived_dir_not_misread(
    spark, tmp_path
):
    """ADVICE r9 (medium): a REAL column whose name matches a derived
    pattern (``ts_day`` beside ``ts``), identity-partitioned, must not
    be re-interpreted as ``days(ts)`` when probing ``ts`` — its values
    are unrelated labels and the comparison wrongly pruned files."""
    path = str(tmp_path / "idd")
    rows = [
        # ts_day is a BUSINESS label, deliberately NOT days(ts)
        (1, dt.datetime(2024, 3, 15, 10, 0), "2099-01-01", 1.0),
        (2, dt.datetime(2024, 3, 15, 11, 0), "2099-01-02", 2.0),
        (3, dt.datetime(2024, 6, 1, 9, 0), "2099-01-01", 3.0),
    ]
    T.create(
        spark.createDataFrame(
            rows, "k bigint, ts timestamp, ts_day string, v double"
        ),
        path,
        partition_cols=("ts_day",),
    )
    # range probe on ts: the identity ts_day dirs must not prune
    lo, hi = dt.datetime(2024, 3, 15), dt.datetime(2024, 3, 16)
    kept = _files(spark, path, between=("ts", lo, hi))
    assert len(kept) >= 1
    assert T.scan(spark, path, between=("ts", lo, hi)).count() == 2
    # equality probe on ts: same guarantee via _partition_rules_out
    probe = dt.datetime(2024, 3, 15, 10, 0)
    assert T.scan(spark, path, partitions={"ts": probe}).count() >= 1
    # and probing the REAL identity column still prunes correctly
    assert (
        T.scan(spark, path, partitions={"ts_day": "2099-01-02"}).count()
        == 1
    )


def test_tz_aware_temporal_probe_uses_session_timezone(spark, tmp_path):
    """ADVICE r9 (low): a tz-aware probe near a day boundary must
    render in the session timezone (the writer's dir calendar), not
    its own wall-clock, or day-partition pruning drops live files."""
    from zoneinfo import ZoneInfo

    sess_tz = spark.conf.get("spark.sql.session.timeZone")
    path = str(tmp_path / "tz")
    rows = [
        (1, dt.datetime(2024, 3, 15, 15, 0), 1.0),
        (2, dt.datetime(2024, 3, 20, 12, 0), 2.0),
    ]
    T.create(
        spark.createDataFrame(rows, "k bigint, ts timestamp, v double"),
        path,
        partition_cols=("days(ts)",),
    )
    # probe instant == row 1's instant, expressed in a +14h zone whose
    # CALENDAR DAY is already Mar 16: naive rendering would look in
    # the 2024-03-16 dir and wrongly prune the 2024-03-15 file
    aware = dt.datetime(2024, 3, 15, 15, 0, tzinfo=ZoneInfo(sess_tz)).astimezone(
        dt.timezone(dt.timedelta(hours=14))
    )
    assert aware.date() != dt.date(2024, 3, 15) or sess_tz in (
        "Pacific/Kiritimati",
    )  # the repro premise: wall-clock day differs
    got = T.scan(
        spark, path, between=("ts", aware, aware)
    ).count()
    assert got == 1
    # rendering helper: aware converts to the session calendar
    assert T._temporal_iso(aware) == "2024-03-15 15:00:00"
