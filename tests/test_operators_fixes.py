"""Regression tests for operator-contract fixes (round-2 ADVICE items)."""

from pyspark.sql import functions as F

from sec_financial_pipeline_spark.operators.asof import as_of_join


def test_asof_numeric_tiebreaker_orders_natively(spark):
    # Two left rows share (key, ts); the greatest tiebreaker row must win.
    # With ids 9 and 10 a lexicographic (string) order would pick 9.
    left = spark.createDataFrame(
        [("k", 100, 9, "from_id_9"), ("k", 100, 10, "from_id_10")],
        "key string, ts int, row_id int, payload string",
    )
    right = spark.createDataFrame(
        [("k", 150, 1)], "key string, ts int, event int"
    )
    out = as_of_join(
        left,
        right,
        on=["key"],
        left_time="ts",
        right_time="ts",
        value_cols=["payload"],
        left_tiebreakers=["row_id"],
    ).collect()
    assert len(out) == 1
    assert out[0]["payload"] == "from_id_10"


def test_metric_series_total_order_is_deterministic(spark):
    # plans.analytics.metric_series must break (priority, |value|, end_date)
    # ties by fact_id: rows identical up to sign used to be nondeterministic.
    from sec_financial_pipeline_spark.plans.analytics import metric_series

    facts = spark.createDataFrame(
        [
            ("T00", "Revenues", "USD", 2000, None, "2000-12-31", None, 1, -5.0, "10-K", "Revenues", 1),
            ("T00", "Revenues", "USD", 2000, None, "2000-12-31", None, 2, 5.0, "10-K", "Revenues", 1),
        ],
        "ticker string, tag string, unit string, fiscal_year int, fiscal_period string, "
        "end_date string, instant_date string, fact_id long, value double, form string, "
        "label string, cik int",
    )
    alias_map = spark.createDataFrame(
        [("Revenues", "revenue", 0)], "tag string, metric string, priority int"
    )
    for n_part in (1, 7):
        rows = (
            metric_series(facts.repartition(n_part), alias_map, "revenue")
            .select("ticker", "fiscal_year", "value")
            .collect()
        )
        assert [r["value"] for r in rows] == [-5.0], rows


def test_kmeans_lloyd_converges_and_is_deterministic(spark):
    # Two well-separated groups; seeds start inside each group. One
    # iteration must land centroids on the group means; assignment must
    # be identical under different partitioning.
    from pyspark.sql import functions as F

    from sec_financial_pipeline_spark.operators import kmeans
    from sec_financial_pipeline_spark.operators import similarity as S

    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [1.1, -0.1]),
        (3, [0.0, 1.0]), (4, [0.1, 0.9]), (5, [-0.1, 1.1]),
    ]
    for n_part in (1, 5):
        e = (
            spark.createDataFrame(rows, "vec_id long, emb array<double>")
            .repartition(n_part)
            .withColumn("nrm", S.norm(F.col("emb")))
        )
        seeds = e.filter(F.col("vec_id").isin(0, 3)).select(
            F.col("vec_id").cast("int").alias("cluster"),
            F.col("emb").alias("cvec"),
            F.col("nrm").alias("c_nrm"),
        )
        cents = {r.cluster: r.cvec for r in kmeans.lloyd(e, seeds, 1).collect()}
        assert cents[0] == [1.0, 0.0]  # mean of group A, exact decimals
        assert cents[3] == [0.0, 1.0]
        assign = kmeans.assign_clusters(e, kmeans.lloyd(e, seeds, 2))
        got = {r.vec_id: r.cluster for r in assign.collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
