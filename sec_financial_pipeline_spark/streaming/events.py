"""Structured Streaming operators over the events stream (SURVEY §2.7).

The reference has no true streaming — only incremental batch. The north
star adds it: watermarked tumbling/sliding windows and session windows
over a timestamped event stream. Batch twins of these (same logical
windows, oracle-checked) live in ``registry/events.py``; here are the
``readStream`` pipelines, exercised in tests with the file source +
``processAllAvailable`` (synchronous drain, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: events table schema with ts pre-converted to TIMESTAMP (the raw
#: parquet stores TIMESTAMP(NANOS); for the streaming source we read a
#: converted copy written by the caller/test).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    """File-source stream: bounded files-per-trigger keeps micro-batches
    sized (the ``maxOffsetsPerTrigger`` analog, reference rate-limit T5)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation: late events
    beyond ``watermark`` are dropped and state is bounded — the property
    the reference's TTL cache sweep approximates for serving
    (``cache.py:168-193``) but never had for data."""
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def windowed_hll_registers(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "2 hours",
    b: int = 6,
) -> DataFrame:
    """Streaming distinct-user sketch: HyperLogLog registers per
    (window, event_type) as a NATIVE watermarked aggregation — the
    register update is ``max(rho)``, which Structured Streaming
    supports in append mode with bounded state, so the sketch streams
    and merges for free (operators/sketches.py builds the identical
    registers in batch; the twin-equality is the test). Exact
    ``count_distinct`` is NOT available as a streaming agg without
    keeping every user id in state — this is the textbook case for the
    sketch: state per group is <= 2^b integers, period.

    The sink-side estimate (alpha * m^2 / (zeros + sum 2^-M)) runs on
    the <= 2^b register rows per group — trivially cheap wherever the
    query's results land."""
    from sec_financial_pipeline_spark.operators.sketches import hll_rho

    bucket, rho = hll_rho(F.col("user_id"), b)
    return (
        events.withWatermark("ts", watermark)
        .select("ts", "event_type", bucket, rho)
        .groupBy(F.window("ts", window).alias("w"), "event_type", "bucket")
        .agg(F.max("rho").alias("M"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "bucket",
            "M",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (gap-based) — the streaming twin of the batch
    ``evt_sessionize`` registry query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total, emitted on every update. The
    state (two numbers per user) is bounded and survives across
    micro-batches — the shape for arbitrary per-key online aggregates
    that built-in windowed aggs can't express."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact-dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for older keys is
    evicted. The streaming twin of the batch exact-dedup operator
    (north-star dedup family at ingest time)."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete") -> None:
    """Drain a bounded file-source stream synchronously into an
    in-memory table (test/verification harness).

    Default ``complete`` mode: with a bounded source the watermark never
    passes the last window, so ``append`` would hold every window in
    state and emit nothing — complete emits the final aggregates.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def campaign_attribution_join(
    events: DataFrame,
    value_threshold: float = 200.0,
    window: str = "2 hours",
    bucket_seconds: int = 3600,
    watermark: str = "4 hours",
) -> DataFrame:
    """Stream-stream interval join: high-value purchases open a
    ``window``-long attribution window; every event landing inside one is
    joined to it. The streaming twin of the batch ``evt_range_join``
    query (operators/rangejoin.py), via a self-join of the event stream.

    Scale design: the raw predicate is a pure inequality, which would
    leave the join's state store un-keyed (every micro-batch probes ALL
    buffered rows). The same bucket rewrite as the batch operator —
    points map to ``floor(epoch/width)``, windows explode to covered
    buckets — gives the join an EQUI key, so state is hash-partitioned
    by bucket and each probe touches one partition. Both sides carry
    event-time watermarks and the join condition bounds ``p_ts`` to
    ``[w_start, w_start + window)``, so Spark evicts buffered rows once
    the watermark passes — bounded state, the property that lets this
    run forever.
    """
    camp = (
        events.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") >= F.lit(value_threshold))
        )
        .select(
            F.col("event_id").alias("campaign_id"),
            F.col("ts").alias("w_start"),
        )
        .withColumn(
            "c_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp("w_start") / F.lit(bucket_seconds)),
                    F.floor(
                        F.unix_timestamp(
                            F.col("w_start") + F.expr(f"INTERVAL {window}")
                        )
                        / F.lit(bucket_seconds)
                    ),
                )
            ),
        )
        .withWatermark("w_start", watermark)
    )
    pts = (
        events.select(
            F.col("event_id").alias("p_event_id"),
            F.col("ts").alias("p_ts"),
            F.col("user_id").alias("p_user"),
            F.col("value").alias("p_value"),
        )
        .withColumn(
            "p_bucket", F.floor(F.unix_timestamp("p_ts") / F.lit(bucket_seconds))
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("p_bucket") == F.col("c_bucket"))
        & (F.col("p_ts") >= F.col("w_start"))
        & (F.col("p_ts") < F.col("w_start") + F.expr(f"INTERVAL {window}"))
        & (F.col("p_event_id") != F.col("campaign_id"))
    )
    return pts.join(camp, cond, "inner").select(
        "campaign_id", "p_event_id", "p_user", "p_value", "p_ts", "w_start"
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str, dim_cols: list[str]
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to
    every event. Stateless — the static side is broadcast into each
    micro-batch (re-resolved per batch, so a refreshed dim table is
    picked up without restarting the query), no watermark or join state
    involved. Left join: events with no dim row pass through with
    nulls rather than silently dropping."""
    return events.join(
        F.broadcast(dim.select(on, *dim_cols)), on, "left"
    )


def stateful_sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session ASSEMBLY as a custom stateful operator —
    ``applyInPandasWithState`` with **EventTimeTimeout**, the pattern
    the built-in ``session_window`` aggregate cannot generalize (here
    the emitted row is a reduction the engine knows, but the same
    skeleton carries arbitrary per-session state: event paths, carts,
    fraud features). State per user = the one OPEN session
    ``(start_us, end_us, n)``; a batch's events fold in sorted order,
    closing-and-emitting a session whenever the gap is exceeded
    (mirroring the batch ``evt_sessionize`` lag+running-sum
    semantics: a new session starts strictly beyond ``gap_sec``).

    The WATERMARK drives the rest: after folding, the state's timeout
    is set to ``session_end + gap``; once the event-time watermark
    passes it, no event can ever extend the session (anything earlier
    is late beyond the watermark by definition), so the timeout
    callback emits it and evicts the state — bounded state over an
    unbounded key space, with emission exactly as early as
    correctness allows. Output mode: append (rows are CLOSED
    sessions; n_events/session bounds are final).

    Ordering contract (documented, tested): exact when each user's
    events arrive in ts order ACROSS micro-batches (in-batch disorder
    is sorted away); a cross-batch late event older than the open
    session's end would mis-fold — the price every incremental
    sessionizer pays short of buffering the full watermark window."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("end_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    gap_us = gap_sec * 1_000_000

    def update(key, pdfs, state: GroupState):
        uid = key[0]
        closed = []

        def emit(s_us, e_us, n):
            closed.append(
                (uid, n, pd.Timestamp(s_us, unit="us"),
                 pd.Timestamp(e_us, unit="us"))
            )

        if state.hasTimedOut:
            # watermark passed end+gap: the open session is final
            s_us, e_us, n = state.get
            emit(s_us, e_us, n)
            state.remove()
        else:
            cur = state.get if state.exists else None
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(["ts", "event_id"])
            for ts in rows["ts"]:
                t_us = ts.value // 1000  # pandas ns -> us
                if cur is None:
                    cur = (t_us, t_us, 1)
                elif t_us - cur[1] > gap_us:
                    emit(*cur)
                    cur = (t_us, t_us, 1)
                else:
                    cur = (cur[0], max(cur[1], t_us), cur[2] + 1)
            state.update(cur)
            # the open session dies when the watermark passes end+gap
            # (strictly-greater gap rule -> +1us past the boundary);
            # clamp above the current watermark — Spark rejects
            # timeouts at or below it
            state.setTimeoutTimestamp(
                max(
                    (cur[1] + gap_us) // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "n_events", "session_start",
                         "session_end"],
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
