"""Multimodal column plumbing (SURVEY §2.9 / north star).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus a typed metadata struct — the schema, partitioning, and
Arrow-batched UDF shapes are real and tested; the actual codec calls are
stubbed (no image/audio libraries in this environment) behind
deterministic fakes / ``NotImplementedError`` so the Spark-side plumbing
is verifiable end-to-end.

Design for 100 TB: payload bytes never pass through a shuffle — derive
features first (mapInPandas over the scan partition), shuffle only the
small feature/metadata columns. ``spark.sql.files.maxPartitionBytes``
bounds per-task memory since one row can be megabytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("payload_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image(payload: bytes) -> list[float]:
    """STUB — real implementation would decode via PIL/libvips and
    produce an embedding. Deterministic fake: 8 byte-histogram buckets
    normalized by length (so tests have stable expected values)."""
    if payload is None:
        return []
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    n = max(1, len(payload))
    return [round(c / n, 6) for c in buckets]


def _decode_audio(payload: bytes) -> list[float]:
    """STUB — real implementation would use soundfile/librosa."""
    raise NotImplementedError(
        "audio decode requires libsndfile/librosa (not in this environment)"
    )


def extract_features(df: DataFrame, batch_size: int = 64) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, per-partition,
    payload column dropped on output (never shuffled downstream)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                sizes.append(len(payload) if payload is not None else 0)
                hashes.append(
                    hashlib.md5(payload).hexdigest() if payload is not None else None
                )
                if row["media_type"] == "image":
                    feats.append(_decode_image(payload))
                else:
                    feats.append(None)  # unsupported codecs -> NULL feature
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(sizes, dtype="int32"),
                    "payload_hash": hashes,
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload = repeated
    md5-derived bytes, metadata consistent with type."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.to_binary(
            F.repeat(F.md5(F.col("id").cast("string")), 4), F.lit("hex")
        ).alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
    return base
