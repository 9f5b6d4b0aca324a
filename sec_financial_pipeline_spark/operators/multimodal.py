"""Multimodal column plumbing (SURVEY §2.9 / north star).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus a typed metadata struct. The schema, partitioning, and Arrow-batched
UDF shapes are real and tested, and so are two pure-python codecs:
uncompressed 24-bpp **BMP** (header parse + pixel decode -> per-channel
means) and PCM16 **WAV** (RIFF/fmt/data parse -> RMS + duration).
Compressed codecs (JPEG/PNG/MP3/H.264) would need PIL/libsndfile/ffmpeg —
absent from this environment — and raise ``NotImplementedError`` with the
library they need; the fallback byte-histogram feature keeps the pipeline
total for unknown payloads.

Design for 100 TB: payload bytes never pass through a shuffle — derive
features first (mapInPandas over the scan partition), shuffle only the
small feature/metadata columns. ``spark.sql.files.maxPartitionBytes``
bounds per-task memory since one row can be megabytes.
"""

from __future__ import annotations

import struct
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


def _byte_histogram(payload: bytes) -> list[float]:
    """Codec-free fallback feature: 8 byte-histogram buckets normalized
    by length. Deterministic, total over arbitrary bytes."""
    if payload is None:
        return []
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    n = max(1, len(payload))
    return [round(c / n, 6) for c in buckets]


def decode_bmp(payload: bytes) -> list[float]:
    """Decode an uncompressed 24-bpp BMP (pure python, no libraries) and
    return ``[width, height, mean_b, mean_g, mean_r]``.

    Parses BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER: rows are
    bottom-up and padded to 4-byte boundaries. Compressed BMPs and other
    bit depths raise ``NotImplementedError`` naming the needed library.
    """
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} needs PIL (not in this environment)"
        )
    h = abs(height)
    row_bytes = (width * 3 + 3) // 4 * 4
    sums = [0, 0, 0]
    for r in range(h):
        base = pixel_offset + r * row_bytes
        row = payload[base : base + width * 3]
        for c in range(width):
            sums[0] += row[c * 3]
            sums[1] += row[c * 3 + 1]
            sums[2] += row[c * 3 + 2]
    n_px = max(1, width * h)
    return [
        float(width),
        float(h),
        round(sums[0] / n_px, 6),
        round(sums[1] / n_px, 6),
        round(sums[2] / n_px, 6),
    ]


def decode_wav(payload: bytes) -> list[float]:
    """Decode a PCM16 WAV (pure python RIFF parse) and return
    ``[n_channels, sample_rate, n_samples, rms]``.

    Walks RIFF chunks to the ``fmt `` and ``data`` chunks. Non-PCM
    encodings (format tag != 1) raise ``NotImplementedError``.
    """
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format={audio_format} bits={bits} needs libsndfile (not in this environment)"
        )
    n = len(data) // 2
    if n == 0:
        return [float(n_channels), float(sample_rate), 0.0, 0.0]
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    # integer sum of squares is exact; one float op at the boundary
    rms = (sum(s * s for s in samples) / n) ** 0.5
    return [float(n_channels), float(sample_rate), float(n), round(rms, 6)]


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
                try:
                    if row["media_type"] == "image" and payload[:2] == b"BM":
                        feats.append(decode_bmp(payload))
                    elif row["media_type"] == "audio" and payload[:4] == b"RIFF":
                        feats.append(decode_wav(payload))
                    else:
                        feats.append(_byte_histogram(payload))
                except (NotImplementedError, ValueError, TypeError, IndexError):
                    feats.append(None)  # undecodable payloads -> NULL feature
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


def make_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Build a real uncompressed 24-bpp BMP filled with one color
    (test fixture for ``decode_bmp`` — valid per the BMP spec)."""
    row_bytes = (width * 3 + 3) // 4 * 4
    pixel_data = bytearray()
    row = (bytes([rgb[2], rgb[1], rgb[0]]) * width).ljust(row_bytes, b"\x00")
    for _ in range(height):
        pixel_data += row
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40)
    return header + info + bytes(pixel_data)


def make_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Build a real PCM16 mono WAV (test fixture for ``decode_wav``)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


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
