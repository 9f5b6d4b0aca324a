"""Serving façade round-trips (endpoint -> cache -> engine -> sink) and
real BMP/WAV codec decoding through the mapInPandas feature extractor."""

import pytest

from sec_financial_pipeline_spark.operators import multimodal as mm


def test_facade_endpoints_roundtrip(spark, sf_dir):
    from sec_financial_pipeline_spark.plans.facade import ServingFacade

    f = ServingFacade(spark, sf_dir)

    # series endpoint: json + csv + parquet, cache hit on repeat
    out = f.metric_series("t00", "revenue")  # lowercase normalizes
    assert out["ticker"] == "T00" and out["n_periods"] > 0
    assert all(r["metric"] == "revenue" for r in out["series"])
    assert f.metric_series("T00", "revenue") is out  # cache hit, same object
    csv = f.metric_series("T00", "revenue", fmt="csv")
    assert isinstance(csv, bytes) and csv.splitlines()[0].startswith(b"ticker")
    pq = f.metric_series("T00", "revenue", fmt="parquet")
    import io

    import pandas as pd

    assert len(pd.read_parquet(io.BytesIO(pq))) == out["n_periods"]

    # facts endpoint
    facts = f.company_facts("T01")
    assert facts["n_facts"] == len(facts["facts"]) > 0

    # compare endpoint
    cmp_out = f.compare(["T00", "T01"], "revenue")
    assert set(cmp_out["rows"][0]) == {"fiscal_year", "T00", "T01"}

    # invalidation drops exactly the T00-keyed entries
    stats_before = f.cache.stats()["size"]
    dropped = f.invalidate("T00")
    assert dropped == 4  # json + csv + parquet series, plus the compare
    assert f.cache.stats()["size"] == stats_before - 4

    with pytest.raises(ValueError):
        f.metric_series("NOT A TICKER!", "revenue")


def test_bmp_decode_exact():
    bmp = mm.make_bmp(5, 3, (200, 100, 50))
    assert mm.decode_bmp(bmp) == [5.0, 3.0, 50.0, 100.0, 200.0]
    with pytest.raises(ValueError):
        mm.decode_bmp(b"PNG....")


def test_wav_decode_exact():
    samples = [0, 1000, -1000, 1000, -1000, 0]
    n_ch, rate, n, rms = mm.decode_wav(mm.make_wav(8000, samples))
    assert (n_ch, rate, n) == (1.0, 8000.0, 6.0)
    assert rms == round((4 * 1000 * 1000 / 6) ** 0.5, 6)
    with pytest.raises(NotImplementedError):
        # 8-bit PCM is out of scope for the pure-python codec; the
        # bits-per-sample field sits at offset 34 (RIFF 12 + chunk hdr 8
        # + fmt fields 14)
        bad = bytearray(mm.make_wav(8000, [0]))
        bad[34:36] = (8).to_bytes(2, "little")
        mm.decode_wav(bytes(bad))


def test_codecs_through_spark_pipeline(spark):
    rows = [
        (0, "image", mm.make_bmp(4, 4, (10, 20, 30)), None),
        (1, "audio", mm.make_wav(16000, [100, -100] * 8), None),
        (2, "video", b"\x00\x01\x02\x03" * 8, None),
        (3, "image", b"not-a-bmp", None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert [round(x, 4) for x in out[0].feature] == [4.0, 4.0, 30.0, 20.0, 10.0]
    assert out[1].feature[:3] == [1.0, 16000.0, 16.0]
    assert len(out[2].feature) == 8  # histogram fallback for video
    assert len(out[3].feature) == 8  # non-BMP image falls back, never crashes


def test_resize_bmp_exact():
    # solid-color 8x6 -> 4x3: every sampled pixel is the same color, so
    # the resized decode is exact; header carries the new dimensions
    bmp = mm.make_bmp(8, 6, (200, 100, 50))
    small = mm.resize_bmp(bmp, 4, 3)
    assert mm.decode_bmp(small) == [4.0, 3.0, 50.0, 100.0, 200.0]
    # upscale round-trips too (nearest neighbor of a constant image)
    big = mm.resize_bmp(bmp, 16, 12)
    assert mm.decode_bmp(big) == [16.0, 12.0, 50.0, 100.0, 200.0]
    with pytest.raises(ValueError):
        mm.resize_bmp(b"nope", 2, 2)


def test_resize_images_composes_with_features(spark):
    rows = [
        (0, "image", mm.make_bmp(8, 8, (9, 9, 9)), None),
        (1, "audio", mm.make_wav(8000, [5, -5]), None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r.media_id: r
        for r in mm.extract_features(mm.resize_images(media, 2, 2)).collect()
    }
    assert out[0].feature[:2] == [2.0, 2.0]  # image resized before features
    assert out[1].feature[:2] == [1.0, 8000.0]  # audio untouched


def test_frame_sampling_decodes_in_partition(spark):
    frames = [mm.make_bmp(2, 2, (i * 10, 0, 0)) for i in range(6)]
    rows = [
        (7, "video", mm.make_video(frames), None),
        (8, "video", b"H264....", None),  # compressed -> zero rows
        (9, "image", mm.make_bmp(2, 2, (1, 1, 1)), None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = mm.sample_frames(media, every_k=2).collect()
    by_frame = {(r.media_id, r.frame_no): r.feature for r in got}
    # every 2nd frame of media 7 only; red channel (BGR order) = 0,20,40
    assert set(by_frame) == {(7, 0), (7, 2), (7, 4)}
    assert [by_frame[(7, k)][4] for k in (0, 2, 4)] == [0.0, 20.0, 40.0]
