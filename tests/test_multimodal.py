"""Multimodal plumbing tests: schema, Arrow batch shape, decode-stub
determinism, frame-sample plan, size bucketing — the Spark side is real,
the codec is the deterministic fake.
"""

from __future__ import annotations

import pytest

import calcite_spark.llm.multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    mm._FAKE_CODEC = True
    return mm.synth_media(spark, 64).cache()


def test_decode_image_features(spark, media):
    out = mm.decode_image_features(media.filter("kind = 'image'"))
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 22  # ids 0,3,6,... < 64
    r0 = rows[0]
    assert r0.n_bytes == 128
    assert 1 <= r0.width <= 64 and 1 <= r0.height <= 64
    assert 0.0 <= r0.mean_luma <= 1.0
    # deterministic: run again, same values
    again = {r.media_id: r for r in mm.decode_image_features(media.filter("kind = 'image'")).collect()}
    assert {k: (v.width, v.height, v.mean_luma) for k, v in rows.items()} == {
        k: (v.width, v.height, v.mean_luma) for k, v in again.items()
    }


def test_decode_null_content(spark, media):
    withnull = media.limit(3).selectExpr("media_id", "kind", "CAST(NULL AS BINARY) AS content", "meta")
    out = mm.decode_image_features(withnull).collect()
    assert all(r.n_bytes == 0 and r.width == 0 for r in out)


def test_frame_sample_plan(spark, media):
    frames = mm.frame_sample_plan(media, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    # every video has duration 5000ms → 6 sampled frames (0..5000 step 1000)
    assert got and all(r["count"] == 6 for r in got)


def test_size_bucket_repartition(spark, media):
    out = mm.size_bucket(media, n_buckets=4)
    assert out.rdd.getNumPartitions() == 16
    assert out.columns == media.columns  # helper column dropped


def test_codec_gate_raises_without_fake(spark, media):
    mm._FAKE_CODEC = False
    try:
        with pytest.raises(Exception) as ei:
            mm.decode_image_features(media.limit(1)).collect()
        # NotImplementedError surfaces through the Spark Python worker
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )
    finally:
        mm._FAKE_CODEC = True


# -- REAL pure-stdlib codecs (no fake involved) ------------------------


def test_ppm_decode_real(spark):
    """P6 payloads decode through the actual Spark plan (mapInPandas)
    with _FAKE_CODEC off — width/height exact, luma equals the Rec.601
    mean computed independently here."""
    mm._FAKE_CODEC = False
    try:
        payloads = {10: (8, 6), 11: (16, 4), 12: (3, 3)}
        rows = [
            (mid, "image", bytearray(mm.synth_ppm_bytes(w, h)), (None, w, h, None))
            for mid, (w, h) in payloads.items()
        ]
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        got = {r.media_id: r for r in mm.decode_image_features(media).collect()}
        for mid, (w, h) in payloads.items():
            r = got[mid]
            assert (r.width, r.height) == (w, h)
            # independent luma computation
            luma = sum(
                0.299 * ((x * 16) % 256) + 0.587 * ((y * 16) % 256) + 0.114 * (((x + y) * 8) % 256)
                for y in range(h)
                for x in range(w)
            ) / (w * h * 255)
            assert r.mean_luma == pytest.approx(luma, abs=1e-5)
        # P3 (ASCII) variant of the same image decodes identically
        p6 = mm.synth_ppm_bytes(8, 6)
        raster = p6.split(b"255\n", 1)[1]
        p3 = b"P3\n8 6\n255\n" + " ".join(str(b) for b in raster).encode()
        assert mm._decode_ppm(p3) == mm._decode_ppm(p6)
    finally:
        mm._FAKE_CODEC = True


def test_wav_decode_real(spark):
    """Sine WAVs decode through the Spark plan with the stdlib wave
    parser: header fields exact, rms ≈ amp/√2, peak ≈ amp."""
    import math

    specs = {20: (440.0, 0.5), 21: (880.0, 0.25), 22: (200.0, 0.9)}
    rows = [
        (mid, "audio", bytearray(mm.synth_wav_bytes(freq=f, ms=200, rate=8000, amp=a)),
         ("audio/wav", None, None, 200))
        for mid, (f, a) in specs.items()
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r for r in mm.decode_audio_features(media).collect()}
    for mid, (f, a) in specs.items():
        r = got[mid]
        assert (r.n_channels, r.sample_rate, r.bit_depth, r.duration_ms) == (1, 8000, 16, 200)
        assert r.rms == pytest.approx(a / math.sqrt(2), rel=0.02)
        assert r.peak == pytest.approx(a, rel=0.02)


def test_wav_gate_rejects_non_riff(spark):
    """Non-RIFF audio payloads must hit the codec gate, not mis-decode."""
    media = spark.createDataFrame(
        [(30, "audio", bytearray(b"ID3\x04" + bytes(64)), ("audio/mpeg", None, None, None))],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as ei:
        mm.decode_audio_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)
