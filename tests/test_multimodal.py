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
