"""Multimodal plumbing tests (codec stubbed, Spark path real)."""

import numpy as np
import pytest

from bloom_filters_spark.operators.multimodal import (
    extract_features, fake_image_decoder, real_decoder_stub, resize_images,
    sample_frames, synthetic_media)


def test_media_fixture_schema(spark):
    df = synthetic_media(spark, 20)
    assert df.count() == 20
    row = df.first()
    assert row["meta"]["width"] == 16
    assert len(bytes(row["payload"])) == 256


def test_extract_features_deterministic(spark):
    df = synthetic_media(spark, 10)
    f1 = {r["media_id"]: r["feature"]
          for r in extract_features(df).collect()}
    f2 = {r["media_id"]: r["feature"]
          for r in extract_features(df).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    assert len({tuple(v) for v in f1.values()}) > 1   # content-dependent


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decoder_stub(b"\x00", {"width": 8, "height": 8})


def test_extract_features_stub_flags_ok_false(spark):
    df = synthetic_media(spark, 5)
    out = extract_features(df, decoder=real_decoder_stub).collect()
    assert all(not r["ok"] for r in out)


def test_resize_and_frame_sample(spark):
    df = synthetic_media(spark, 5)
    rez = resize_images(df, 4, 4)
    row = rez.first()
    assert row["meta"]["width"] == 4
    assert len(bytes(row["payload"])) == 4 * 4 * 4    # float32
    frames = sample_frames(df, every_n=2, frame_bytes=64)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 2 for r in per)          # 256/64=4 → keep 0,2


def test_fake_decoder_contract():
    arr = fake_image_decoder(bytes(range(64)), {"width": 8, "height": 8})
    assert arr.shape == (8, 8) and arr.dtype == np.float32
