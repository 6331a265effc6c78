"""Multimodal tests: real pure-numpy Netpbm codec + Spark plumbing."""

import numpy as np
import pytest

from bloom_filters_spark.operators.multimodal import (
    extract_features, fake_image_decoder, netpbm_decode, pgm_encode,
    ppm_encode, real_decoder_stub, resize_images, sample_frames,
    synthetic_media)

PGM_HEADER_16 = len(b"P5\n16 16\n255\n")


# ------------------------------------------------------------------ codec

def test_pgm_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(12, 20), dtype=np.uint8)
    arr = netpbm_decode(pgm_encode(img))
    assert arr.shape == (12, 20) and arr.dtype == np.float32
    assert np.array_equal(np.rint(arr * 255).astype(np.uint8), img)


def test_ppm_rgb_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    arr = netpbm_decode(ppm_encode(img))
    assert arr.shape == (6, 9, 3)
    assert np.array_equal(np.rint(arr * 255).astype(np.uint8), img)


def test_netpbm_header_comments_and_whitespace():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    payload = b"P5 # magic\n# a comment line\n  4\t4 # dims\n255\n" \
        + img.tobytes()
    assert np.array_equal(np.rint(netpbm_decode(payload) * 255)
                          .astype(np.uint8), img)


def test_netpbm_16bit_samples():
    vals = np.array([[0, 1000], [40000, 65535]], dtype=">u2")
    payload = b"P5\n2 2\n65535\n" + vals.tobytes()
    arr = netpbm_decode(payload)
    assert arr.shape == (2, 2)
    assert np.allclose(arr, vals.astype(np.float32) / 65535.0)


@pytest.mark.parametrize("bad", [
    b"", b"JFIF....", b"P5\n4 4\n255\n\x00\x00",     # truncated raster
    b"P5\n0 4\n255\n", b"P5\n4",
])
def test_netpbm_rejects_garbage(bad):
    with pytest.raises(ValueError):
        netpbm_decode(bad)


# --------------------------------------------------------------- pipeline

def test_media_fixture_is_real_pgm(spark):
    df = synthetic_media(spark, 20)
    assert df.count() == 20
    row = df.first()
    assert row["meta"]["width"] == 16
    payload = bytes(row["payload"])
    assert payload.startswith(b"P5")
    assert len(payload) == PGM_HEADER_16 + 256
    arr = netpbm_decode(payload)
    assert arr.shape == (16, 16)


def test_extract_features_real_decode(spark):
    df = synthetic_media(spark, 10)
    f1 = {r["media_id"]: (r["feature"], r["ok"])
          for r in extract_features(df).collect()}
    f2 = {r["media_id"]: (r["feature"], r["ok"])
          for r in extract_features(df).collect()}
    assert f1 == f2
    assert all(ok for _, ok in f1.values())          # real decode ran
    assert all(len(v) == 16 for v, _ in f1.values())
    assert len({tuple(v) for v, _ in f1.values()}) > 1   # content-dependent


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decoder_stub(b"\x00", {"width": 8, "height": 8})


def test_extract_features_stub_flags_ok_false(spark):
    df = synthetic_media(spark, 5)
    out = extract_features(df, decoder=real_decoder_stub).collect()
    assert all(not r["ok"] for r in out)


def test_corrupt_rows_flag_ok_false_not_task_failure(spark):
    from pyspark.sql import functions as F
    df = synthetic_media(spark, 6).withColumn(
        "payload",
        F.when(F.col("media_id") % 2 == 0, F.col("payload"))
        .otherwise(F.lit(b"NOT AN IMAGE")))
    out = {r["media_id"]: r["ok"] for r in extract_features(df).collect()}
    assert all(ok == (mid % 2 == 0) for mid, ok in out.items())


def test_null_payload_and_tiny_image_do_not_kill_or_poison(spark):
    from pyspark.sql import functions as F
    from bloom_filters_spark.operators.multimodal import pgm_encode

    tiny = pgm_encode(np.arange(4, dtype=np.uint8).reshape(2, 2))
    df = synthetic_media(spark, 4).withColumn(
        "payload",
        F.when(F.col("media_id") == 1, F.lit(None))      # NULL payload
        .when(F.col("media_id") == 2, F.lit(tiny))       # 4 px < 16 feats
        .otherwise(F.col("payload")))
    rows = {r["media_id"]: r for r in extract_features(df).collect()}
    assert rows[1]["ok"] is False                        # flagged, no crash
    assert rows[2]["ok"] is True
    assert all(f == f for f in rows[2]["feature"])       # no NaN leaks
    # resize drops the undecodable row instead of failing the task
    ok_ids = {r["media_id"] for r in resize_images(df, 4, 4).collect()}
    assert ok_ids == {0, 2, 3}
    # sample_frames skips NULL payloads
    fids = {r["media_id"] for r in sample_frames(df).collect()}
    assert 1 not in fids


def test_resize_and_frame_sample(spark):
    df = synthetic_media(spark, 5)
    rez = resize_images(df, 4, 4)
    row = rez.first()
    assert row["meta"]["width"] == 4
    # resized payloads stay decodable by the same codec
    out = netpbm_decode(bytes(row["payload"]))
    assert out.shape == (4, 4)
    frames = sample_frames(df, every_n=2, frame_bytes=64)
    per = frames.groupBy("media_id").count().collect()
    # 269 B → ceil split → 5 frames → kept 0, 2, 4 (4 = 13-byte tail:
    # every payload byte belongs to exactly one frame)
    assert all(r["count"] == 3 for r in per)
    tails = {r["frame_idx"]: len(r["frame"])
             for r in frames.where("media_id = 0").collect()}
    assert tails == {0: 64, 2: 64, 4: 13}


def test_fake_decoder_contract():
    arr = fake_image_decoder(bytes(range(64)), {"width": 8, "height": 8})
    assert arr.shape == (8, 8) and arr.dtype == np.float32
