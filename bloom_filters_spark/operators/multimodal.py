"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns beside a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators. The decode step itself is STUBBED (this
container has no image/audio codecs) behind ``decoder=`` hooks:
pass a real decoder (e.g. PIL/ffmpeg-based) in production, or use
``fake_image_decoder`` — a deterministic stand-in that exercises the
full Spark plumbing (schema, batching, partition shape) and is what the
tests drive. Every byte of the Spark-side path is real; only the codec
is fake.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "meta struct<width:int, height:int, n_frames:int, "
                "sample_rate:int>")

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, ok boolean"


def real_decoder_stub(payload: bytes, meta) -> np.ndarray:
    """Placeholder for a codec-backed decoder (PIL / libsndfile / ffmpeg).
    Not available in this container."""
    raise NotImplementedError(
        "codec libraries are not installed in this environment; "
        "inject a decoder or use fake_image_decoder for plumbing tests")


def fake_image_decoder(payload: bytes, meta) -> np.ndarray:
    """Deterministic fake decode: bytes → (h, w) float array.

    Derives pixels from the payload bytes so downstream features are
    content-dependent and reproducible — a stand-in with the same
    array contract a real decoder would satisfy."""
    w = int(meta["width"] or 8)
    h = int(meta["height"] or 8)
    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(w * h / max(1, raw.size)))
    return np.tile(raw, reps)[: w * h].reshape(h, w).astype(np.float32) / 255.0


def synthetic_media(spark, n: int = 100, kind: str = "image") -> DataFrame:
    """Deterministic media fixture: payload bytes derived from the id."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = [bytes(((np.arange(256) * (i + 1)) % 251)
                              .astype(np.uint8)) for i in ids]
            metas = [{"width": 16, "height": 16, "n_frames": 1,
                      "sample_rate": 0} for _ in ids]
            yield pd.DataFrame({"media_id": ids, "kind": kind,
                                "payload": payloads, "meta": metas})
    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(df: DataFrame,
                     decoder: Callable = fake_image_decoder,
                     n_features: int = 16) -> DataFrame:
    """Decode + pooled feature extraction per media row (Arrow batches).
    Output feature = per-stripe means of the decoded array — the shape a
    real embedding/feature UDF has; swap ``decoder`` for a real codec."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_feat, ok = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    arr = decoder(bytes(payload), meta)
                    stripes = np.array_split(arr.ravel(), n_features)
                    out_feat.append([float(s.mean()) for s in stripes])
                    ok.append(True)
                except NotImplementedError:
                    out_feat.append([0.0] * n_features)
                    ok.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feature": out_feat, "ok": ok})
    return df.mapInPandas(feats, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  decoder: Callable = fake_image_decoder) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode as raw float bytes.
    Plumbing-real; codec-fake by default."""
    def rez(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                arr = decoder(bytes(payload), meta)
                yi = (np.linspace(0, arr.shape[0] - 1, height)).astype(int)
                xi = (np.linspace(0, arr.shape[1] - 1, width)).astype(int)
                out = arr[np.ix_(yi, xi)]
                payloads.append(out.astype(np.float32).tobytes())
                metas.append({"width": width, "height": height,
                              "n_frames": 1, "sample_rate": 0})
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "payload": payloads, "meta": metas})
    return df.mapInPandas(rez, schema=MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2,
                  frame_bytes: int = 64) -> DataFrame:
    """Frame sampling for video-shaped payloads: split the payload into
    fixed-size frames, keep every n-th → one output row per kept frame.
    Pure byte plumbing (no codec needed)."""
    def samp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mid, kind, fidx, frames = [], [], [], []
            for m, kd, payload in zip(pdf["media_id"], pdf["kind"],
                                      pdf["payload"]):
                raw = bytes(payload)
                n = max(1, len(raw) // frame_bytes)
                for i in range(0, n, every_n):
                    mid.append(m)
                    kind.append(kd)
                    fidx.append(i)
                    frames.append(raw[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": mid, "kind": kind,
                                "frame_idx": fidx, "frame": frames})
    return df.mapInPandas(
        samp, schema="media_id long, kind string, frame_idx int, frame binary")
