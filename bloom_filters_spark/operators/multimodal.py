"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns beside a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators behind ``decoder=`` hooks.

The DEFAULT decoder is a real, executable, pure-numpy codec for the
binary Netpbm image formats (P5 grayscale / P6 RGB — the published
portable-pixmap spec): header parse with comment handling, 8- and
16-bit sample depths, normalized float output. ``synthetic_media``
emits genuine P5 payloads, so the decode → feature / resize pipeline
runs END TO END in-repo with no external codec libraries. Compressed
formats (JPEG/PNG/audio/video) still go through the same hook — pass a
PIL/ffmpeg-backed callable in production (``real_decoder_stub`` marks
that slot); ``fake_image_decoder`` remains for plumbing-only tests.
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
    """Placeholder for a compressed-format decoder (PIL / libsndfile /
    ffmpeg). Not available in this container — uncompressed Netpbm
    payloads decode in-repo via ``netpbm_decode`` instead."""
    raise NotImplementedError(
        "compressed-codec libraries are not installed in this "
        "environment; use netpbm payloads (netpbm_decode) or inject a "
        "decoder")


# --------------------------------------------------------------------------
# real pure-numpy codec: binary Netpbm (P5 = grayscale, P6 = RGB)
# --------------------------------------------------------------------------

def pgm_encode(arr: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 array as a binary PGM (P5) image."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("pgm_encode expects a (h, w) grayscale array")
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def ppm_encode(arr: np.ndarray) -> bytes:
    """Encode a (h, w, 3) uint8 array as a binary PPM (P6) image."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("ppm_encode expects a (h, w, 3) RGB array")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _netpbm_header(buf: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a binary Netpbm header → (magic, w, h, maxval, data_offset).
    Handles arbitrary whitespace and ``#`` comment lines per the spec."""
    magic = buf[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary Netpbm payload (magic {magic!r})")
    pos, vals = 2, []
    n = len(buf)
    while len(vals) < 3:
        while pos < n and buf[pos:pos + 1].isspace():
            pos += 1
        if pos < n and buf[pos:pos + 1] == b"#":
            while pos < n and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not buf[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated Netpbm header")
        vals.append(int(buf[start:pos]))
    pos += 1        # exactly one whitespace byte separates header and raster
    w, h, maxval = vals
    if not (w > 0 and h > 0 and 0 < maxval < 65536):
        raise ValueError(f"bad Netpbm dimensions {w}x{h} maxval={maxval}")
    return magic, w, h, maxval, pos


def netpbm_decode(payload: bytes, meta=None) -> np.ndarray:
    """Real decode: binary PGM/PPM bytes → float32 array in [0, 1].

    P5 → (h, w); P6 → (h, w, 3). maxval > 255 means big-endian 16-bit
    samples per the spec. Pure numpy — executable in this container."""
    buf = bytes(payload)
    magic, w, h, maxval, off = _netpbm_header(buf)
    channels = 1 if magic == b"P5" else 3
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    count = w * h * channels
    if len(buf) - off < count * dtype.itemsize:
        raise ValueError("truncated Netpbm raster")
    raster = np.frombuffer(buf, dtype=dtype, count=count, offset=off)
    arr = raster.astype(np.float32) / np.float32(maxval)
    return arr.reshape((h, w) if channels == 1 else (h, w, channels))


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
    """Deterministic media fixture: REAL binary PGM (P5) images whose
    16×16 pixel content derives from the id — the decode path downstream
    exercises a genuine image format, not opaque bytes."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = [pgm_encode(((np.arange(256) * (i + 1)) % 251)
                                   .astype(np.uint8).reshape(16, 16))
                        for i in ids]
            metas = [{"width": 16, "height": 16, "n_frames": 1,
                      "sample_rate": 0} for _ in ids]
            yield pd.DataFrame({"media_id": ids, "kind": kind,
                                "payload": payloads, "meta": metas})
    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(df: DataFrame,
                     decoder: Callable = netpbm_decode,
                     n_features: int = 16) -> DataFrame:
    """Decode + pooled feature extraction per media row (Arrow batches).
    Output feature = per-stripe means of the decoded array — the shape a
    real embedding/feature UDF has. Defaults to the in-repo Netpbm
    codec; swap ``decoder`` for a compressed-format codec in production.
    Corrupt/undecodable rows flag ``ok=false`` instead of failing the
    task — at lake scale a handful of bad payloads must not kill a job."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_feat, ok = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    # TypeError covers NULL payload/meta rows —
                    # bytes(None) must flag the row, not kill the task
                    arr = decoder(bytes(payload), meta)
                    flat = arr.ravel()
                    if flat.size == 0:
                        raise ValueError("decoded to an empty array")
                    if flat.size < n_features:
                        # tile tiny images so no stripe is empty (an
                        # empty stripe's mean is NaN — which would ride
                        # out flagged ok=true)
                        flat = np.resize(flat, n_features)
                    stripes = np.array_split(flat, n_features)
                    out_feat.append([float(s.mean()) for s in stripes])
                    ok.append(True)
                except Exception:
                    # catch EVERYTHING a codec can throw: the advertised
                    # production decoders raise OSError-family errors
                    # (PIL UnidentifiedImageError, ffmpeg RuntimeError)
                    # — one corrupt payload in a lake-scale table must
                    # flag its row (ok=false), never abort the job
                    out_feat.append([0.0] * n_features)
                    ok.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feature": out_feat, "ok": ok})
    return df.mapInPandas(feats, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  decoder: Callable = netpbm_decode) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (PGM for grayscale,
    PPM for RGB), so resized payloads stay decodable by the same codec
    and the pipeline composes end to end.

    Undecodable rows (corrupt/NULL payloads) are DROPPED, matching the
    extract_features contract that bad payloads never kill the job;
    audit them with ``extract_features``' ``ok`` flag on the input."""
    def rez(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, kinds, payloads, metas = [], [], [], []
            for mid, kd, payload, meta in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"],
                    pdf["meta"]):
                try:
                    arr = decoder(bytes(payload), meta)
                except Exception:
                    continue   # same any-codec-error contract as above
                yi = (np.linspace(0, arr.shape[0] - 1, height)).astype(int)
                xi = (np.linspace(0, arr.shape[1] - 1, width)).astype(int)
                out = arr[np.ix_(yi, xi)]
                quant = np.clip(np.rint(out * 255.0), 0, 255).astype(np.uint8)
                mids.append(mid)
                kinds.append(kd)
                payloads.append(ppm_encode(quant) if quant.ndim == 3
                                else pgm_encode(quant))
                metas.append({"width": width, "height": height,
                              "n_frames": 1, "sample_rate": 0})
            if mids:        # an all-dropped batch has no typed columns
                yield pd.DataFrame({"media_id": mids, "kind": kinds,
                                    "payload": payloads, "meta": metas})
    return df.mapInPandas(rez, schema=MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2,
                  frame_bytes: int = 64) -> DataFrame:
    """Frame sampling for video-shaped payloads: split the payload into
    fixed-size frames, keep every n-th → one output row per kept frame.
    Pure byte plumbing (no codec needed). The trailing partial frame is
    KEPT (ceil split — every payload byte belongs to exactly one frame,
    regardless of payload length); NULL payloads emit no frames."""
    def samp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mid, kind, fidx, frames = [], [], [], []
            for m, kd, payload in zip(pdf["media_id"], pdf["kind"],
                                      pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                n = -(-len(raw) // frame_bytes)          # ceil
                for i in range(0, n, every_n):
                    mid.append(m)
                    kind.append(kd)
                    fidx.append(i)
                    frames.append(raw[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": mid, "kind": kind,
                                "frame_idx": fidx, "frame": frames})
    return df.mapInPandas(
        samp, schema="media_id long, kind string, frame_idx int, frame binary")
