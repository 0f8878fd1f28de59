"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are BinaryType columns.  The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas partitioned decode — is
real and tested; the actual codec step is stubbed (the container has no
image/audio libraries) behind ``decode_image_stub`` which either raises
NotImplementedError (strict mode) or produces a deterministic fake frame.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("n_bytes", LongType()),
    StructField("magic", StringType()),      # first-4-bytes hex
    StructField("width", IntegerType()),     # decoded (stub) dimensions
    StructField("height", IntegerType()),
])


def decode_image_stub(payload: bytes, strict: bool = False) -> np.ndarray:
    """STUB: real image decode needs an image library not present here.

    strict=True raises (production placeholder); otherwise returns a
    deterministic fake 8×8 grayscale frame derived from the payload bytes,
    so downstream plumbing (resize, feature extract) is exercised for real.
    """
    if strict:
        raise NotImplementedError(
            "image decoding requires an image codec library (not bundled); "
            "wire a real decoder here in production")
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return h.reshape(8, 8)


def extract_media_meta(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "media_id",
                       kind_col: str = "kind") -> DataFrame:
    """mapInPandas media metadata extraction (Arrow-batched).

    The decode step uses the stub; everything else (batch iteration,
    schema, vectorized byte stats) is the production shape.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n = len(pdf)
            widths = np.zeros(n, dtype=np.int32)
            heights = np.zeros(n, dtype=np.int32)
            magic = []
            nbytes = np.zeros(n, dtype=np.int64)
            for i, p in enumerate(payloads):
                b = bytes(p) if p is not None else b""
                nbytes[i] = len(b)
                magic.append(b[:4].hex())
                frame = decode_image_stub(b)
                heights[i], widths[i] = frame.shape
            yield pd.DataFrame({
                "media_id": pdf[id_col].to_numpy(),
                "kind": pdf[kind_col].to_numpy(),
                "n_bytes": nbytes,
                "magic": magic,
                "width": widths,
                "height": heights,
            })
    return df.mapInPandas(gen, schema=MEDIA_META_SCHEMA)


FRAME_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_intensity", DoubleType()),
    StructField("std_intensity", DoubleType()),
    StructField("phash", LongType()),
])


def resize_frame(frame: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy — the production slot for a real
    resampling kernel)."""
    h, w = frame.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return frame[rows][:, cols]


def frame_phash(frame: np.ndarray) -> int:
    """Tiny perceptual-hash: 8×8 mean-threshold bitmap packed to int64."""
    f = resize_frame(frame.astype(np.float64), 8, 8)
    bits = (f > f.mean()).ravel()
    weights = 1 << np.arange(64, dtype=np.uint64)
    return int(np.uint64(np.sum(weights[bits])).view(np.int64))


def sample_frames(payload: bytes, n_frames: int) -> list[np.ndarray]:
    """STUB frame sampler: a real video codec would seek keyframes; here
    each 'frame' is a deterministic 8×8 view over a payload stride, so the
    batch plumbing (variable frames per row) is exercised for real."""
    if not payload:
        return []
    out = []
    for i in range(n_frames):
        start = (i * 64) % max(len(payload), 1)
        chunk = payload[start:start + 64]
        out.append(decode_image_stub(chunk))
    return out


def extract_frame_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "media_id",
                           n_frames: int = 3,
                           resize_to: tuple[int, int] | None = None) -> DataFrame:
    """mapInPandas decode → frame-sample → (resize) → feature-extract.

    One Arrow pass per partition; emits one row per (media, frame) with
    vectorized per-frame statistics + a perceptual hash."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, ws, hs, means, stds, hashes = [], [], [], [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                frames = sample_frames(bytes(p) if p is not None else b"",
                                       n_frames)
                for i, fr in enumerate(frames):
                    if resize_to is not None:
                        fr = resize_frame(fr, *resize_to)
                    ids.append(mid)
                    fnos.append(i)
                    hs.append(fr.shape[0])
                    ws.append(fr.shape[1])
                    means.append(float(fr.mean()))
                    stds.append(float(fr.std()))
                    hashes.append(frame_phash(fr))
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_no": pd.Series(fnos, dtype="int32"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "mean_intensity": pd.Series(means, dtype="float64"),
                "std_intensity": pd.Series(stds, dtype="float64"),
                "phash": pd.Series(hashes, dtype="int64"),
            })
    return df.mapInPandas(gen, schema=FRAME_FEATURES_SCHEMA)
