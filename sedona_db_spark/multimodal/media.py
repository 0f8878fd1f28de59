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
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
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
