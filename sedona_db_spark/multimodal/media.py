"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are BinaryType columns.  The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas partitioned decode — is
real and tested.  PNG and WAV are decoded FOR REAL with the stdlib alone
(round 6): PNG chunk walk + zlib IDAT inflate + scanline un-filtering,
WAV RIFF/fmt/data parse — no image/audio libraries needed.  Only JPEG
and video remain stubbed (``decode_image_stub``: NotImplementedError in
strict mode, deterministic fake frame otherwise) because their codecs
genuinely aren't in this container.
"""

from __future__ import annotations

import struct
import zlib
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
    StructField("width", IntegerType()),     # real for PNG; stub 8x8 else
    StructField("height", IntegerType()),
    StructField("duration_ms", DoubleType()),   # real for PCM WAV
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
])


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png_header(b: bytes) -> dict | None:
    """IHDR fields of a PNG payload (width/height/bit_depth/color_type),
    None if the signature or IHDR is absent/malformed.  Pure header
    parse — 33 bytes is enough; no inflate."""
    if len(b) < 33 or b[:8] != PNG_SIG:
        return None
    ln, typ = struct.unpack_from(">I4s", b, 8)
    if typ != b"IHDR" or ln != 13:
        return None
    w, h, depth, color, comp, filt, interlace = \
        struct.unpack_from(">IIBBBBB", b, 16)
    if w == 0 or h == 0 or comp != 0 or filt != 0:
        return None
    return {"width": int(w), "height": int(h), "bit_depth": int(depth),
            "color_type": int(color), "interlace": int(interlace)}


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(b: bytes) -> np.ndarray:
    """Full PNG decode with the stdlib: chunk walk -> zlib inflate of the
    concatenated IDAT stream -> per-scanline un-filtering (filters
    0 none / 1 sub / 2 up / 3 average / 4 paeth).  Supports 8-bit
    non-interlaced, non-palette images (gray / gray+alpha / RGB / RGBA);
    returns (h, w) uint8 for grayscale or (h, w, c) otherwise.  Raises
    ValueError on anything outside that subset."""
    hdr = parse_png_header(b)
    if hdr is None:
        raise ValueError("not a PNG")
    if hdr["bit_depth"] != 8 or hdr["interlace"] != 0 \
            or hdr["color_type"] == 3:
        raise ValueError("unsupported PNG subset "
                         f"(depth={hdr['bit_depth']} "
                         f"color={hdr['color_type']} "
                         f"interlace={hdr['interlace']})")
    w, h = hdr["width"], hdr["height"]
    c = _PNG_CHANNELS[hdr["color_type"]]
    idat = []
    pos = 8
    while pos + 8 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8:pos + 8 + ln]
        if typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if not idat:
        raise ValueError("PNG has no IDAT chunk")
    try:
        inflated = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    raw = np.frombuffer(inflated, dtype=np.uint8)
    stride = 1 + w * c
    if len(raw) < h * stride:
        raise ValueError("truncated PNG pixel data")
    rows = raw[:h * stride].reshape(h, stride)
    filt = rows[:, 0]
    out = np.empty((h, w * c), dtype=np.uint8)
    bpp = c
    for y in range(h):
        cur = rows[y, 1:].copy()
        f = int(filt[y])
        prev = out[y - 1] if y > 0 else np.zeros(w * c, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:                         # sub: prefix sum per channel
            for ch in range(bpp):
                np.add.accumulate(cur[ch::bpp], out=cur[ch::bpp],
                                  dtype=np.uint8)
            out[y] = cur
        elif f == 2:                         # up
            out[y] = cur + prev
        elif f == 3:                         # average
            row = out[y]
            for i in range(w * c):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:                         # paeth
            row = out[y]
            for i in range(w * c):
                a = int(row[i - bpp]) if i >= bpp else 0
                bb = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                pp = a + bb - cc
                pa, pb, pc = abs(pp - a), abs(pp - bb), abs(pp - cc)
                pred = a if (pa <= pb and pa <= pc) else \
                    (bb if pb <= pc else cc)
                row[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
    img = out.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


def encode_png_gray(img: np.ndarray, level: int = 6) -> bytes:
    """Minimal 8-bit grayscale PNG writer (filter 0 rows) — the test /
    fixture counterpart of :func:`decode_png`; deterministic bytes for a
    given array and zlib level."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scan = np.concatenate([np.zeros((h, 1), dtype=np.uint8), img], axis=1)
    idat = zlib.compress(scan.tobytes(), level)
    return (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def parse_wav_header(b: bytes) -> dict | None:
    """RIFF/WAVE fmt+data parse: channels, sample rate, bits per sample,
    sample count and duration; None when not a PCM WAV."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(b):
        typ, ln = struct.unpack_from("<4sI", b, pos)
        if typ == b"fmt ":
            if ln < 16:
                return None
            (audio_fmt, channels, rate, _byte_rate, _align,
             bits) = struct.unpack_from("<HHIIHH", b, pos + 8)
            if audio_fmt != 1 or channels == 0 or bits % 8 or rate == 0:
                return None
            fmt = (channels, rate, bits)
        elif typ == b"data":
            data_size = min(ln, len(b) - pos - 8)
        pos += 8 + ln + (ln & 1)
    if fmt is None or data_size is None:
        return None
    channels, rate, bits = fmt
    n_samples = data_size // (channels * bits // 8)
    return {"channels": channels, "sample_rate": rate, "bits": bits,
            "n_samples": int(n_samples),
            "duration_ms": 1000.0 * n_samples / rate}


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """(samples (n, channels) int array, sample_rate) of a PCM WAV."""
    hdr = parse_wav_header(b)
    if hdr is None:
        raise ValueError("not a PCM WAV")
    pos = 12
    while pos + 8 <= len(b):
        typ, ln = struct.unpack_from("<4sI", b, pos)
        if typ == b"data":
            raw = b[pos + 8:pos + 8 + ln]
            dt = {8: np.dtype(np.uint8), 16: np.dtype("<i2"),
                  32: np.dtype("<i4")}.get(hdr["bits"])
            if dt is None:                 # e.g. 24-bit packed PCM
                raise ValueError(
                    f"unsupported PCM bit depth {hdr['bits']} for sample "
                    f"decode (metadata via parse_wav_header still works)")
            n = len(raw) // np.dtype(dt).itemsize // hdr["channels"]
            arr = np.frombuffer(raw, dtype=dt,
                                count=n * hdr["channels"])
            return arr.reshape(n, hdr["channels"]), hdr["sample_rate"]
        pos += 8 + ln + (ln & 1)
    raise ValueError("WAV data chunk missing")


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Minimal PCM-16 mono/stereo WAV writer — fixture counterpart of
    :func:`parse_wav_header` / :func:`decode_wav`."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_media_frame(payload: bytes, strict: bool = False) -> np.ndarray:
    """Best-real-effort frame decode: real PNG decode (grayscale view of
    the first channel) when the payload is a supported PNG, else the
    documented stub (JPEG/video: codecs not in this container)."""
    if payload[:8] == PNG_SIG:
        try:
            img = decode_png(payload)
            return img if img.ndim == 2 else img[:, :, 0]
        except (ValueError, zlib.error):   # corrupt IDAT inflates raise
            pass                           # zlib.error, not ValueError
    return decode_image_stub(payload, strict=strict)


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
            dur = np.full(n, np.nan)
            rate = np.zeros(n, dtype=np.int32)
            chans = np.zeros(n, dtype=np.int32)
            magic = []
            nbytes = np.zeros(n, dtype=np.int64)
            for i, p in enumerate(payloads):
                b = bytes(p) if p is not None else b""
                nbytes[i] = len(b)
                magic.append(b[:4].hex())
                png = parse_png_header(b)
                if png is not None:
                    heights[i], widths[i] = png["height"], png["width"]
                    continue
                wav = parse_wav_header(b)
                if wav is not None:
                    dur[i] = wav["duration_ms"]
                    rate[i] = wav["sample_rate"]
                    chans[i] = wav["channels"]
                    continue
                frame = decode_image_stub(b)     # JPEG/video: honest stub
                heights[i], widths[i] = frame.shape
            yield pd.DataFrame({
                "media_id": pdf[id_col].to_numpy(),
                "kind": pdf[kind_col].to_numpy(),
                "n_bytes": nbytes,
                "magic": magic,
                "width": widths,
                "height": heights,
                "duration_ms": dur,
                "sample_rate": rate,
                "channels": chans,
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
    """Frame sampler: supported PNG payloads decode FOR REAL (a still
    image repeats across the requested frames, exercising resize/phash
    on real pixels); video payloads keep the documented stub — a real
    codec would seek keyframes, here each 'frame' is a deterministic 8×8
    view over a payload stride so the batch plumbing (variable frames
    per row) stays exercised."""
    if not payload:
        return []
    if payload[:8] == PNG_SIG:
        try:
            img = decode_png(payload)
            g = img if img.ndim == 2 else img[:, :, 0]
            return [g] * n_frames
        except (ValueError, zlib.error):
            pass
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
