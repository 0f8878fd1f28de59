"""Multimodal plumbing: metadata extract, frame-sample, resize, features."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.multimodal import extract_media_meta
from sedona_db_spark.multimodal.media import (
    decode_image_stub, extract_frame_features, frame_phash, resize_frame,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    import pandas as pd
    pdf = pd.DataFrame({
        "media_id": [0, 1, 2],
        "kind": ["image", "image", "video"],
        "payload": [b"\x89PNG" + bytes(range(200)),
                    b"\xff\xd8\xff\xe0" + bytes(200),
                    b"\x00\x00\x00\x18ftyp" + bytes(range(120))],
    })
    return spark.createDataFrame(pdf)


def test_media_meta(media):
    rows = {r["media_id"]: r for r in extract_media_meta(media).collect()}
    assert rows[0]["magic"] == "89504e47" and rows[0]["n_bytes"] == 204
    assert rows[1]["magic"] == "ffd8ffe0"
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows.values())


def test_decode_stub_strict_raises():
    with pytest.raises(NotImplementedError, match="image codec"):
        decode_image_stub(b"xx", strict=True)


def test_frame_features(media):
    out = extract_frame_features(media, n_frames=3).collect()
    assert len(out) == 9  # 3 media × 3 frames
    by_key = {(r["media_id"], r["frame_no"]): r for r in out}
    assert len(by_key) == 9
    for r in out:
        assert r["width"] == 8 and r["height"] == 8
        assert 0.0 <= r["mean_intensity"] <= 255.0


def test_frame_features_resize(media):
    out = extract_frame_features(media, n_frames=2, resize_to=(4, 6)).collect()
    assert all(r["height"] == 4 and r["width"] == 6 for r in out)


def test_resize_and_phash_determinism():
    f = np.arange(64, dtype=np.uint8).reshape(8, 8)
    r = resize_frame(f, 4, 4)
    assert r.shape == (4, 4)
    assert frame_phash(f) == frame_phash(f)
    # sensitive to content
    g = f.copy(); g[0, 0] = 255
    assert frame_phash(f) != frame_phash(g)
    assert sample_frames(b"", 3) == []


# ---------------------------------------------------------------------------
# round-6 real stdlib codecs (PNG: zlib + unfilter; WAV: RIFF parse)
# ---------------------------------------------------------------------------

from sedona_db_spark.multimodal.media import (  # noqa: E402
    PNG_SIG, decode_media_frame, decode_png, decode_wav, encode_png_gray,
    encode_wav_pcm16, parse_png_header, parse_wav_header,
)


def test_png_gray_round_trip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        b = encode_png_gray(img)
        hdr = parse_png_header(b)
        assert hdr["width"] == w and hdr["height"] == h
        assert np.array_equal(decode_png(b), img)


def test_png_all_filters_all_color_types():
    """Hand-built PNGs exercising every filter (0-4) × color type
    (gray/RGB/gray-alpha/RGBA) against an independent per-byte
    reference unfilter."""
    import struct
    import zlib
    rng = np.random.default_rng(4)

    def ref_unfilter(rows, h, w, c):
        out = np.zeros((h, w * c), dtype=np.int64)
        for y in range(h):
            f = rows[y][0]
            cur = list(rows[y][1:])
            for i in range(w * c):
                a = out[y][i - c] if i >= c else 0
                b_ = out[y - 1][i] if y > 0 else 0
                cc = out[y - 1][i - c] if (y > 0 and i >= c) else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b_
                elif f == 3:
                    pred = (a + b_) // 2
                else:
                    p = a + b_ - cc
                    pa, pb, pc = abs(p - a), abs(p - b_), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b_ if pb <= pc else cc)
                out[y][i] = (cur[i] + pred) & 0xFF
        return out.astype(np.uint8)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    for color, c in [(0, 1), (2, 3), (4, 2), (6, 4)]:
        for f in range(5):
            h, w = 6, 4
            rows = [bytes([f]) + bytes(
                rng.integers(0, 256, w * c).astype(np.uint8))
                for _ in range(h)]
            ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
            png = (PNG_SIG + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(b"".join(rows)))
                   + chunk(b"IEND", b""))
            got = decode_png(png)
            want = ref_unfilter(rows, h, w, c).reshape(h, w, c)
            assert np.array_equal(got, want[:, :, 0] if c == 1 else want)


def test_wav_round_trip_and_meta():
    rng = np.random.default_rng(5)
    for ch in (1, 2):
        n = int(rng.integers(16, 3000))
        rate = int(rng.choice([8000, 44100]))
        s = rng.integers(-32768, 32767, (n, ch)).astype(np.int16)
        b = encode_wav_pcm16(s if ch > 1 else s[:, 0], rate)
        hdr = parse_wav_header(b)
        assert (hdr["channels"], hdr["sample_rate"],
                hdr["n_samples"]) == (ch, rate, n)
        assert hdr["duration_ms"] == pytest.approx(1000.0 * n / rate)
        out, r2 = decode_wav(b)
        assert r2 == rate and np.array_equal(out, s)


def test_media_meta_real_codecs(spark):
    import pandas as pd
    img = (np.arange(35, dtype=np.uint8)).reshape(5, 7)
    wav = encode_wav_pcm16(np.arange(800, dtype=np.int16), 8000)
    pdf = pd.DataFrame({
        "media_id": [0, 1, 2],
        "kind": ["image", "audio", "image"],
        "payload": [encode_png_gray(img), wav,
                    b"\xff\xd8\xff\xe0" + bytes(100)],   # JPEG -> stub
    })
    rows = {r["media_id"]: r
            for r in extract_media_meta(spark.createDataFrame(pdf)).collect()}
    assert rows[0]["width"] == 7 and rows[0]["height"] == 5
    assert rows[1]["duration_ms"] == pytest.approx(100.0)
    assert rows[1]["sample_rate"] == 8000 and rows[1]["channels"] == 1
    assert rows[2]["width"] == 8 and rows[2]["height"] == 8   # honest stub


def test_frame_features_real_png(spark):
    import pandas as pd
    from sedona_db_spark.multimodal.media import extract_frame_features
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (12, 9)).astype(np.uint8)
    pdf = pd.DataFrame({"media_id": [0],
                        "kind": ["image"],
                        "payload": [encode_png_gray(img)]})
    out = extract_frame_features(spark.createDataFrame(pdf),
                                 n_frames=2).collect()
    assert len(out) == 2
    for r in out:
        assert (r["width"], r["height"]) == (9, 12)
        assert r["mean_intensity"] == pytest.approx(float(img.mean()))


def test_decode_media_frame_real_vs_stub():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(decode_media_frame(encode_png_gray(img)), img)
    assert decode_media_frame(bytes(50)).shape == (8, 8)
