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
