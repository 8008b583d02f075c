"""MJPEG-AVI container parse + real frame decode (ext/avi.py +
multimodal.sample_frames_decoded)."""

from __future__ import annotations

import numpy as np

from aws_greengrass_labs_database_influxdb_spark.ext.avi import AviError, build_avi, parse_avi
from aws_greengrass_labs_database_influxdb_spark.ext.multimodal import (
    MEDIA_SCHEMA,
    sample_frames_decoded,
    stdlib_decode,
)

from test_jpeg import encode_gray_jpeg


def _frames(n=4, h=16, w=16):
    out = []
    for i in range(n):
        img = np.full((h, w), 30 + i * 60, dtype=np.float64)
        out.append(encode_gray_jpeg(img, np.ones(64)))
    return out


def test_parse_avi_roundtrip():
    frames = _frames(3)
    blob = build_avi(frames, 16, 16, fps=10.0)
    meta, got = parse_avi(blob)
    assert got == frames
    assert meta["n_frames"] == 3 and meta["width"] == 16
    assert meta["us_per_frame"] == 100_000 and meta["duration_ms"] == 300
    try:
        parse_avi(b"RIFF....NOPE")
        raise AssertionError("must reject non-AVI")
    except AviError:
        pass


def test_stdlib_decode_video_first_frame():
    blob = build_avi(_frames(2), 16, 16)
    feat = stdlib_decode(blob, "video")
    # frame 0 is flat gray 30 (ones-quant JPEG roundtrips flat blocks
    # exactly) -> every thumbnail cell is 30/255
    assert len(feat) == 16
    assert all(abs(v - 30 / 255.0) < 2 / 255.0 for v in feat)


def test_sample_frames_decoded_grid_and_features(spark):
    frames = _frames(4)  # 4 frames @10fps = 400ms
    blob = build_avi(frames, 16, 16, fps=10.0)
    rows = [
        (1, "video", bytearray(blob), ("video/avi", 16, 16, 400)),
        (2, "video", bytearray(b"not an avi"), ("video/mp4", None, None, 250)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_frames_decoded(media, every_ms=100).collect()
    by_key = {(r.media_id, r.frame_ms): r for r in out}
    # 4 grid points for the AVI, frame i at i*100ms, gray 30+60i
    for i in range(4):
        r = by_key[(1, i * 100)]
        assert r.frame_idx == i
        expect = (30 + 60 * i) / 255.0
        assert all(abs(v - expect) < 2 / 255.0 for v in r.feature)
    # corrupt blob: grid rows exist (duration from meta), features null
    bad = [r for (mid, _), r in by_key.items() if mid == 2]
    assert len(bad) == 3 and all(r.feature is None for r in bad)
