"""MJPEG-AVI container round-trip, real video frame sampling, and
FFT spectral audio features."""

from __future__ import annotations

import numpy as np
import pytest

from us_immigration_data_lake_spark.operators.avi import (
    decode_mjpeg_avi,
    encode_mjpeg_avi,
)
from us_immigration_data_lake_spark.operators.codecs import (
    encode_wav,
    spectral_features,
)
from us_immigration_data_lake_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _jpeg_frames(n):
    frames = []
    for i in range(n):
        px = np.full((16, 16, 3), (i * 20) % 256, np.uint8)
        frames.append(encode_jpeg(px, quality=90))
    return frames


def test_avi_roundtrip_exact_payloads():
    frames = _jpeg_frames(7)
    blob = encode_mjpeg_avi(frames, 16, 16, fps=10)
    out = decode_mjpeg_avi(blob)
    assert out == frames  # container is lossless over the payloads


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_mjpeg_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_sample_frames_real_path_for_mjpeg_avi(spark):
    from us_immigration_data_lake_spark.operators.multimodal import sample_frames

    frames = _jpeg_frames(9)
    blob = encode_mjpeg_avi(frames, 16, 16)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    rows = sorted(sample_frames(df, every_nth=4).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    # each sampled frame is a decodable JPEG with the expected content
    for r in rows:
        px = decode_jpeg(bytes(r.frame))
        expected = (r.frame_idx * 20) % 256
        assert abs(int(px[8, 8, 0]) - expected) <= 2


def test_spectral_features_pure_tone_vs_noise():
    rate = 8000
    t = np.arange(rate) / rate
    sine = (np.sin(2 * np.pi * 440 * t) * 10000).astype(np.int16)
    c, bw, ro, fl = spectral_features(rate, sine)
    assert abs(c - 440) < 5
    assert abs(ro - 440) < 5
    assert fl < 0.01
    rng = np.random.default_rng(0)
    noise = rng.integers(-10000, 10000, rate).astype(np.int16)
    c2, _, _, fl2 = spectral_features(rate, noise)
    assert 1500 < c2 < 2500  # white noise centroid ≈ rate/4
    assert fl2 > 0.3


def test_audio_feature_table_includes_spectral(spark):
    from us_immigration_data_lake_spark.operators.multimodal import (
        audio_feature_table,
    )

    rate = 8000
    t = np.arange(rate) / rate
    sine = (np.sin(2 * np.pi * 1000 * t) * 20000).astype(np.int16)
    blob = encode_wav(rate, sine)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    row = audio_feature_table(df).collect()[0]
    assert len(row.features) == 8
    assert abs(row.features[4] - 1000) < 5  # spectral centroid
