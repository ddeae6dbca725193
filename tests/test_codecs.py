"""Real media codecs (operators/codecs.py): P6 PPM and WAV/PCM decode
without any image/audio library, so the multimodal pipeline has a
genuine decode→transform→encode path. Every assertion is against an
independently computed numpy reference.
"""

from __future__ import annotations

import numpy as np
import pytest

from us_immigration_data_lake_spark.operators import codecs
from us_immigration_data_lake_spark.operators import multimodal as mm


def _ppm(w, h, seed=0):
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return pixels, codecs.encode_ppm(pixels)


def test_ppm_roundtrip():
    pixels, blob = _ppm(7, 5)
    assert np.array_equal(codecs.decode_ppm(blob), pixels)


def test_ppm_header_comments():
    pixels, blob = _ppm(3, 2)
    commented = blob.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(codecs.decode_ppm(commented), pixels)


def test_ppm_rejects_non_p6():
    with pytest.raises(ValueError):
        codecs.decode_ppm(b"P3\n1 1\n255\n0 0 0")


def test_resize_nearest_matches_reference():
    pixels, _ = _ppm(10, 6)
    out = codecs.resize_nearest(pixels, 5, 3)
    ref = np.empty((3, 5, 3), dtype=np.uint8)
    for r in range(3):
        for c in range(5):
            ref[r, c] = pixels[(r * 6) // 3, (c * 10) // 5]
    assert np.array_equal(out, ref)


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(800)
    samples = (np.sin(2 * np.pi * 440 * t / rate) * 1000).astype(np.int16)
    samples = samples.reshape(-1, 1)
    blob = codecs.encode_wav(rate, samples)
    got_rate, got = codecs.decode_wav(blob)
    assert got_rate == rate and np.array_equal(got, samples)
    dur, rms, zcr, peak = codecs.audio_features(rate, samples)
    mono = samples.astype(np.float64)[:, 0]
    assert dur == pytest.approx(0.1)
    assert rms == pytest.approx(float(np.sqrt((mono * mono).mean())))
    assert peak == float(np.abs(mono).max())
    assert 0.0 < zcr < 1.0


def test_decode_image_dispatch_real_and_gated():
    pixels, blob = _ppm(4, 4)
    assert np.array_equal(mm.decode_image(blob), pixels)
    # png/jpeg/gif/bmp are REAL now (test_png_codec.py,
    # test_jpeg_codec.py, test_gif_codec.py); formats without an
    # offline codec stay gated
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")  # webp


def test_resize_media_real_path_for_ppm(spark):
    pixels, blob = _ppm(8, 4, seed=3)
    media = spark.createDataFrame(
        [(1, "image", bytearray(blob), "ppm", 8, 4)],
        schema=mm.MEDIA_SCHEMA,
    )
    row = mm.resize_media(media, 4, 2).collect()[0]
    got = codecs.decode_ppm(bytes(row.content))
    assert np.array_equal(got, codecs.resize_nearest(pixels, 4, 2))
    assert (row.meta_width, row.meta_height) == (4, 2)


def test_audio_feature_table_matches_reference(spark):
    rate = 16000
    rows = []
    refs = {}
    for mid in (1, 2):
        rng = np.random.RandomState(mid)
        samples = rng.randint(-2000, 2000, size=(400, 2)).astype(np.int16)
        rows.append((mid, "audio", bytearray(codecs.encode_wav(rate, samples)),
                     "wav", None, None))
        refs[mid] = codecs.audio_features(rate, samples) + \
            codecs.spectral_features(rate, samples)
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    got = {r.media_id: r for r in mm.audio_feature_table(media).collect()}
    for mid, ref in refs.items():
        assert got[mid].sample_rate == rate
        assert got[mid].n_frames == 400
        assert got[mid].features == pytest.approx(ref)
