"""Perceptual image hashing: invariance to re-encode/resize/noise,
discrimination between unrelated images, and the banded near-dup
join's pigeonhole completeness vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from us_immigration_data_lake_spark.operators.codecs import (
    encode_png,
    encode_ppm,
    resize_nearest,
)
from us_immigration_data_lake_spark.operators.multimodal import (
    perceptual_hash_media,
    phash64_pixels,
    phash_near_dups,
)


def _image(seed: int, h: int = 48, w: int = 48) -> np.ndarray:
    # smooth gradient + blobs: structured content, not white noise
    # (pHash of pure noise is meaningless by design)
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 255 / w + y * 128 / h) % 256
    for _ in range(4):
        cy, cx, r = rng.randint(0, h), rng.randint(0, w), rng.randint(6, 14)
        base = np.where((y - cy) ** 2 + (x - cx) ** 2 < r * r, 255 - base, base)
    return np.stack([base, base * 0.7, base * 0.4], axis=2).astype(np.uint8)


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_invariant_to_resize_and_noise():
    img = _image(1)
    h0 = phash64_pixels(img)
    assert _hamming(h0, phash64_pixels(resize_nearest(img, 96, 96))) <= 4
    noisy = img.astype(int) + np.random.RandomState(0).randint(-6, 7, img.shape)
    assert _hamming(h0, phash64_pixels(np.clip(noisy, 0, 255).astype(np.uint8))) <= 6


def test_phash_discriminates_unrelated_images():
    hashes = [phash64_pixels(_image(s)) for s in range(6)]
    for i in range(6):
        for j in range(i + 1, 6):
            assert _hamming(hashes[i], hashes[j]) >= 10, (i, j)


def test_phash_container_independent():
    img = _image(2)
    from us_immigration_data_lake_spark.operators.multimodal import decode_image

    assert phash64_pixels(decode_image(encode_ppm(img))) == phash64_pixels(
        decode_image(encode_png(img))
    )


def _media_df(spark, imgs):
    return spark.createDataFrame(
        [(i, bytearray(encode_ppm(px))) for i, px in imgs.items()],
        "media_id long, content binary",
    )


def test_banded_join_matches_brute_force(spark):
    imgs = {}
    for s in range(5):
        img = _image(s + 10)
        imgs[s * 10] = img
        noisy = np.clip(
            img.astype(int)
            + np.random.RandomState(s).randint(-5, 6, img.shape),
            0, 255,
        ).astype(np.uint8)
        imgs[s * 10 + 1] = noisy  # near-dup partner
    df = _media_df(spark, imgs)
    hashed = perceptual_hash_media(df)
    got = {
        (r.id1, r.id2): r.hamming
        for r in phash_near_dups(hashed, max_hamming=6, bands=7).collect()
    }
    hs = {r.media_id: r.phash for r in hashed.collect()}
    want = {
        (a, b): _hamming(hs[a], hs[b])
        for a in hs
        for b in hs
        if a < b and _hamming(hs[a], hs[b]) <= 6
    }
    assert got == want
    # the planted pairs are all found
    for s in range(5):
        assert (s * 10, s * 10 + 1) in got


def test_band_count_validated(spark):
    df = _media_df(spark, {1: _image(1)})
    hashed = perceptual_hash_media(df)
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dups(hashed, max_hamming=5, bands=3)


# ---------------------------------------------------------------------------
# audio constellation fingerprints (same multimodal dedup family)
# ---------------------------------------------------------------------------


def _tone_track(freqs, rate=8000, dur=0.25, seed=None):
    t = np.arange(int(rate * dur)) / rate
    sig = np.concatenate(
        [np.sin(2 * np.pi * f * t) * 12000 for f in freqs]
    )
    if seed is not None:
        sig = sig + np.random.RandomState(seed).normal(0, 300, len(sig))
    return np.clip(sig, -32768, 32767).astype(np.int16)


def _audio_df(spark, tracks, rate=8000):
    from us_immigration_data_lake_spark.operators.codecs import encode_wav

    return spark.createDataFrame(
        [(i, bytearray(encode_wav(rate, s))) for i, s in tracks.items()],
        "media_id long, content binary",
    )


def test_audio_match_finds_noisy_duplicate_not_unrelated(spark):
    from us_immigration_data_lake_spark.operators.multimodal import (
        audio_fingerprints,
        audio_match_pairs,
    )

    melody = [440, 660, 550, 880, 495, 770]
    tracks = {
        1: _tone_track(melody),
        2: _tone_track(melody, seed=7),          # same melody + noise
        3: _tone_track([1000, 1200, 900, 1500, 1100, 1300]),  # different
    }
    fps = audio_fingerprints(_audio_df(spark, tracks))
    # tone-onset frames coincide across any two constant-tempo tracks,
    # so unrelated pairs score ~25 matches here while the true dup
    # scores ~1900 — the threshold separates by ~75×
    pairs = {
        (r.id1, r.id2): (r.offset, r.matches)
        for r in audio_match_pairs(fps, min_matches=100).collect()
    }
    assert (1, 2) in pairs
    off, m = pairs[(1, 2)]
    assert off == 0 and m >= 1000
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_audio_fingerprint_rejects_packing_overflow(spark):
    # r4 advisor finding: fp_hash packs (f1<<24)|(f2<<12)|dt in 12-bit
    # fields; a frame > 8190 yields rfft bins past 4095 and a fanout
    # > 4095 overflows dt — both must raise up front, not corrupt
    # hashes silently.
    import pytest

    from us_immigration_data_lake_spark.operators.multimodal import (
        audio_fingerprints,
    )

    df = _audio_df(spark, {1: _tone_track([440])})
    with pytest.raises(ValueError, match="rfft bins"):
        audio_fingerprints(df, frame=16384)
    with pytest.raises(ValueError, match="fanout"):
        audio_fingerprints(df, fanout=5000)
    with pytest.raises(ValueError, match="fanout"):
        audio_fingerprints(df, fanout=0)


def test_audio_match_detects_time_offset(spark):
    from us_immigration_data_lake_spark.operators.multimodal import (
        audio_fingerprints,
        audio_match_pairs,
    )

    rate = 8000
    melody = _tone_track([440, 660, 550, 880], rate=rate)
    silence = np.zeros(rate // 2, dtype=np.int16)  # 0.5 s lead-in
    tracks = {1: melody, 2: np.concatenate([silence, melody])}
    fps = audio_fingerprints(_audio_df(spark, tracks, rate=rate))
    pairs = {
        (r.id1, r.id2): r.offset
        for r in audio_match_pairs(fps, min_matches=5).collect()
    }
    # 0.5 s lead-in at hop 256 → offset of -(4000/256) ≈ -15 frames
    assert pairs[(1, 2)] < -10


# ---------------------------------------------------------------------------
# video near-dup: frame-sampled pHash sequences + offset consistency
# ---------------------------------------------------------------------------


def _video_bytes(frames_px):
    from us_immigration_data_lake_spark.operators.avi import encode_mjpeg_avi
    from us_immigration_data_lake_spark.operators.jpeg import encode_jpeg

    jpegs = [encode_jpeg(px) for px in frames_px]
    h, w = frames_px[0].shape[:2]
    return encode_mjpeg_avi(jpegs, w, h)


def test_video_match_finds_shifted_noisy_copy(spark):
    from us_immigration_data_lake_spark.operators.multimodal import (
        video_frame_hashes,
        video_match_pairs,
    )

    scenes = [_image(s, 48, 48) for s in range(40, 48)]  # 8 distinct scenes
    rng = np.random.RandomState(0)

    def noisy(px):
        return np.clip(
            px.astype(int) + rng.randint(-4, 5, px.shape), 0, 255
        ).astype(np.uint8)

    original = scenes
    # copy: re-noised and trimmed by the first two scenes (time shift)
    copy = [noisy(px) for px in scenes[2:]]
    unrelated = [_image(s, 48, 48) for s in range(80, 88)]
    df = spark.createDataFrame(
        [
            (1, bytearray(_video_bytes(original))),
            (2, bytearray(_video_bytes(copy))),
            (3, bytearray(_video_bytes(unrelated))),
        ],
        "media_id long, content binary",
    )
    hashes = video_frame_hashes(df, every_nth=1)
    pairs = {
        (r.id1, r.id2): (r.offset, r.matching_frames)
        for r in video_match_pairs(
            hashes, max_hamming=8, min_matching_frames=3
        ).collect()
    }
    assert (1, 2) in pairs
    off, m = pairs[(1, 2)]
    assert off == 2 and m >= 4  # trimmed two scenes → original leads by 2
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_video_non_avi_raises(spark):
    from us_immigration_data_lake_spark.operators.multimodal import (
        video_frame_hashes,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not-a-riff-container"))],
        "media_id long, content binary",
    )
    with pytest.raises(Exception) as exc:
        video_frame_hashes(df).collect()
    assert "MJPEG-AVI" in str(exc.value)


def test_band_partition_lossless_at_hamming_8(spark):
    # regression (round-4 review): bands=9 with uniform ceil-width 8
    # put band 8 at shiftright(h, 64), which the JVM masks to shift 0,
    # aliasing it to band 0 — a hamming-8 pair whose every real band
    # differs was silently missed. Mixed-width bands keep every shift
    # inside the word; this exact pair must now surface.
    from pyspark.sql import Row

    from us_immigration_data_lake_spark.operators.multimodal import (
        phash_near_dups,
        video_match_pairs,
    )

    h1, h2 = 0, 0x0101010101010101  # hamming exactly 8, one bit per byte
    hashed = spark.createDataFrame(
        [Row(media_id=1, phash=h1), Row(media_id=2, phash=h2)]
    )
    got = phash_near_dups(hashed, max_hamming=8).collect()
    assert [(r.id1, r.id2, r.hamming) for r in got] == [(1, 2, 8)]
    frames = spark.createDataFrame(
        [
            Row(media_id=1, frame_idx=0, phash=h1),
            Row(media_id=2, frame_idx=0, phash=h2),
        ]
    )
    vid = video_match_pairs(frames, max_hamming=8, min_matching_frames=1)
    assert [(r.id1, r.id2) for r in vid.collect()] == [(1, 2)]
