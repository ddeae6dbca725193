"""Baseline JPEG codec: transform identities, round-trip quality
bounds, declared-unsupported variants, and multimodal dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from us_immigration_data_lake_spark.operators.jpeg import (
    _AC_BITS,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    fdct2,
    idct2,
)
from us_immigration_data_lake_spark.operators.multimodal import decode_image


def test_zigzag_generated_correctly():
    zz = [tuple(r) for r in _ZIGZAG]
    assert len(set(zz)) == 64
    # spec: scan starts right, then down the first anti-diagonal
    assert zz[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert zz[-1] == (7, 7)


def test_ac_huffman_table_is_complete_and_kraft_valid():
    assert sum(_AC_BITS) == 162  # EOB + ZRL + 16 runs × 10 sizes
    kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(_AC_BITS))
    assert kraft <= 1.0


def test_dct_pair_is_orthonormal_inverse():
    rng = np.random.default_rng(1)
    b = rng.uniform(-128, 127, (8, 8))
    assert np.abs(idct2(fdct2(b)) - b).max() < 1e-10
    # Parseval: orthonormal transform preserves energy
    c = fdct2(b)
    assert abs((b * b).sum() - (c * c).sum()) < 1e-8


def test_constant_block_is_dc_only():
    c = fdct2(np.full((8, 8), 37.0))
    assert abs(c[0, 0] - 37 * 8) < 1e-9
    off_dc = np.abs(c).sum() - abs(c[0, 0])
    assert off_dc < 1e-9


def test_flat_color_roundtrip_exact():
    flat = np.full((16, 24, 3), 200, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, quality=85)) == flat).all()


def test_smooth_gradient_roundtrip_tight():
    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    g = ((xx * 2 + yy * 3) % 200 + 20).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    err = np.abs(dec.astype(int) - g.astype(int))
    assert dec.shape == g.shape
    assert err.mean() < 4.0


def test_noise_roundtrip_bounded_and_shape_preserved():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (23, 29, 3), dtype=np.uint8)  # non-×8 dims
    dec = decode_jpeg(encode_jpeg(px, quality=95))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    # q95 quantization on noise: loose but meaningful bound
    assert err.mean() < 12.0


def test_quality_knob_monotone_on_smooth_image():
    xx, yy = np.meshgrid(np.arange(32), np.arange(32))
    img = (128 + 60 * np.sin(xx / 5.0) * np.cos(yy / 7.0)).astype(np.uint8)
    errs = []
    for q in (30, 60, 95):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def test_progressive_marker_rejected():
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    at = bytes(blob).index(b"\xff\xc0")
    blob[at + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(blob))


def test_non_integer_sampling_ratio_rejected():
    # 4:2:0 (Y 2×2) with chroma patched to 3×3: 3 does not divide 2 —
    # the decoder must name the bad ratio, not mis-tile silently
    blob = bytearray(
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="4:2:0")
    )
    at = bytes(blob).index(b"\xff\xc0")
    # SOF0 seg: marker(2) len(2) depth(1) h(2) w(2) ncomp(1), then
    # (id, sampling, qid) triples → comp-2 sampling byte at +14
    assert blob[at + 11] == 0x22 and blob[at + 14] == 0x11
    blob[at + 14] = 0x33
    with pytest.raises(ValueError, match="sampling ratio"):
        decode_jpeg(bytes(blob))


def test_truncated_entropy_data_raises():
    blob = encode_jpeg(np.full((16, 16), 99, np.uint8), quality=50)
    # chop inside the entropy segment, re-add EOI so parsing reaches it
    cut = blob[: len(blob) - 12] + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(cut)


def test_decode_image_dispatches_jpeg():
    g = np.full((9, 11), 90, np.uint8)
    out = decode_image(encode_jpeg(g))
    assert out.shape == (9, 11)
    assert np.abs(out.astype(int) - 90).max() <= 1


def test_resize_media_real_path_for_jpeg(spark):
    from us_immigration_data_lake_spark.operators.multimodal import resize_media

    xx, yy = np.meshgrid(np.arange(16), np.arange(16))
    px = np.stack([(xx * 8) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256],
                  axis=-1).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(px, quality=95)))],
        "media_id long, content binary",
    )
    out = resize_media(df, 8, 8).collect()[0]
    dec = decode_jpeg(bytes(out.content))
    assert dec.shape == (8, 8, 3)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_subsampled_roundtrip_bounded(sub):
    xx, yy = np.meshgrid(np.arange(37), np.arange(29))
    img = np.stack(
        [(xx * 5) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=92, subsampling=sub))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert err < 3.0  # chroma loss stays small on smooth gradients


def test_restart_markers_roundtrip_identical_to_without():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    no_rst = decode_jpeg(encode_jpeg(img, quality=90))
    with_rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
    # restart segmentation is lossless re-sync: pixel-identical output
    assert (no_rst == with_rst).all()


def test_restart_stream_contains_rst_markers_and_dri():
    img = np.zeros((24, 24), np.uint8)
    blob = encode_jpeg(img, restart_interval=1)
    assert b"\xff\xdd" in blob  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))


def test_corrupt_restart_marker_detected():
    img = np.zeros((24, 24), np.uint8)
    blob = bytearray(encode_jpeg(img, restart_interval=1))
    at = bytes(blob).index(b"\xff\xd0")
    blob[at + 1] = 0xC8  # clobber the first RST marker
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))


def test_dc_predictors_reset_at_restart():
    # a bright-then-dark image: without predictor reset, the DC chain
    # after a restart would decode wrong — verify exactness per block
    img = np.concatenate(
        [np.full((8, 16), 230, np.uint8), np.full((8, 16), 20, np.uint8)],
        axis=0,
    )
    dec = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=1))
    assert abs(int(dec[0, 0]) - 230) <= 2
    assert abs(int(dec[15, 0]) - 20) <= 2


def test_zero_sampling_factor_rejected_not_zerodivision():
    # hostile stream: Y sampling byte 0x01 (h=0) must raise the
    # contractual ValueError, not ZeroDivisionError
    for bad in (0x01, 0x10, 0x00):
        blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
        at = bytes(blob).index(b"\xff\xc0")
        assert blob[at + 11] == 0x11  # Y sampling byte
        blob[at + 11] = bad
        with pytest.raises(ValueError, match="sampling factors"):
            decode_jpeg(bytes(blob))


def test_grayscale_nonunit_sampling_decodes_noninterleaved():
    # T.81 A.2.2: a single-component scan is NON-interleaved — one
    # block per MCU in the component's raster order, whatever the
    # declared sampling factors. For a single-component FRAME the
    # component's dimensions equal the frame's, so patching the
    # sampling byte from 0x11 to 0x22 must not change the decode
    # (the old interleaved tiling read 2×2 blocks per MCU and went
    # out of phase with the entropy stream).
    rng = np.random.default_rng(7)
    g = rng.integers(0, 255, (24, 24), dtype=np.uint8)
    blob = bytearray(encode_jpeg(g, quality=95))
    at = bytes(blob).index(b"\xff\xc0")
    assert blob[at + 11] == 0x11
    expected = decode_jpeg(bytes(blob))
    blob[at + 11] = 0x22
    assert (decode_jpeg(bytes(blob)) == expected).all()
