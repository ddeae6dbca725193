"""PNG codec: spec-fixture decoding (every filter type), round-trips,
CRC validation, and multimodal dispatch."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from us_immigration_data_lake_spark.operators.codecs import (
    PNG_SIG,
    _paeth,
    decode_png,
    encode_png,
)
from us_immigration_data_lake_spark.operators.multimodal import decode_image


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_from_raw(w: int, h: int, color_type: int, raw: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 1), (4, 3, 2), (6, 5, 3), (3, 4, 4)])
def test_roundtrip_all_channel_counts(shape):
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(px))
    expect = px[:, :, None] if px.ndim == 2 else px
    assert out.shape == expect.shape
    assert (out == expect).all()


def test_filter_types_sub_up_average_paeth_decode():
    # one RGB image, each row filtered with a different type, filtered
    # bytes computed from the spec formulas — the decoder must invert
    # every one of them.
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    stride, ch = 12, 3
    rows = px.reshape(5, stride).astype(int)
    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y]
        prev = rows[y - 1] if y > 0 else np.zeros(stride, dtype=int)
        filt = np.zeros(stride, dtype=int)
        for i in range(stride):
            left = cur[i - ch] if i >= ch else 0
            up = prev[i]
            upleft = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, upleft)
            filt[i] = (cur[i] - pred) % 256
        raw.append(ftype)
        raw.extend(int(v) for v in filt)
    out = decode_png(_png_from_raw(4, 5, 2, bytes(raw)))
    assert (out == px).all()


def test_crc_corruption_detected():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    # flip a byte inside the IDAT payload (after its length+type)
    idat_at = bytes(data).index(b"IDAT")
    data[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_unsupported_bit_depth_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    blob = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(blob)


def test_paeth_spec_vectors():
    # ties break left, then up, then up-left (spec §9.4 ordering)
    assert _paeth(7, 7, 7) == 7        # all equal → left wins the tie
    assert _paeth(10, 20, 30) == 10    # p=0: left is nearest
    assert _paeth(5, 200, 100) == 100  # p=105: up-left is nearest (pc=5)
    assert _paeth(0, 255, 255) == 0    # p=0: pa=0 beats pb=pc=255


def test_paeth_reference_implementation_parity():
    # exhaustive parity against a straight spec transcription
    def ref(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    rng = np.random.default_rng(5)
    for _ in range(500):
        a, b, c = (int(v) for v in rng.integers(0, 256, 3))
        assert _paeth(a, b, c) == ref(a, b, c)


def test_decode_image_dispatches_png():
    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    assert (decode_image(encode_png(px)) == px).all()


def test_resize_media_real_path_for_png(spark):
    from us_immigration_data_lake_spark.operators.multimodal import resize_media

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(px)))], "media_id long, content binary"
    )
    out = resize_media(df, 4, 4).collect()[0]
    decoded = decode_png(bytes(out.content))
    assert decoded.shape == (4, 4, 3)
    # nearest-neighbor: every output pixel is an exact source pixel
    rows = (np.arange(4) * 8) // 4
    cols = (np.arange(4) * 6) // 4
    assert (decoded == px[rows][:, cols]).all()


def test_adaptive_filters_roundtrip_and_compress_better():
    xx, yy = np.meshgrid(np.arange(120), np.arange(90))
    img = np.stack(
        [(xx + yy) % 256, (xx * 2) % 256, (yy * 2) % 256], axis=-1
    ).astype(np.uint8)
    adaptive = encode_png(img, filter_strategy="adaptive")
    plain = encode_png(img, filter_strategy="none")
    assert (decode_png(adaptive) == img).all()
    assert (decode_png(plain) == img).all()
    # gradients filter to near-constant rows → dramatic DEFLATE gain
    assert len(adaptive) * 5 < len(plain)


def test_adaptive_uses_multiple_filter_types():
    # mixed content: flat region + gradient + noise rows should make
    # the per-row chooser pick at least two distinct filter types
    import zlib as _z

    rng = np.random.default_rng(8)
    img = np.concatenate([
        np.full((10, 64), 7, np.uint8),
        (np.arange(64)[None, :] * np.ones((10, 1))).astype(np.uint8),
        rng.integers(0, 256, (10, 64), dtype=np.uint8),
    ])
    blob = encode_png(img)
    # pull filter bytes back out of the decompressed stream
    idat_at = blob.index(b"IDAT") + 4
    (ln,) = __import__("struct").unpack(">I", blob[idat_at - 8 : idat_at - 4])
    raw = _z.decompress(blob[idat_at : idat_at + ln])
    stride = 64 * 1
    ftypes = {raw[y * (stride + 1)] for y in range(30)}
    assert len(ftypes) >= 2
    assert (decode_png(blob) == img[:, :, None]).all()
