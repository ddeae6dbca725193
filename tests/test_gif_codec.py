"""GIF codec: LZW round-trips (including code-width growth and table
reset), interlace reordering, indexed-format limits, dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from us_immigration_data_lake_spark.operators.gif import (
    decode_gif,
    encode_gif,
)
from us_immigration_data_lake_spark.operators.multimodal import decode_image


def test_roundtrip_small_palettes():
    rng = np.random.default_rng(4)
    for n_colors in (2, 5, 16, 130):
        pal = np.unique(
            rng.integers(0, 256, (n_colors, 3), dtype=np.uint8), axis=0
        )
        px = pal[rng.integers(0, len(pal), (17, 23))]
        assert (decode_gif(encode_gif(px)) == px).all()


def test_roundtrip_full_table_growth_and_reset():
    # big noisy 256-color image: LZW table grows through every code
    # width and hits the 4096-entry reset path
    rng = np.random.default_rng(7)
    pal = np.unique(rng.integers(0, 256, (300, 3), dtype=np.uint8), axis=0)[:256]
    px = pal[rng.integers(0, 256, (128, 128))]
    assert (decode_gif(encode_gif(px)) == px).all()


def test_interlaced_frame_reordered():
    # hand-build an interlaced variant: encode normally, then rewrite
    # the image as interlaced row order with the flag set
    import struct

    from us_immigration_data_lake_spark.operators.gif import (
        _INTERLACE_PASSES,
        _lzw_encode,
    )

    rng = np.random.default_rng(9)
    pal = np.unique(rng.integers(0, 256, (16, 3), dtype=np.uint8), axis=0)
    h, w = 13, 8
    idx = rng.integers(0, len(pal), (h, w))
    px = pal[idx]
    # rows in interlace transmission order
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    transmitted = idx[order].astype(np.uint8).reshape(-1)
    n_pal = 16
    depth = 4
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    pal_full = np.zeros((n_pal, 3), np.uint8)
    pal_full[: len(pal)] = pal
    out += pal_full.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(4)
    data = _lzw_encode(4, transmitted)
    for i in range(0, len(data), 255):
        out.append(len(data[i : i + 255]))
        out += data[i : i + 255]
    out += b"\x00\x3b"
    assert (decode_gif(bytes(out)) == px).all()


def test_too_many_colors_rejected():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # ~4k colors
    with pytest.raises(ValueError, match="indexed"):
        encode_gif(px)


def test_truncated_stream_raises():
    px = np.zeros((8, 8, 3), np.uint8)
    blob = encode_gif(px)
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) // 2] + b"\x00\x3b")


def test_decode_image_dispatches_gif():
    px = np.full((5, 6, 3), 17, np.uint8)
    assert (decode_image(encode_gif(px)) == px).all()


def test_bmp_roundtrip_and_dispatch():
    from us_immigration_data_lake_spark.operators.codecs import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(12)
    for shape in [(7, 5, 3), (3, 9, 3)]:  # widths needing row padding
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()
        assert (decode_image(encode_bmp(px)) == px).all()
    with pytest.raises(ValueError, match="24-bit"):
        # 8-bit BMP header
        blob = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
        blob[28] = 8
        decode_bmp(bytes(blob))
