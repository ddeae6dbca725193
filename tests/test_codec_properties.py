"""Property-based codec round-trips (hypothesis): lossless formats
must be exact for arbitrary shapes/channel counts/content."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from us_immigration_data_lake_spark.operators.codecs import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)
from us_immigration_data_lake_spark.operators.gif import decode_gif, encode_gif

SETTINGS = settings(max_examples=10, deadline=None)

_DIMS = st.tuples(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)


@SETTINGS
@given(_DIMS, st.integers(min_value=1, max_value=4), st.integers(0, 2**32 - 1))
def test_png_roundtrip_exact(dims, ch, seed):
    h, w = dims
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


@SETTINGS
@given(_DIMS, st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_exact(dims, seed):
    h, w = dims
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()


@SETTINGS
@given(
    _DIMS,
    st.integers(min_value=2, max_value=256),
    st.integers(0, 2**32 - 1),
)
def test_gif_roundtrip_exact(dims, n_colors, seed):
    h, w = dims
    rng = np.random.default_rng(seed)
    pal = np.unique(
        rng.integers(0, 256, (n_colors, 3), dtype=np.uint8), axis=0
    )
    px = pal[rng.integers(0, len(pal), (h, w))]
    assert (decode_gif(encode_gif(px)) == px).all()
