"""Property-based codec fuzz: encode→decode identity for lossless formats
and the PSNR ≥ 40 dB invariant for the quantized format, over random image
shapes and pixel contents (hypothesis). Complements the fixed-fixture pins
in tests/test_image.py."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark import image as IMG


@st.composite
def images(draw):
    w = draw(st.integers(min_value=1, max_value=40))
    h = draw(st.integers(min_value=1, max_value=40))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(px=images())
def test_lossless_roundtrip_exact(px):
    for fmt in ("ppm", "bmp", "png"):
        out = IMG.DECODERS[fmt](IMG.ENCODERS[fmt](px))
        assert np.array_equal(out, px), fmt


@settings(max_examples=40, deadline=None)
@given(px=images())
def test_qnt_roundtrip_psnr(px):
    out = IMG.DECODERS["qnt"](IMG.ENCODERS["qnt"](px))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3
    p = IMG.psnr_db(out, px)
    assert p == IMG.PSNR_EXACT or p >= 40.0
