"""Pin the round-4 integer-SSE psnr_db against the float64 definition.

crawlspark.image.psnr_db was rewritten from `mean(square(float64(diff)))`
to an int16-diff / int32-square / int64-sum accumulation for ~2.5× less
DRAM traffic (the payload phase is memory-bandwidth-bound on the wide
leg — BENCH/BASELINE.md §2d). The rewrite is exact, not approximate:
every partial sum is an integer below 2^53 (worst case 255²·3·384² ≈
2.9e10), so both formulations round only once, at the final division.
These tests keep that bit-for-bit equivalence pinned against future
edits, including the PSNR_EXACT (mse == 0) sentinel the lossless formats
rely on.
"""

import numpy as np
import pytest

from crawlspark import image as I


def _psnr_f64(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.int16) - b.astype(np.int16)
    mse = np.mean(np.square(d.astype(np.float64)))
    if mse == 0:
        return I.PSNR_EXACT
    return float(10.0 * np.log10(255.0**2 / mse))


@pytest.mark.parametrize("size", [16, 64, 224])
def test_codec_roundtrips_bitident(size):
    for trial in range(5):
        ref = I.reference_pixels(f"pin-{size}-{trial}", size, size)
        for fmt, enc in I.ENCODERS.items():
            dec = I.DECODERS[fmt](enc(ref))
            a, b = _psnr_f64(dec, ref), I.psnr_db(dec, ref)
            assert repr(a) == repr(b), (fmt, size, trial)


def test_noise_and_extremes_bitident():
    rng = np.random.Generator(np.random.PCG64(99))
    for size in (32, 224, 384):
        ref = I.reference_pixels(f"noise-{size}", size, size)
        noisy = ref.copy()
        mask = rng.random(ref.shape) < 0.1
        noisy[mask] = rng.integers(0, 256, int(mask.sum()), dtype=np.uint8)
        assert repr(_psnr_f64(noisy, ref)) == repr(I.psnr_db(noisy, ref))
    # worst-case sum (max diff everywhere) still exact in both paths
    z, f = np.zeros((384, 384, 3), np.uint8), np.full((384, 384, 3), 255, np.uint8)
    assert repr(_psnr_f64(z, f)) == repr(I.psnr_db(z, f))


def test_exact_sentinel():
    ref = I.reference_pixels("exact", 64, 64)
    assert I.psnr_db(ref, ref) == I.PSNR_EXACT
    off = ref.copy()
    off[0, 0, 0] ^= 1  # single LSB flip must NOT read as exact
    assert I.psnr_db(off, ref) != I.PSNR_EXACT


def test_uint8_contract_rejects_other_dtypes():
    # round-5 ADVICE: the in-place int16 subtract would silently WRAP for
    # uint16 inputs and raise an opaque UFuncTypeError for float/int32 —
    # the contract check turns both into a clear TypeError up front
    import pytest

    ref = I.reference_pixels("dtype", 16, 16)
    for bad in (ref.astype(np.uint16), ref.astype(np.int32), ref.astype(np.float64)):
        with pytest.raises(TypeError, match="uint8"):
            I.psnr_db(bad, ref)
        with pytest.raises(TypeError, match="uint8"):
            I.psnr_db(ref, bad)
