"""Codec + perceptual-hash tests (the per-row invariant machinery from
BASELINE.json input_hint: decoded-pixel allclose / PSNR >= 40 dB + caption
equality)."""

import numpy as np

from dynaalign_spark.codec import (
    decode_image,
    encode_ppm,
    encode_qrs,
    phash64,
    psnr,
    simhash_features,
)
from dynaalign_spark.hashing import hamming64


def _img(seed=0, h=24, w=32):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_lossless():
    pix = _img(1)
    assert (decode_image(encode_ppm(pix), "ppm") == pix).all()


def test_qrs_lossy_within_psnr():
    pix = _img(2)
    dec = decode_image(encode_qrs(pix), "qrs")
    assert dec.shape == pix.shape
    assert psnr(pix, dec) >= 40.0  # the input_hint lossy bound


def test_unknown_fmt_is_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_phash_stable_under_small_perturbation():
    rng = np.random.Generator(np.random.PCG64(3))
    yy, xx = np.mgrid[0:32, 0:32].astype(float)
    base = np.clip(
        128 + 80 * np.sin(xx / 5) + 60 * np.cos(yy / 7) + rng.normal(0, 4, (32, 32)),
        0, 255,
    ).astype(np.uint8)[..., None].repeat(3, axis=2)
    near = np.clip(base.astype(int) + rng.integers(-2, 3, base.shape), 0, 255).astype(
        np.uint8
    )
    far = _img(9, 32, 32)
    h0, h1, h2 = phash64(base), phash64(near), phash64(far)
    d_near = hamming64(np.array([h0]), np.array([h1]))[0]
    d_far = hamming64(np.array([h0]), np.array([h2]))[0]
    assert d_near <= 10
    assert d_near < d_far


def test_simhash_features_shape_and_centering():
    f = simhash_features(_img(4), grid=16)
    assert f.shape == (256,)
    assert abs(f.mean()) < 1e-9


def test_luma_grid_sums_matches_bruteforce_block_sums():
    from dynaalign_spark.codec import luma_grid_sums

    pix = _img(11, h=33, w=47)  # non-divisible -> crop to 32x40 at grid 8
    g = 8
    s = luma_grid_sums(pix, grid=g)
    h2, w2 = 32, 40
    p = pix[:h2, :w2].astype(np.int64)
    lum = 299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]
    bh, bw = h2 // g, w2 // g
    brute = np.array(
        [
            lum[i * bh:(i + 1) * bh, j * bw:(j + 1) * bw].sum()
            for i in range(g)
            for j in range(g)
        ],
        dtype=np.int64,
    )
    assert s.dtype == np.int64 and s.shape == (g * g,)
    assert (s == brute).all()


def test_luma_grid_sums_rejects_too_small_image():
    import pytest

    from dynaalign_spark.codec import luma_grid_sums

    with pytest.raises(ValueError):
        luma_grid_sums(_img(12, h=7, w=40), grid=8)
