"""Deterministic image codecs + perceptual hashing (numpy-only).

The sandbox has no PIL/JPEG, so the `fmt` column uses two self-contained
codecs (FIXTURES.md §1):

- ``ppm``  — standard binary PPM (P6), lossless RGB.
- ``qrs``  — our deterministic lossy codec: uniform quantization by step q
             (midpoint reconstruction). decode(encode(x)) stays within
             PSNR >= 40 dB of x for q <= 4, which exercises the lossy branch
             of the per-row invariant (BASELINE.json input_hint).

Also implements the 64-bit perceptual hash (DCT-sign pHash: grayscale ->
32x32 area resize -> DCT-II -> 8x8 low-frequency block -> sign vs median)
and the SimHash feature extractor used by the pixel tier. These are the
image-domain analogs of the reference's k-mer shingling of symbol streams
(reference ``R/minHash.R:12-23``): a fixed fingerprint per record whose
bit/char grams feed the MinHash/SimHash machinery.
"""

from __future__ import annotations

import numpy as np

QRS_STEP = 4


def encode_ppm(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pix.astype(np.uint8).tobytes()


def encode_qrs(pix: np.ndarray, q: int = QRS_STEP) -> bytes:
    h, w, _ = pix.shape
    head = b"QRS1" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([q])
    return head + (pix.astype(np.uint8) // q).tobytes()


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """-> (h, w, 3) uint8."""
    if fmt == "ppm":
        if not data.startswith(b"P6"):
            raise ValueError("bad ppm header")
        parts = data.split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        pix = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3)
        return pix.reshape(h, w, 3).copy()
    if fmt == "qrs":
        if data[:4] != b"QRS1":
            raise ValueError("bad qrs header")
        w = int.from_bytes(data[4:6], "little")
        h = int.from_bytes(data[6:8], "little")
        q = data[8]
        pix = np.frombuffer(data[9:], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
        return np.minimum(pix.astype(np.int32) * q + q // 2, 255).astype(np.uint8)
    raise NotImplementedError(
        f"fmt {fmt!r}: real-world codecs (jpeg/png/webp) are stubbed in this "
        "sandbox — plug a decoder into decode_image(); the Spark-side plumbing "
        "(binary column, pandas-UDF batch shape) is codec-agnostic."
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def to_gray(pix: np.ndarray) -> np.ndarray:
    return (
        0.299 * pix[..., 0] + 0.587 * pix[..., 1] + 0.114 * pix[..., 2]
    ).astype(np.float64)


def area_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-average resize via bucketed means (no scipy)."""
    h, w = gray.shape
    if h % out_h == 0 and w % out_w == 0:
        # fast path: exact block mean via reshape (identical to the integral-
        # image result when buckets are uniform)
        return gray.reshape(out_h, h // out_h, out_w, w // out_w).mean(axis=(1, 3))
    ys = (np.arange(out_h + 1) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w // out_w).astype(np.int64)
    integ = np.zeros((h + 1, w + 1), np.float64)
    integ[1:, 1:] = gray.cumsum(0).cumsum(1)
    out = np.empty((out_h, out_w), np.float64)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        row = integ[y1] - integ[y0]
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = (row[x1] - row[x0]) / ((y1 - y0) * (x1 - x0))
    return out


_DCT32 = None


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= 1 / np.sqrt(2)
    return m * np.sqrt(2 / n)


def phash64(pix: np.ndarray) -> int:
    """Classic DCT pHash -> signed int64 (the `phash` input column)."""
    global _DCT32
    if _DCT32 is None:
        _DCT32 = _dct_matrix(32)
    g = area_resize(to_gray(pix), 32, 32)
    d = _DCT32 @ g @ _DCT32.T
    low = d[:8, :8].copy()
    med = np.median(np.concatenate([low.ravel()[1:]]))  # skip DC for the median
    bits = (low.ravel() > med).astype(np.uint64)
    out = 0
    for i in range(64):
        out |= int(bits[i]) << i
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash_features(pix: np.ndarray, grid: int = 16) -> np.ndarray:
    """Mean-centered downsampled luma grid -> (grid*grid,) float feature row.

    Generic float feature path (kept for dense-feature simhash_bits); the
    pixel dedup tier uses luma_grid_sums + hashing.simhash_bits_int instead —
    an integer-exact formulation whose fingerprints are bit-identical across
    engines/BLAS/hardware (and therefore SQL-oracle-checkable)."""
    g = area_resize(to_gray(pix), grid, grid).ravel()
    return g - g.mean()


def luma_grid_sums(pix: np.ndarray, grid: int = 16) -> np.ndarray:
    """Integer-exact luma feature grid for the pixel SimHash fingerprint.

    Per-pixel integer luma L = 299*r + 587*g + 114*b (the same 1000-scaled
    weights the decode stats path uses), image cropped to the largest
    grid-divisible window (margin <= grid-1 px), then summed over the
    grid x grid equal blocks. Everything is int64 — no float op, no
    summation-order hazard — so any engine (numpy, Spark, DuckDB SQL)
    computes the identical vector from the same decoded pixels.

    The un-normalized block SUM is a positive per-image scalar multiple
    (block_area * 1000) of the block-mean luma, and simhash_bits_int's
    centered projection is scale-invariant per row, so fingerprints remain
    comparable across image sizes exactly as the float path's were.
    -> (grid*grid,) int64.
    """
    h, w = pix.shape[0], pix.shape[1]
    h2, w2 = (h // grid) * grid, (w // grid) * grid
    if h2 == 0 or w2 == 0:
        raise ValueError(f"image {h}x{w} smaller than simhash grid {grid}")
    p = pix[:h2, :w2].astype(np.int64)
    lum = 299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]
    return (
        lum.reshape(grid, h2 // grid, grid, w2 // grid)
        .sum(axis=(1, 3))
        .ravel()
    )
