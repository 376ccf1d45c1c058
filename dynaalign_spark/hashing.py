"""Vectorized hashing core shared by the Spark UDFs and the test oracle.

``murmur3_32_batch`` reimplements MurmurHash3 x86_32 bit-exactly to the
reference's implementation (reference ``src/minHash.cpp:21-64``): little-endian
4-byte blocks, the 3/2/1-byte tail switch, and the final avalanche. It is
vectorized over (token, seed) with numpy uint32 wraparound arithmetic, so a
whole Arrow batch of shingles is hashed with no per-row Python.

``minhash_batch`` fuses shingling -> hash -> column-min exactly like the
reference's fused loop (``src/minHash.cpp:146-157``): per document,
``sig[h] = min over k-mers of murmur3(kmer, seed_h)``, initialized to
UINT32_MAX. Documents with zero tokens keep the all-UINT32_MAX sentinel
(reference ``src/minHash.cpp:100-104`` returns an empty k-mer list for
len < k — SURVEY.md quirk Q2); callers turn those into NULL signatures.

Spark's builtin ``hash()`` is also murmur3-based but uses different seeding
and per-type mixing, so it cannot reproduce the reference; hence this UDF-side
implementation.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_M5 = np.uint32(5)
_N = np.uint32(0xE6546B64)
_F1 = np.uint32(0x85EBCA6B)
_F2 = np.uint32(0xC2B2AE35)

UINT32_MAX = np.uint32(0xFFFFFFFF)


def murmur3_32_batch(keys: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Hash ``n`` equal-length byte rows with ``m`` seeds -> (n, m) uint32.

    keys: (n, L) uint8 array (each row one token); seeds: (m,) uint32.
    """
    if keys.ndim != 2 or keys.dtype != np.uint8:
        raise ValueError("keys must be (n, L) uint8")
    n, length = keys.shape
    seeds = np.asarray(seeds, dtype=np.uint32)
    m = seeds.shape[0]
    h = np.broadcast_to(seeds[None, :], (n, m)).copy()

    nblocks = length // 4
    if nblocks:
        blk = keys[:, : nblocks * 4].reshape(n, nblocks, 4).astype(np.uint32)
        # little-endian u32 load, as the C++ reinterpret_cast on x86
        kblocks = (
            blk[:, :, 0]
            | (blk[:, :, 1] << np.uint32(8))
            | (blk[:, :, 2] << np.uint32(16))
            | (blk[:, :, 3] << np.uint32(24))
        )
        for i in range(nblocks):
            k = kblocks[:, i] * _C1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * _C2
            h ^= k[:, None]
            h = ((h << np.uint32(13)) | (h >> np.uint32(19))) * _M5 + _N

    tail = length & 3
    if tail:
        t = keys[:, nblocks * 4 :].astype(np.uint32)
        k1 = np.zeros(n, dtype=np.uint32)
        if tail == 3:
            k1 ^= t[:, 2] << np.uint32(16)
        if tail >= 2:
            k1 ^= t[:, 1] << np.uint32(8)
        k1 ^= t[:, 0]
        k1 = k1 * _C1
        k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
        k1 = k1 * _C2
        h ^= k1[:, None]

    h ^= np.uint32(length)
    h ^= h >> np.uint32(16)
    h = h * _F1
    h ^= h >> np.uint32(13)
    h = h * _F2
    h ^= h >> np.uint32(16)
    return h


def murmur3_32(key: bytes, seed: int) -> int:
    """Scalar convenience wrapper (tests, small oracles)."""
    arr = np.frombuffer(key, dtype=np.uint8).reshape(1, -1) if key else np.zeros((1, 0), np.uint8)
    return int(murmur3_32_batch(arr, np.array([seed], np.uint32))[0, 0])


def _windows(buf: np.ndarray, starts: np.ndarray, k: int) -> np.ndarray:
    """Gather (T, k) uint8 windows from a flat buffer at the given starts."""
    if len(starts) == 0:
        return np.zeros((0, k), np.uint8)
    idx = starts[:, None] + np.arange(k, dtype=np.int64)[None, :]
    return buf[idx]


def shingle_starts(lengths: np.ndarray, offsets: np.ndarray, k: int):
    """Per-doc window start indices into the concatenated buffer.

    Returns (starts, doc_index, counts): counts[i] = max(len_i - k + 1, 0).
    """
    counts = np.maximum(lengths - k + 1, 0).astype(np.int64)
    doc_index = np.repeat(np.arange(len(lengths), dtype=np.int64), counts)
    # start positions: offsets[doc] + (0..counts[doc]-1)
    within = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    starts = offsets[doc_index] + within
    return starts, doc_index, counts


def _hash_tokens_min(
    windows: np.ndarray, doc_index: np.ndarray, n_docs: int, seeds: np.ndarray
) -> np.ndarray:
    """min-hash (n_docs, n_hash) over equal-length tokens, UINT32_MAX init.

    Dedupes tokens inside the batch first (documents share shingles heavily)
    so murmur runs once per distinct token, then takes a segmented minimum
    per document.
    """
    out = np.full((n_docs, len(seeds)), UINT32_MAX, dtype=np.uint32)
    if windows.shape[0] == 0:
        return out
    k = windows.shape[1]
    if k <= 8:
        packed = np.zeros(windows.shape[0], np.uint64)
        for j in range(k):
            packed |= windows[:, j].astype(np.uint64) << np.uint64(8 * j)
        uniq, inv = np.unique(packed, return_inverse=True)
        first = np.zeros(len(uniq), np.int64)
        first[inv[::-1]] = np.arange(windows.shape[0] - 1, -1, -1)
        uwin = windows[first]
    else:
        view = windows.view([("", np.uint8)] * k).ravel()
        _, first, inv = np.unique(view, return_index=True, return_inverse=True)
        uwin = windows[first]
    uh = murmur3_32_batch(uwin, seeds)          # (U, m)
    th = uh[inv]                                # (T, m)
    # segmented min per doc: tokens are already grouped by doc_index ascending
    boundaries = np.flatnonzero(np.diff(doc_index, prepend=-1))
    mins = np.minimum.reduceat(th, boundaries, axis=0)
    out[doc_index[boundaries]] = mins
    return out


def minhash_batch(
    texts, k: int, seeds, phash=None, phash_gram: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """MinHash signatures for a batch of strings (+ optional phash fusion).

    texts: iterable of str/None. phash: optional iterable of int64/None —
    fused by shingling the 16 hex nibbles of the 64-bit phash into
    ``phash_gram``-grams tagged with a 0xFF marker byte (disjoint token space
    from caption shingles), then taking the elementwise min of both partial
    signatures — identical to one fused token stream because
    min(union) == min(min(A), min(B)).

    Returns (signatures (n, n_hash) uint32, has_tokens (n,) bool).
    """
    seeds = np.asarray(seeds, dtype=np.uint32)
    enc = [t.encode("utf-8") if isinstance(t, str) else (t or b"") for t in texts]
    lengths = np.array([len(b) for b in enc], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1])) if len(enc) else np.zeros(0, np.int64)
    buf = (
        np.frombuffer(b"".join(enc), dtype=np.uint8)
        if lengths.sum()
        else np.zeros(0, np.uint8)
    )
    starts, doc_index, counts = shingle_starts(lengths, offsets, k)
    windows = _windows(buf, starts, k)
    sig = _hash_tokens_min(windows, doc_index, len(enc), seeds)
    has = counts > 0

    if phash is not None:
        ph = np.array(
            [0 if p is None else int(np.uint64(np.int64(p))) for p in phash],
            dtype=np.uint64,
        )
        valid = np.array([p is not None for p in phash])
        # 16 hex nibbles -> (phash_gram+1)-byte tokens: 0xFF marker + gram nibbles
        nib = np.zeros((len(ph), 16), np.uint8)
        for j in range(16):
            nib[:, j] = ((ph >> np.uint64(4 * (15 - j))) & np.uint64(0xF)).astype(np.uint8)
        ngrams = 16 - phash_gram + 1
        toks = np.zeros((len(ph) * ngrams, phash_gram + 1), np.uint8)
        toks[:, 0] = 0xFF
        for g in range(ngrams):
            toks[g::ngrams, 1:] = nib[:, g : g + phash_gram]
        pdoc = np.repeat(np.arange(len(ph), dtype=np.int64), ngrams)
        keep = np.repeat(valid, ngrams)
        psig = _hash_tokens_min(toks[keep], pdoc[keep], len(enc), seeds)
        sig = np.minimum(sig, psig)
        has = has | valid

    return sig, has


def signature_agreement(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Fraction of agreeing signature components (reference
    ``src/minHash.cpp:167-174``). Inputs (n, n_hash) -> (n,) float64."""
    return (sig_a == sig_b).mean(axis=1)


def simhash_bits(features: np.ndarray, seed: int, bits: int = 64) -> np.ndarray:
    """SimHash over dense feature rows: sign of random gaussian projections,
    packed little-bit-endian into int64. features: (n, d) float."""
    rng = np.random.Generator(np.random.PCG64(seed))
    d = features.shape[1]
    planes = rng.standard_normal((d, bits))
    proj = features.astype(np.float64) @ planes
    b = (proj >= 0).astype(np.uint64)
    out = np.zeros(features.shape[0], np.uint64)
    for i in range(bits):
        out |= b[:, i] << np.uint64(i)
    return out.view(np.int64)


def simhash_planes_int(d: int, seed: int, bits: int = 64,
                       scale: int = 1024) -> np.ndarray:
    """Integer-quantized hyperplanes: round(N(0,1) * scale) from a seeded
    PCG64 — deterministic, and small enough to inline as SQL literals in the
    driver's DuckDB twin. -> (d, bits) int64."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return np.rint(rng.standard_normal((d, bits)) * scale).astype(np.int64)


def simhash_bits_int(sums: np.ndarray, seed: int, bits: int = 64,
                     scale: int = 1024) -> np.ndarray:
    """Integer-lattice SimHash over per-row int64 feature sums (the pixel
    tier's codec.luma_grid_sums blocks), packed little-bit-endian into int64.

    Sign of the mean-centered projection, computed EXACTLY in int64: with
    features f_c = s_c / A (A = per-row positive block area) and mean
    m = (sum_c f_c) / d,

        sign(sum_c (f_c - m) * p_c)  ==  sign(d * sum_c s_c p_c
                                              - (sum_c s_c)(sum_c p_c))

    (multiply through by A*d > 0). No float enters the decision, so the
    fingerprint is bit-identical on any engine / BLAS / hardware — numpy
    here, pure integer SQL in the driver's DuckDB oracle. Ties (projection
    exactly 0) are deterministic too: bit = 1.

    Bound: |d * sum s*p| <= d^2 * max_s * max|p|; at grid 16 (d=256),
    255000-scaled luma blocks and scale=1024 (|p| <~ 5*1024) this caps the
    exact range at images of ~5 Mpx — downsample larger inputs first.

    sums: (n, d) int64. -> (n,) int64 fingerprints.
    """
    sums = np.ascontiguousarray(sums, dtype=np.int64)
    d = sums.shape[1]
    planes = simhash_planes_int(d, seed, bits, scale)
    # integer matmul: numpy's own int64 kernels (not BLAS) — exact
    proj = d * (sums @ planes) - sums.sum(axis=1, keepdims=True) * planes.sum(
        axis=0, keepdims=True
    )
    b = (proj >= 0).astype(np.uint64)
    out = np.zeros(sums.shape[0], np.uint64)
    for i in range(bits):
        out |= b[:, i] << np.uint64(i)
    return out.view(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hamming distance between int64 bit-fingerprints (vectorized popcount)."""
    x = (np.asarray(a).view(np.uint64)) ^ (np.asarray(b).view(np.uint64))
    cnt = np.zeros(x.shape, np.uint64)
    for shift in range(0, 64, 8):
        byte = (x >> np.uint64(shift)) & np.uint64(0xFF)
        cnt += _POPCNT8[byte.astype(np.intp)]
    return cnt.astype(np.int64)


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint64)
