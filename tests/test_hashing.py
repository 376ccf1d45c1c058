"""Unit tests for the vectorized hashing core — mirrors the reference's
operator unit tests (/root/reference/tests/testthat/test-minHash.R) plus
bit-exactness checks of murmur3_32 against published MurmurHash3 x86_32
test vectors (same algorithm as /root/reference/src/minHash.cpp:21-64)."""

import numpy as np
import pytest

from dynaalign_spark.hashing import (
    hamming64,
    minhash_batch,
    murmur3_32,
    murmur3_32_batch,
    signature_agreement,
    simhash_bits,
)

# Published MurmurHash3 x86_32 vectors (public domain reference impl).
MURMUR_VECTORS = [
    (b"", 0, 0x00000000),
    (b"", 1, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39),
    (b"\x00\x00\x00\x00", 0, 0x2362F9DE),
    (b"aaaa", 0x9747B28C, 0x5A97808A),
    (b"aaa", 0x9747B28C, 0x283E0130),
    (b"aa", 0x9747B28C, 0x5D211726),
    (b"a", 0x9747B28C, 0x7FA09EA6),
    (b"abcd", 0x9747B28C, 0xF0478627),
    (b"abc", 0x9747B28C, 0xC84A62DD),
    (b"ab", 0x9747B28C, 0x74875592),
    (b"Hello, world!", 0x9747B28C, 0x24884CBA),
]


@pytest.mark.parametrize("key,seed,expected", MURMUR_VECTORS)
def test_murmur3_32_vectors(key, seed, expected):
    assert murmur3_32(key, seed) == expected


def test_murmur3_batch_matches_scalar():
    keys = np.frombuffer(b"abcdwxyzijkl", dtype=np.uint8).reshape(3, 4)
    seeds = np.array([0, 1, 0x9747B28C], dtype=np.uint32)
    out = murmur3_32_batch(keys, seeds)
    for i, tok in enumerate([b"abcd", b"wxyz", b"ijkl"]):
        for j, s in enumerate([0, 1, 0x9747B28C]):
            assert out[i, j] == murmur3_32(tok, int(s))


def shingles(s: str, k: int) -> set:
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def test_shingle_golden_case():
    # reference tests/testthat/test-minHash.R:2-14 — "ABCDEF", k=3
    assert sorted(shingles("ABCDEF", 3)) == ["ABC", "BCD", "CDE", "DEF"]
    # k == len -> single shingle (reference :12-13)
    assert shingles("ABC", 3) == {"ABC"}


def test_minhash_matches_bruteforce():
    """sig[h] == min over shingles of murmur3(shingle, seed_h) — the fused
    loop of reference src/minHash.cpp:146-157."""
    seeds = [7, 99, 123456]
    texts = ["ABCDEF", "the quick brown fox", "AAAA", "xyz"]
    sig, has = minhash_batch(texts, 3, seeds)
    assert has.all()
    for i, t in enumerate(texts):
        for j, s in enumerate(seeds):
            expect = min(murmur3_32(sh.encode(), s) for sh in shingles(t, 3))
            assert sig[i, j] == expect


def test_minhash_short_text_sentinel():
    """len < k -> zero shingles -> all-UINT32_MAX signature, has=False
    (reference src/minHash.cpp:100-104, quirk Q2)."""
    sig, has = minhash_batch(["ab", "abcd"], 4, [1, 2])
    assert not has[0] and has[1]
    assert (sig[0] == 0xFFFFFFFF).all()


def test_minhash_none_text():
    sig, has = minhash_batch([None, "abcdef"], 4, [1])
    assert not has[0] and has[1]


def test_minhash_phash_fusion_is_min_of_unions():
    """Fused signature == elementwise min of caption-only and phash-only
    partial signatures (min over a union of token sets)."""
    seeds = [5, 17]
    texts = ["hello world", "spark engine"]
    ph = [0xF23456789ABCDEF0 - (1 << 64), 42]  # one negative int64, one small
    fused, has = minhash_batch(texts, 4, seeds, phash=ph)
    cap_only, _ = minhash_batch(texts, 4, seeds)
    ph_only, _ = minhash_batch(["", ""], 4, seeds, phash=ph)
    assert (fused == np.minimum(cap_only, ph_only)).all()
    assert has.all()


def test_minhash_phash_gives_short_captions_a_signature():
    sig, has = minhash_batch(["ab"], 4, [1, 2], phash=[99])
    assert has[0]
    assert (sig[0] != 0xFFFFFFFF).any()


def test_signature_agreement_bounds_and_identity():
    sig, _ = minhash_batch(["abcdef", "abcdef", "zzzzzz"], 3, list(range(10)))
    assert signature_agreement(sig[[0]], sig[[1]])[0] == 1.0
    v = signature_agreement(sig[[0]], sig[[2]])[0]
    assert 0.0 <= v <= 1.0


def test_simhash_deterministic_and_locality():
    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.standard_normal((4, 64))
    near = base + rng.standard_normal((4, 64)) * 0.01
    far = rng.standard_normal((4, 64))
    a = simhash_bits(base, seed=4242)
    b = simhash_bits(near, seed=4242)
    c = simhash_bits(far, seed=4242)
    assert (a == simhash_bits(base, seed=4242)).all()
    assert hamming64(a, b).mean() < hamming64(a, c).mean()


def test_hamming64():
    a = np.array([0, -1, 0x0F], dtype=np.int64)
    b = np.array([0, 0, 0x00], dtype=np.int64)
    assert hamming64(a, b).tolist() == [0, 64, 4]


def test_simhash_bits_int_sign_matches_float_centering_and_scale_invariance():
    from dynaalign_spark.hashing import simhash_bits_int, simhash_planes_int

    rng = np.random.Generator(np.random.PCG64(9))
    sums = rng.integers(0, 255_000, (80, 64)).astype(np.int64)
    f = simhash_bits_int(sums, seed=11)
    # per-row positive scaling (different block areas) never changes the bits
    assert (simhash_bits_int(sums * 7, seed=11) == f).all()
    # sign of the exact integer projection == sign of the float centered
    # projection wherever the float is comfortably away from 0
    planes = simhash_planes_int(64, seed=11)
    d = sums.shape[1]
    proj = d * (sums @ planes) - sums.sum(1, keepdims=True) * planes.sum(
        0, keepdims=True
    )
    cent = sums.astype(np.float64)
    cent -= cent.mean(1, keepdims=True)
    proj_f = cent @ planes.astype(np.float64)
    safe = np.abs(proj_f) > 1.0
    assert (np.sign(proj[safe]) == np.sign(proj_f[safe])).all()
    # packing: bit i of row r == (proj[r, i] >= 0)
    bits = (proj >= 0).astype(np.uint64)
    man = np.zeros(sums.shape[0], np.uint64)
    for i in range(64):
        man |= bits[:, i] << np.uint64(i)
    assert (man.view(np.int64) == f).all()


def test_simhash_bits_int_locality():
    from dynaalign_spark.hashing import simhash_bits_int

    rng = np.random.Generator(np.random.PCG64(10))
    base = rng.integers(0, 255_000, (6, 256)).astype(np.int64)
    near = base + rng.integers(-500, 500, base.shape)
    far = rng.integers(0, 255_000, base.shape).astype(np.int64)
    a = simhash_bits_int(base, seed=4242)
    b = simhash_bits_int(near, seed=4242)
    c = simhash_bits_int(far, seed=4242)
    assert hamming64(a, b).mean() < hamming64(a, c).mean()
