"""Property-based tests (hypothesis) over the pure-Python kernels the Spark
engine and the parity oracle share: murmur3, type-7 quantile, Louvain,
winnowing. The reference has no property framework (SURVEY.md §5.1); these
guard the invariants its golden tests only spot-check."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dynaalign_spark.hashing import (
    hamming64,
    minhash_batch,
    murmur3_32,
    murmur3_32_batch,
    signature_agreement,
    simhash_bits,
)
from dynaalign_spark.louvain import louvain, modularity
from dynaalign_spark.oracle import quantile_type7

SEEDS = np.array([0, 1, 0xDEADBEEF, 2**32 - 1], dtype=np.uint64)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=64), st.integers(0, 2**32 - 1))
def test_murmur3_batch_matches_scalar(key, seed):
    arr = np.frombuffer(key, dtype=np.uint8).reshape(1, -1)
    batch = murmur3_32_batch(arr, np.array([seed], dtype=np.uint32))
    assert int(batch[0, 0]) == murmur3_32(key, seed)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.floats(0, 1, allow_nan=False), min_size=1, max_size=200),
    st.floats(0, 1),
)
def test_quantile_type7_matches_numpy_linear(vals, p):
    arr = np.array(vals)
    got = quantile_type7(arr, p)
    want = float(np.percentile(arr, p * 100, method="linear"))
    assert abs(got - want) < 1e-12


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="AB", min_size=1, max_size=30), min_size=1, max_size=20))
def test_minhash_batch_shape_and_range(texts):
    k = 2
    sigs, valid = minhash_batch(texts, k, SEEDS)
    assert sigs.shape == (len(texts), len(SEEDS))
    assert valid.shape == (len(texts),)
    for i, t in enumerate(texts):
        assert bool(valid[i]) == (len(t) >= k)
    # identical texts -> identical signatures (determinism)
    for i, t in enumerate(texts):
        for j, u in enumerate(texts):
            if t == u:
                assert (sigs[i] == sigs[j]).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
def test_signature_agreement_bounds_and_symmetry(a_seed, b_seed):
    rng_a = np.random.Generator(np.random.PCG64(a_seed))
    rng_b = np.random.Generator(np.random.PCG64(b_seed))
    sa = rng_a.integers(0, 5, size=(4, 16)).astype(np.uint32)
    sb = rng_b.integers(0, 5, size=(4, 16)).astype(np.uint32)
    s_ab = signature_agreement(sa, sb)
    s_ba = signature_agreement(sb, sa)
    assert ((0.0 <= s_ab) & (s_ab <= 1.0)).all()
    assert (s_ab == s_ba).all()
    assert (signature_agreement(sa, sa) == 1.0).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_simhash_hamming_triangle(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    feats = rng.standard_normal((3, 32))
    bits = simhash_bits(feats, seed=7, bits=64).astype(np.int64)
    d01 = hamming64(bits[0:1], bits[1:2])[0]
    d12 = hamming64(bits[1:2], bits[2:3])[0]
    d02 = hamming64(bits[0:1], bits[2:3])[0]
    assert d02 <= d01 + d12  # Hamming metric triangle inequality
    assert hamming64(bits[0:1], bits[0:1])[0] == 0


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 12))
def test_louvain_partition_and_determinism(seed, n):
    rng = np.random.Generator(np.random.PCG64(seed))
    nodes = list(range(n))
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.4:
                edges.append((i, j, float(rng.random())))
    a1 = louvain(nodes, edges, resolution=1.05, self_weight=1.0)
    a2 = louvain(nodes, edges, resolution=1.05, self_weight=1.0)
    assert a1 == a2  # deterministic
    assert set(a1) == set(nodes)  # total assignment
    # community ids are 0..k-1
    assert set(a1.values()) == set(range(len(set(a1.values()))))
    # final assignment's modularity is >= the all-singletons baseline
    singles = {nd: i for i, nd in enumerate(nodes)}
    q = modularity(nodes, edges, a1, resolution=1.05, self_weight=1.0)
    q0 = modularity(nodes, edges, singles, resolution=1.05, self_weight=1.0)
    assert q >= q0 - 1e-12


@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=0, max_value=400),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_zero_quantile_certain_is_safe(total, m, p):
    """Whenever the shortcut predicate claims the type-7 quantile is 0, the
    real quantile of the WORST-CASE distribution (exactly total-m zeros, m
    nonzeros — the upper bound the pipeline uses) must be 0. Regression for
    ADVICE r01: the old `h < zeros` check admitted h in [zeros-1, zeros),
    where interpolation reads the first nonzero sim."""
    from dynaalign_spark.operators.threshold import zero_quantile_certain

    m = min(m, total)
    if not zero_quantile_certain(total, m, p):
        return
    vals = np.concatenate([np.zeros(total - m), np.full(m, 0.42)])
    assert np.quantile(vals, p, method="linear") == 0.0


def test_zero_quantile_old_condition_was_wrong():
    # total=10, m=1 nonzero, p=8.5/9: h=8.5 lands in [zeros-1, zeros)=[8,9);
    # true type-7 quantile = 0.5*first_nonzero > 0. The old check
    # ((total-1)p < total-m) accepted this case; the fixed one must not.
    from dynaalign_spark.operators.threshold import zero_quantile_certain

    total, m, p = 10, 1, 8.5 / 9
    assert (total - 1) * p < total - m          # old condition claimed zero
    assert not zero_quantile_certain(total, m, p)
    vals = np.concatenate([np.zeros(9), [0.8]])
    assert np.quantile(vals, p, method="linear") > 0.0
