"""R-path minhash pipeline (rpath.py) vs a pure-Python reimplementation of
reference R/minHash.R:206-221 (vocab-index hashing, quirk Q3's R side)."""

import numpy as np
import pytest

from dynaalign_spark import rpath

DOCS = [
    (0, "ACDEGHHIKLLL"),
    (1, "ACDEGHHIKLMN"),
    (2, "XXXXXYYYYYYZZ"),
    (3, "ACDEGHHIKLLL"),   # exact dup of 0
    (4, "abc"),            # shorter than k -> skipped (documented divergence)
]
K = 4
N_HASH = 12
SEEDS = [383329928, 3324115917, 2811363265, 1884968545, 1859786276,
         3263743248, 835966884, 1562964503, 2004551447, 2137998393,
         123456789, 42]


def py_shingles(text, k):
    return [text[i:i + k] for i in range(len(text) - k + 1)]


def py_rpath(docs, k, n_hash, seeds):
    """Reference R pipeline: sorted vocab, (a*i+b) mod m over 1-based row
    indices, min over member rows (R/minHash.R:126-143)."""
    usable = [(i, t) for i, t in docs if len(t) >= k]
    vocab = sorted({s for _, t in usable for s in py_shingles(t, k)})
    idx = {s: i + 1 for i, s in enumerate(vocab)}
    m = len(vocab)
    params = rpath.hash_params(n_hash, m, seeds)
    sig = {}
    for did, t in usable:
        rows = {idx[s] for s in py_shingles(t, k)}
        for h, a, b in params:
            sig[(did, h)] = min((a * i + b) % m for i in rows)
    return vocab, idx, m, sig


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_vocab_indexed_sorted_distinct(spark, docs_df):
    vocab, idx, m, _ = py_rpath(DOCS, K, N_HASH, SEEDS)
    got = {r["shingle"]: r["idx"] for r in rpath.vocab_indexed(docs_df, K).collect()}
    assert got == idx
    assert len(got) == m


def test_char_matrix_pairs(spark, docs_df):
    vocab, idx, _, _ = py_rpath(DOCS, K, N_HASH, SEEDS)
    got = {(r["idx"], r["doc_id"]) for r in rpath.char_matrix_pairs(docs_df, K).collect()}
    want = {
        (idx[s], did)
        for did, t in DOCS if len(t) >= K
        for s in py_shingles(t, K)
    }
    assert got == want
    # dup doc 3 has identical membership column to doc 0
    assert {i for i, d in got if d == 3} == {i for i, d in got if d == 0}


def test_hash_params_ranges():
    m = 97
    ps = rpath.hash_params(N_HASH, m, SEEDS)
    assert len(ps) == N_HASH
    for h, a, b in ps:
        assert 1 <= a <= m
        assert 0 <= b <= m


def test_signatures_r_parity(spark, docs_df):
    _, _, _, want = py_rpath(DOCS, K, N_HASH, SEEDS)
    got = {
        (r["doc_id"], r["h"]): r["comp"]
        for r in rpath.signatures_r(docs_df, K, N_HASH, SEEDS).collect()
    }
    assert got == want
    # short doc 4 emits no cells
    assert not any(d == 4 for d, _ in got)
    # exact dup docs share every cell
    assert all(got[(0, h)] == got[(3, h)] for h in range(N_HASH))


def test_distance_r_pairs(spark, docs_df):
    _, _, _, sig = py_rpath(DOCS, K, N_HASH, SEEDS)
    rows = rpath.distance_r_pairs(docs_df, K, N_HASH, SEEDS).collect()
    got = {(r["a"], r["b"]): r["dist"] for r in rows}
    ids = sorted({d for d, _ in sig})
    assert set(got) == {(a, b) for a in ids for b in ids if a < b}
    for (a, b), dist in got.items():
        agree = sum(sig[(a, h)] == sig[(b, h)] for h in range(N_HASH))
        assert dist == pytest.approx(1.0 - agree / N_HASH)
    assert got[(0, 3)] == 0.0  # exact dups
    # disjoint-alphabet doc 2 shares nothing with doc 0 unless hash collision
    assert got[(0, 2)] >= got[(0, 1)]


def test_r_vs_cpp_divergence_documented(spark, docs_df):
    """Quirk Q3: the R path hashes vocab indices, the C++ path hashes
    content — same estimator, different numerics. Both must agree that
    identical docs have distance 0, but their signature values differ."""
    from dynaalign_spark.config import DedupConfig
    from dynaalign_spark.operators.signatures import add_signatures

    cfg = DedupConfig(n_hash=N_HASH, seeds=tuple(SEEDS),
                      bands=N_HASH, rows_per_band=1)
    imgs = docs_df.selectExpr(
        "cast(doc_id as string) as image_id", "text as caption",
        "cast(null as long) as phash",
    )
    cpp = {
        (int(r["image_id"]), h): v
        for r in add_signatures(imgs, cfg).collect() if r["minhash"]
        for h, v in enumerate(r["minhash"])
    }
    rsig = {
        (r["doc_id"], r["h"]): r["comp"]
        for r in rpath.signatures_r(docs_df, K, N_HASH, SEEDS).collect()
    }
    assert set(rsig) == set(cpp)                     # same cells
    assert any(rsig[cell] != cpp[cell] for cell in rsig)  # different numerics
    assert all(cpp[(0, h)] == cpp[(3, h)] for h in range(N_HASH))
