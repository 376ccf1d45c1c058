"""Tests for the seeded in-memory reference oracle itself (SURVEY.md §5.2.2)
— property checks mirroring /root/reference/tests/testthat/test-minHash.R
(:75-106) plus clusterbreak semantics from R/clusterbreak.R:180-275."""

import numpy as np

from dynaalign_spark import oracle
from dynaalign_spark.config import PARITY
from dynaalign_spark.louvain import louvain, modularity


def test_similarity_matrix_properties():
    # reference test-minHash.R:92-106: symmetry, unit diagonal, [0,1] bounds
    texts = ["ABCDEFGH", "ABCDEFGG", "ZZZZYYYY", "MNOPQRST"]
    sim = oracle.similarity_mh(texts, 4, PARITY.seeds)
    assert sim.shape == (4, 4)
    assert np.allclose(sim, sim.T)
    assert np.allclose(np.diag(sim), 1.0)
    assert (sim >= 0).all() and (sim <= 1).all()


def test_quantile_type7_matches_numpy_linear():
    rng = np.random.Generator(np.random.PCG64(1))
    v = rng.random(101)
    for p in [0.0, 0.25, 0.5, 0.8, 1.0]:
        assert abs(
            oracle.quantile_type7(v, p) - np.quantile(v, p, method="linear")
        ) < 1e-12


def test_louvain_deterministic_and_sane():
    nodes = ["a", "b", "c", "d", "e", "f"]
    edges = [
        ("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0),
        ("d", "e", 1.0), ("e", "f", 1.0), ("d", "f", 1.0),
        ("c", "d", 0.05),
    ]
    m1 = louvain(nodes, edges, resolution=1.05)
    m2 = louvain(nodes, edges, resolution=1.05)
    assert m1 == m2
    assert m1["a"] == m1["b"] == m1["c"]
    assert m1["d"] == m1["e"] == m1["f"]
    assert m1["a"] != m1["d"]
    q = modularity(nodes, edges, m1, resolution=1.0)
    assert q > 0.3


def test_clusterbreak_size_triage():
    """Planted: one tight family of 5 (within size bounds), one pair of 2
    (below size_min=3 -> filtered), singletons -> filtered."""
    fam = ["abcdefghijklm" + s for s in ["", "x", "y", "z", "w"]]
    pair = ["qrstuvwxyz0123", "qrstuvwxyz0124"]
    solo = ["independent caption one", "another lone caption"]
    texts = fam + pair + solo
    ids = [f"n{i}" for i in range(len(texts))]
    out, filtered, itr, conv = oracle.clusterbreak(
        texts, ids, 4, PARITY.seeds, thresh_p=0.8, size_max=10, size_min=3
    )
    assert conv == 1
    fam_ids = ids[:5]
    assert len({out[i] for i in fam_ids if i in out}) == 1
    for i in ids[5:7]:
        assert i in filtered or i not in out
    assert set(out) | set(filtered) == set(ids)


def test_clusterbreak_recursion_on_oversized():
    """A community larger than size_max forces >= 2 recursion rounds with a
    fresh within-subset quantile (reference R/clusterbreak.R:237-255).

    A sliding-window chain (consecutive captions overlap heavily) yields the
    sparse-but-connected communities that exceed size_max; dense uniform
    blocks instead shatter into singletons because the reference keeps the
    sim=1 diagonal as self-loops (quirk Q6) and gamma=1.05 > 1 — verified
    against networkx Louvain with the same graph."""
    base = "abcdefghijklmnopqrstuvwxyz0123456789"
    texts = [(base * 3)[i * 4 : i * 4 + 20] for i in range(12)]
    ids = [f"n{i}" for i in range(len(texts))]
    out, filtered, itr, conv = oracle.clusterbreak(
        texts, ids, 4, PARITY.seeds, thresh_p=0.5, size_max=3, size_min=1
    )
    assert itr >= 2  # recursed at least once
    assert set(out) | set(filtered) == set(ids)


def test_louvain_selfloop_clique_shatters_like_igraph():
    """Pin the quirk-Q6 semantics: a uniform clique WITH sim=1 self-loops at
    resolution 1.05 has higher modularity as all-singletons (cross-checked
    with networkx louvain_communities)."""
    nodes = [f"n{i}" for i in range(6)]
    edges = [(a, b, 1.0) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]
    with_loops = louvain(nodes, edges, resolution=1.05, self_weight=1.0)
    assert len(set(with_loops.values())) == 6
    no_loops = louvain(nodes, edges, resolution=1.05, self_weight=0.0)
    assert len(set(no_loops.values())) == 1


def test_pair_recall_identity_and_merge():
    a = {"x": "1", "y": "1", "z": "2", "w": "2"}
    assert oracle.pair_recall(a, a) == 1.0
    merged = {k: "1" for k in a}  # merging clusters keeps recall 1
    assert oracle.pair_recall(a, merged) == 1.0
    split = {"x": "1", "y": "2", "z": "3", "w": "4"}
    assert oracle.pair_recall(a, split) == 0.0


def test_cluster_consensus_majority():
    caps = ["abcd", "abcd", "abce"]
    assert oracle.cluster_consensus(caps) == "abcd"
    assert oracle.cluster_consensus([]) == ""


def test_louvain_mod_resolution_sweep():
    """louvain_mod (R/clusterbreak.R:37-67): grid over resolutions x
    deterministic restarts, returns the max-modularity assignment."""
    from dynaalign_spark.louvain import louvain_mod, modularity

    # two 4-cliques joined by one weak edge
    nodes = list(range(8))
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j, 1.0))
    edges.append((0, 4, 0.1))
    res = louvain_mod(nodes, edges, res=1.0, res_range_perc=0.5, res_step=0.25, itr=3)
    assert set(res) == {"cluster", "resolution", "modularity"}
    a = res["cluster"]
    assert len({a[0], a[1], a[2], a[3]}) == 1
    assert len({a[4], a[5], a[6], a[7]}) == 1
    assert a[0] != a[4]
    # best modularity >= single-run modularity at the center resolution
    q_center = modularity(nodes, edges, a, resolution=res["resolution"])
    assert abs(q_center - res["modularity"]) < 1e-12
    # deterministic: same inputs, same output
    res2 = louvain_mod(nodes, edges, res=1.0, res_range_perc=0.5, res_step=0.25, itr=3)
    assert res2 == res
