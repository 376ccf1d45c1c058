"""Headless viz ops (SURVEY §2 #27/#28): PNG determinism, R-palette parity,
hclust block ordering, Q5 corrected-vs-replica behavior, and exact equality
of the driver-side minhash twin against the Spark R-path."""

import warnings
import zlib

import numpy as np
import pytest

from dynaalign_spark import rpath, viz


def _png_ok(png: bytes) -> tuple[int, int]:
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = int.from_bytes(png[16:20], "big"), int.from_bytes(png[20:24], "big")
    # IDAT decompresses to h*(1+3w) filter-0 scanlines
    idat = png[png.index(b"IDAT") + 4:png.rindex(b"IEND") - 8]
    assert len(zlib.decompress(idat)) == h * (1 + 3 * w)
    return w, h


def _block_matrix():
    # two planted similarity blocks {0,1,2} and {3,4}, interleaved labels
    X = np.eye(5)
    for a, b in [(0, 1), (0, 2), (1, 2)]:
        X[a, b] = X[b, a] = 0.9
    X[3, 4] = X[4, 3] = 0.8
    perm = np.array([3, 0, 4, 1, 2])  # scramble so identity order fails
    return X[perm][:, perm], perm


def test_plot_similarity_matrix_validation():
    with pytest.raises(ValueError, match="must be a matrix"):
        viz.plot_similarity_matrix(np.ones(4))
    asym = np.array([[1.0, 0.2], [0.9, 1.0]])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        viz.plot_similarity_matrix(asym, cluster=False)
    assert any("not symmetric" in str(x.message) for x in w)


def test_hclust_groups_planted_blocks():
    X, perm = _block_matrix()
    order = viz.hclust_order(X)
    labels = [0 if perm[i] < 3 else 1 for i in order]  # block id per leaf
    # each block's leaves are contiguous in the dendrogram order
    assert labels in ([0, 0, 0, 1, 1], [1, 1, 0, 0, 0])


def test_heat_colors_matches_r():
    ramp = viz.heat_colors(12)
    assert ramp.shape == (12, 3)
    assert tuple(ramp[0]) == (255, 0, 0)      # heat.colors(12)[1] #FF0000
    assert tuple(ramp[8]) == (255, 255, 0)    # last rainbow step #FFFF00
    assert tuple(ramp[11]) == (255, 255, 213)  # hsv(1/6, s=1/6) whitened tail
    # monotone red->yellow->white: G and B never decrease
    assert (np.diff(ramp[:, 1].astype(int)) >= 0).all()
    assert (np.diff(ramp[:, 2].astype(int)) >= 0).all()


def test_heatmap_png_deterministic(tmp_path):
    X, _ = _block_matrix()
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    r1 = viz.plot_similarity_matrix(X, path=p1)
    r2 = viz.plot_similarity_matrix(X, path=p2)
    assert r1["png"] == r2["png"] == open(p1, "rb").read()
    w, h = _png_ok(r1["png"])
    assert (w, h) == (5 * 8 + 2, 5 * 8 + 2)  # cell=8, border=1
    # scale="none" renders raw values; row scaling changes the raster
    r3 = viz.plot_similarity_matrix(X, scale="none")
    assert r3["png"] != r1["png"]
    with pytest.raises(ValueError, match="scale"):
        viz.plot_similarity_matrix(X, scale="column")


CORPUS = [
    ("c1", "the quick brown fox jumps over the lazy dog"),
    ("c2", "the quick brown fox jumped over a lazy dog"),
    ("c3", "pack my box with five dozen liquor jugs"),
    ("c4", "pack my box with five dozen liquor mugs"),
    ("c5", "sphinx of black quartz judge my vow"),
    ("c6", "x"),  # shorter than k=2: quirk Q2 empty-set sentinel -> dropped
]


def test_minhash_local_twin_matches_spark_rpath(spark):
    """The viz minhash must be value-exact vs the engine's R-path."""
    from dynaalign_spark.config import _load_seed_table

    texts = [t for _, t in CORPUS]
    k, n_hash = 2, 16
    dist, kept = viz.minhash_r_local(texts, k, n_hash)
    assert kept == [0, 1, 2, 3, 4]  # "x" dropped by the len<k sentinel
    t = _load_seed_table()
    seeds = (t["minhash_seeds"] + t["extra_seeds"])[:n_hash]
    docs = spark.createDataFrame(
        [(i, texts[i]) for i in kept], "doc_id int, text string"
    )
    got = {
        (r["a"], r["b"]): r["dist"]
        for r in rpath.distance_r_pairs(docs, k, n_hash, seeds).collect()
    }
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            assert got[(i, j)] == pytest.approx(dist[i, j], abs=1e-12), (i, j)


def test_consensusplot_deterministic_and_q5(tmp_path):
    names = [n for n, _ in CORPUS]
    seqs = [t for _, t in CORPUS]
    r1 = viz.consensusplot(names, seqs, path=str(tmp_path / "g.png"))
    r2 = viz.consensusplot(names, seqs)
    assert r1["png"] == r2["png"]
    _png_ok(r1["png"])
    assert r1["names"] == ["c1", "c2", "c3", "c4", "c5"]  # c6 dropped (Q2)
    # corrected semantics: edges keep the MOST similar pairs; the two planted
    # near-dup pairs must be in the same community
    sim_edges = {frozenset((a, b)) for a, b, _ in r1["edges"]}
    assert frozenset(("c1", "c2")) in sim_edges
    assert frozenset(("c3", "c4")) in sim_edges
    comm = r1["communities"]
    assert comm["c1"] == comm["c2"] and comm["c3"] == comm["c4"]
    assert comm["c1"] != comm["c3"]
    # Q5 replica thresholds the distance matrix -> keeps most-DISSIMILAR
    # pairs; the near-dup pairs drop out of the edge set
    rq5 = viz.consensusplot(names, seqs, replicate_q5=True)
    q5_edges = {frozenset((a, b)) for a, b, _ in rq5["edges"]}
    assert frozenset(("c1", "c2")) not in q5_edges
    assert frozenset(("c3", "c4")) not in q5_edges
    assert q5_edges  # but the dissimilar pairs survive


def test_plot_similarity_pairs_adapter(spark, tmp_path):
    pairs = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.1)], "a string, b string, sim double"
    )
    out = viz.plot_similarity_pairs(pairs, path=str(tmp_path / "p.png"))
    assert out["ids"] == ["a", "b", "c"]
    _png_ok(out["png"])


def test_viz_size_guard():
    with pytest.raises(ValueError, match="driver-side"):
        viz.plot_similarity_matrix(np.eye(viz.MAX_VIZ_ROWS + 1))
