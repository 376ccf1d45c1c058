"""Spark-engine integration tests: bit-exact signature parity, candidate-pair
completeness, type-7 quantile parity (quirk Q4), connected components, and the
headline dup-pair-recall gate (BASELINE.json: recall >= 0.99 vs the seeded
reference oracle at equal k / n_hash / seeds)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynaalign_spark import oracle
from dynaalign_spark.config import PARITY
from dynaalign_spark.fixtures import images_df, make_edge_case, make_images
from dynaalign_spark.operators.clusterbreak import clusterbreak_spark
from dynaalign_spark.operators.components import connected_components
from dynaalign_spark.operators.lsh import candidate_pairs
from dynaalign_spark.operators.signatures import add_signatures
from dynaalign_spark.operators.threshold import quantile_threshold

CFG = PARITY


@pytest.fixture(scope="module")
def fixture_rows():
    return make_images(n_clusters=15, seed=42)


@pytest.fixture(scope="module")
def images(spark, fixture_rows):
    rows, _ = fixture_rows
    return images_df(spark, rows).cache()


def test_signatures_bitexact_vs_oracle(spark, images, fixture_rows):
    """Spark pandas-UDF signatures == seeded numpy oracle, bit for bit
    (the quirk-Q1-pinned twin of reference src/minHash.cpp:140-158)."""
    rows, _ = fixture_rows
    got = {
        r["image_id"]: r["minhash"]
        for r in add_signatures(images, CFG).collect()
    }
    expect = oracle.signatures([r["caption"] for r in rows], CFG.k, CFG.seeds)
    for i, r in enumerate(rows):
        assert got[r["image_id"]] == expect[i].astype(np.int64).tolist()


def test_candidate_pairs_complete_at_r1(spark, images, fixture_rows):
    """rows_per_band=1 banding must surface EVERY pair with sim > 0 — the
    exact support of the reference's dense matrix (src/minHash.cpp:160-178)."""
    rows, _ = fixture_rows
    sig = add_signatures(images, CFG)
    got = {
        (r["a"], r["b"]): r["sim"] for r in candidate_pairs(sig, CFG).collect()
    }
    sim = oracle.similarity_mh([r["caption"] for r in rows], CFG.k, CFG.seeds)
    ids = [r["image_id"] for r in rows]
    n = len(ids)
    expect = {}
    for i in range(n):
        for j in range(i + 1, n):
            if sim[i, j] > 0:
                a, b = sorted((ids[i], ids[j]))
                expect[(a, b)] = sim[i, j]
    assert set(got) == set(expect)
    for kk, v in expect.items():
        assert abs(got[kk] - v) < 1e-12


def test_quantile_threshold_parity(spark, images, fixture_rows):
    """Distributed zero-counting quantile == R type-7 over the dense upper
    triangle (quirk Q4)."""
    rows, _ = fixture_rows
    sig = add_signatures(images, CFG)
    pairs = candidate_pairs(sig, CFG).cache()
    sim = oracle.similarity_mh([r["caption"] for r in rows], CFG.k, CFG.seeds)
    tri = oracle.upper_tri(sim)
    for p in [0.5, 0.8, 0.95, 0.999]:
        ours = quantile_threshold(pairs, len(rows), p)
        ref = oracle.quantile_type7(tri, p)
        assert abs(ours - ref) < 1e-9, p


def test_connected_components_vs_union_find(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("x", "y"),
        ("p", "q"), ("q", "r"), ("r", "s"), ("s", "t"),  # chain
        ("m", "n"), ("n", "m"),
    ]
    df = spark.createDataFrame(edges, "a string, b string")
    got, rounds = connected_components(df)
    got = {r["image_id"]: r["component"] for r in got.collect()}
    nodes = sorted({u for e in edges for u in e})
    expect = oracle.connected_components(nodes, edges)
    assert got == expect
    assert rounds <= 10
    # the long-id dictionary path (auto-engaged above ENCODE_MIN_EDGES to
    # cut the star rounds' shuffle bytes) must produce identical labels —
    # pinned on here because the small fixture would never trigger it
    enc, _ = connected_components(df, encode_ids=True)
    assert {r["image_id"]: r["component"] for r in enc.collect()} == expect


def test_clusterbreak_recall_and_precision(spark, images, fixture_rows):
    """THE gate: dup-pair recall >= 0.99 vs the seeded oracle clusterbreak."""
    rows, truth = fixture_rows
    res = clusterbreak_spark(images, CFG)
    clusters = {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}
    filtered = {r["image_id"] for r in res["filtered"].collect()}
    out, filt, _, _ = oracle.clusterbreak(
        [r["caption"] for r in rows],
        [r["image_id"] for r in rows],
        CFG.k, CFG.seeds,
        thresh_p=CFG.thresh_p, size_max=CFG.size_max, size_min=CFG.size_min,
        resolution=CFG.louvain_resolution,
    )
    assert oracle.pair_recall(out, clusters) >= 0.99
    assert oracle.pair_recall(clusters, out) >= 0.99
    # partition completeness: every input row is clustered or filtered
    all_ids = {r["image_id"] for r in rows}
    assert set(clusters) | filtered == all_ids
    assert set(clusters).isdisjoint(filtered)


def test_clusterbreak_with_phash_fusion(spark, images, fixture_rows):
    """Axis A: phash bit-shingle fusion still matches the oracle given the
    same fusion config."""
    rows, _ = fixture_rows
    cfg = CFG.with_(use_phash_shingles=True)
    res = clusterbreak_spark(images, cfg)
    clusters = {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}
    out, _, _, _ = oracle.clusterbreak(
        [r["caption"] for r in rows],
        [r["image_id"] for r in rows],
        cfg.k, cfg.seeds,
        thresh_p=cfg.thresh_p, size_max=cfg.size_max, size_min=cfg.size_min,
        resolution=cfg.louvain_resolution,
        phash=[r["phash"] for r in rows],
    )
    assert oracle.pair_recall(out, clusters) >= 0.99


def test_edge_case_shortcap_null_signatures(spark):
    """Captions shorter than k -> NULL signature -> filtered with reason
    (pinned resolution of quirk Q2)."""
    rows = make_edge_case("shortcap", n=8, k=CFG.k)
    df = images_df(spark, rows)
    res = clusterbreak_spark(df, CFG)
    assert res["clusters"].count() == 0
    reasons = {r["reason"] for r in res["filtered"].collect()}
    assert reasons == {"empty_shingle_set"}
    assert res["filtered"].count() == 8


def test_edge_case_allsame_hot_band(spark):
    """All-identical captions: the hottest possible band. With a tiny
    band_group_cap the chain pairing must still keep the clique one
    component (no lost connectivity across the cap)."""
    rows = make_edge_case("allsame", n=40)
    df = images_df(spark, rows)
    cfg = CFG.with_(band_group_cap=5, size_max=100, size_min=1)
    res = clusterbreak_spark(df, cfg)
    # connectivity survives the cap: CC puts all 40 in ONE component
    comp = {r["image_id"]: r["component"] for r in res["components"].collect()}
    assert len(comp) == 40 and len(set(comp.values())) == 1
    # final assignment matches the oracle (quirk Q6: a uniform sim=1 clique
    # with self-loops at gamma=1.05 shatters into singletons — both sides)
    clusters = {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}
    out, _, _, _ = oracle.clusterbreak(
        [r["caption"] for r in rows], [r["image_id"] for r in rows],
        cfg.k, cfg.seeds, thresh_p=cfg.thresh_p,
        size_max=cfg.size_max, size_min=cfg.size_min,
    )
    assert oracle.pair_recall(out, clusters) >= 0.99
    assert oracle.pair_recall(clusters, out) >= 0.99
    assert len(clusters) == 40


def test_distributed_break_path(spark, images, fixture_rows):
    """Force components through the distributed re-threshold recursion
    (local_max=3) and check the row partition is still complete and every
    dup cluster from truth stays discoverable (loose recall vs truth, since
    CC pre-breaking + local Louvain is a documented approximation of pure
    local recursion for oversized components)."""
    rows, truth = fixture_rows
    cfg = CFG.with_(size_max=50, size_min=1)
    res = clusterbreak_spark(images, cfg, local_max=3, max_distributed_rounds=8)
    clusters = {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}
    filtered = {r["image_id"] for r in res["filtered"].collect()}
    all_ids = {r["image_id"] for r in rows}
    assert set(clusters) | filtered == all_ids
    assert set(clusters).isdisjoint(filtered)
    assert res["distributed_rounds"] >= 1


def test_edge_case_allunique(spark):
    """No dups at all: everything is a singleton -> filtered at size_min=3
    (reference analog data/allunique.rda)."""
    rows = make_edge_case("allunique", n=30)
    df = images_df(spark, rows)
    res = clusterbreak_spark(df, CFG)
    out, filt, _, _ = oracle.clusterbreak(
        [r["caption"] for r in rows], [r["image_id"] for r in rows],
        CFG.k, CFG.seeds, thresh_p=CFG.thresh_p,
        size_max=CFG.size_max, size_min=CFG.size_min,
    )
    clusters = {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}
    assert oracle.pair_recall(out, clusters) >= 0.99
    assert oracle.pair_recall(clusters, out) >= 0.99


def test_candidate_pairs_capped_branch_exact_sims(spark, images, fixture_rows):
    """Hybrid count-agreement (r=1): pairs touched by a capped hot band go
    through the exact verify join — every emitted sim must still equal the
    oracle's signature agreement exactly, even with a pathologically tiny
    band_group_cap forcing nearly all bands through the chain path."""
    rows, _ = fixture_rows
    cfg = CFG.with_(band_group_cap=2, chain_width=2)
    sig = add_signatures(images, cfg)
    got = {(r["a"], r["b"]): r["sim"] for r in candidate_pairs(sig, cfg).collect()}
    assert got, "chain pairing must still emit pairs"
    sim = oracle.similarity_mh([r["caption"] for r in rows], CFG.k, CFG.seeds)
    ids = [r["image_id"] for r in rows]
    idx = {v: i for i, v in enumerate(ids)}
    for (a, b), v in got.items():
        assert abs(v - sim[idx[a], idx[b]]) < 1e-12


def test_short_caption_uint32_signatures_survive_ansi(spark):
    """Regression (ADVICE r01, high): a short caption has few shingles, so
    min-over-few-hashes leaves signature components above INT_MAX; the verify
    join's 32-bit narrowing must be the shifted bijection, not a bare
    cast("array<int>") — which throws CAST_OVERFLOW under Spark 4 ANSI mode.
    Exercises BOTH crash sites: r=2 scale mode (always joins signatures) and
    r=1 count-agreement with a tiny cap (routes pairs to the verify join)."""
    rows = [
        dict(image_id=f"h{i}", bytes=bytearray(b"\x00"), w=1, h=1,
             fmt="ppm", caption="hello", phash=0)
        for i in range(4)
    ]
    df = images_df(spark, rows)
    # sanity: the fixture really does produce >INT_MAX components
    comps = add_signatures(df, CFG).select(F.explode("minhash").alias("v"))
    assert comps.where(F.col("v") > 2**31 - 1).count() > 0

    scale = CFG.with_(rows_per_band=2, bands=CFG.n_hash // 2)
    got = candidate_pairs(add_signatures(df, scale), scale).collect()
    assert all(abs(r["sim"] - 1.0) < 1e-12 for r in got) and len(got) == 6

    capped = CFG.with_(band_group_cap=2, chain_width=3)
    got = candidate_pairs(add_signatures(df, capped), capped).collect()
    assert got and all(abs(r["sim"] - 1.0) < 1e-12 for r in got)


def test_distributed_break_with_pushed_floor_uses_unfloored_pairs(spark):
    """When the zero-quantile shortcut pushes min_edge_sim into the verify
    stage AND a component still exceeds local_max, the distributed break must
    re-quantile from UNFLOORED in-group pairs (reference re-thresholds the
    full subset matrix, R/clusterbreak.R:246-254; ADVICE r01). Smoke-drives
    that path end-to-end and checks the output is a valid partition."""
    from dynaalign_spark.fixtures import make_images_light
    from dynaalign_spark.operators.threshold import zero_quantile_certain

    rows = make_images_light(60, seed=9, singleton_frac=0.1, max_members=40)
    cfg = CFG.with_(
        n_hash=10, rows_per_band=1, band_group_cap=3, chain_width=1,
        thresh_p=0.5, min_edge_sim=0.05,
    )
    n = len(rows)
    m_ub = cfg.bands * n * max((cfg.band_group_cap - 1) / 2, cfg.chain_width)
    assert zero_quantile_certain(n * (n - 1) // 2, m_ub, cfg.thresh_p), \
        "fixture must trigger the shortcut for this test to mean anything"
    res = clusterbreak_spark(
        images_df(spark, rows), cfg, local_max=8, max_distributed_rounds=4
    )
    clusters = {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}
    filtered = {r["image_id"] for r in res["filtered"].collect()}
    all_ids = {r["image_id"] for r in rows}
    assert set(clusters) | filtered == all_ids
    assert set(clusters).isdisjoint(filtered)
    assert res["distributed_rounds"] >= 1, "must actually exercise the path"


def test_clusterbreak_louvain_mod_sweep_parity(spark, images, fixture_rows):
    """cluster_fn="louvain_mod" (VERDICT r01 #5): the resolution grid-search
    (R/clusterbreak.R:37-67) wired through DedupConfig reaches the refine
    stage and reproduces the seeded oracle running the same sweep."""
    rows, _ = fixture_rows
    cfg = CFG.with_(cluster_fn="louvain_mod", res_range_perc=0.3,
                    res_step=0.15, res_itr=2)
    res = clusterbreak_spark(images, cfg)
    clusters = {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}
    out, _, _, _ = oracle.clusterbreak(
        [r["caption"] for r in rows],
        [r["image_id"] for r in rows],
        cfg.k, cfg.seeds,
        thresh_p=cfg.thresh_p, size_max=cfg.size_max, size_min=cfg.size_min,
        resolution=cfg.louvain_resolution,
        cluster_fn="louvain_mod", res_range_perc=0.3, res_step=0.15, res_itr=2,
    )
    assert oracle.pair_recall(out, clusters) >= 0.99
    assert oracle.pair_recall(clusters, out) >= 0.99


def test_louvain_mod_selects_max_modularity_resolution():
    """The sweep must pick a non-center resolution when that wins: on two
    4-cliques + bridge, gamma sweep [0.5..1.5]; a fixed high resolution
    splits differently than the best — the sweep's q must dominate every
    single-resolution run on its grid."""
    from dynaalign_spark.louvain import louvain, louvain_mod, modularity

    nodes = list(range(8))
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j, 1.0))
    edges.append((0, 4, 0.1))
    best = louvain_mod(nodes, edges, res=1.0, res_range_perc=0.5,
                       res_step=0.25, itr=2)
    for r in (0.5, 0.75, 1.0, 1.25, 1.5):
        a = louvain(nodes, edges, resolution=r)
        q = modularity(nodes, edges, a, resolution=r)
        assert best["modularity"] >= q - 1e-12


def test_louvain_golden_partition_drift_gate(spark):
    """The committed sf0.01 Louvain golden (tests/golden/
    louvain_clusters_sf001.json — the dedup_clusters_louvain value oracle,
    VERDICT r03 #2) must match a fresh run of the seeded pipeline. A failure
    here means the clustering algorithm changed: regenerate with
    scripts/make_louvain_golden.py ONLY if the change is intentional."""
    import json
    import os

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.01"
    golden_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "louvain_clusters_sf001.json",
    )
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("driver testdata absent")
    golden = {tuple(r) for r in json.load(open(golden_path))}
    fresh = {
        (r["image_id"], r["cluster_id"])
        for r in entrymod.q_dedup_clusters_louvain(spark, sf_dir).collect()
    }
    assert fresh == golden


def test_scale_golden_partition_drift_gate(spark):
    """The committed sf0.01 SCALE-config golden (tests/golden/
    scale_clusters_sf001.json — the dedup_clusters_scale value oracle,
    VERDICT r04 #4) must match a fresh run of the seeded production-config
    pipeline (rows_per_band=2, band_group_cap=64, min_edge_sim=0.3).
    Regenerate with `scripts/make_louvain_golden.py <sf_dir> scale` ONLY if
    the change is intentional. Also asserts the partition is non-degenerate
    — the floor must keep the noise-band quantile from welding the corpus
    into a hairball (the PARITY sf0.1 golden's documented degenerate)."""
    import json
    import os

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.01"
    golden_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "scale_clusters_sf001.json",
    )
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("driver testdata absent")
    golden = {tuple(r) for r in json.load(open(golden_path))}
    fresh = {
        (r["image_id"], r["cluster_id"])
        for r in entrymod.q_dedup_clusters_scale(spark, sf_dir).collect()
    }
    assert fresh == golden
    from collections import Counter

    sizes = Counter(c for _, c in fresh)
    assert len(sizes) >= 50                      # many clusters, not one weld
    assert max(sizes.values()) <= 50             # size_max triage held
    assert sum(1 for v in sizes.values() if v > 1) >= 20   # real dup groups
