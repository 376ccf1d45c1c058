"""Seeded in-memory reference oracle (pure numpy/python).

A faithful, *small-scale* reimplementation of the reference pipeline with the
nondeterminism pinned (SURVEY.md §5.2.2). Used by pytest as the ground truth
the Spark engine must match (dup-pair recall >= 0.99):

- ``similarity_mh``      == reference ``similarityMH`` (src/minHash.cpp:119-188)
  with the frozen seed table standing in for random_device (quirk Q1).
- ``quantile_type7``     == R ``stats::quantile`` default type-7 used at
  R/clusterbreak.R:219.
- ``netcluster``         == R/clusterbreak.R:112-136 (threshold zeroing done by
  the caller, graph keeps the sim=1 diagonal as self-loops — quirk Q6).
- ``clusterbreak``       == R/clusterbreak.R:180-275 (recursive quantile
  re-threshold + Louvain + size triage, "itr.cid" labels).
- ``cluster_consensus``  == alignment-free variant of R/clusterbreak.R:309-320
  (per-position majority vote; the DECIPHER MSA black box is out of scope).

Everything here is O(n^2) dense — exactly the scalability wall the Spark
engine removes; it exists only to define correct answers at test scale.
"""

from __future__ import annotations

import numpy as np

from .hashing import minhash_batch
from .louvain import louvain, louvain_mod


def signatures(texts, k: int, seeds, phash=None, phash_gram: int = 4) -> np.ndarray:
    sig, _ = minhash_batch(texts, k, seeds, phash=phash, phash_gram=phash_gram)
    return sig


def similarity_mh(texts, k: int, seeds, phash=None) -> np.ndarray:
    """Dense n x n signature-agreement matrix, diag=1 (src/minHash.cpp:160-178)."""
    sig = signatures(texts, k, seeds, phash=phash)
    n = len(texts)
    sim = np.ones((n, n))
    for i in range(n):
        sim[i, i + 1 :] = (sig[i + 1 :] == sig[i]).mean(axis=1)
        sim[i + 1 :, i] = sim[i, i + 1 :]
    return sim


def quantile_type7(values: np.ndarray, p: float) -> float:
    """R default quantile (type 7): linear interpolation at h=(n-1)p."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    if len(v) == 0:
        return float("nan")
    h = (len(v) - 1) * p
    lo = int(np.floor(h))
    hi = min(lo + 1, len(v) - 1)
    return float(v[lo] + (h - lo) * (v[hi] - v[lo]))


def upper_tri(sim: np.ndarray) -> np.ndarray:
    iu = np.triu_indices(sim.shape[0], k=1)
    return sim[iu]


def netcluster(sim: np.ndarray, node_ids, resolution: float = 1.05,
               cluster_fn: str = "louvain", res_range_perc: float = 0.0,
               res_step: float = 0.0, res_itr: int = 3) -> dict:
    """Thresholded similarity matrix -> Louvain membership.

    Caller has already zeroed sub-threshold entries (R/clusterbreak.R:221).
    Nonzero off-diagonal entries are weighted edges; the diagonal becomes a
    self-loop of weight 1 per node (igraph mode="upper" keeps it — quirk Q6).
    ``cluster_fn`` mirrors the reference's pluggable cluster function
    (R/clusterbreak.R:186): "louvain_mod" runs the resolution grid-search
    (R/clusterbreak.R:37-67). Pinned deviation from R: the sweep selects the
    best resolution PER CONNECTED COMPONENT (sharing the graph-global
    null-model mass 2m), not one global resolution — that is exactly what
    the distributed pipeline does (each component refines independently;
    a globally-coupled selection would serialize the sweep across 10^12
    rows), and per-component argmax can only raise total modularity.
    """
    n = sim.shape[0]
    ids = list(node_ids)
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            if sim[i, j] > 0:
                edges.append((ids[i], ids[j], float(sim[i, j])))
    if cluster_fn == "louvain_mod":
        return louvain_mod(ids, edges, res=resolution,
                           res_range_perc=res_range_perc, res_step=res_step,
                           itr=res_itr, self_weight=1.0)["cluster"]
    return louvain(ids, edges, resolution=resolution, self_weight=1.0)


def clusterbreak(
    texts,
    ids,
    k: int,
    seeds,
    thresh_p: float = 0.8,
    size_max: int = 10,
    size_min: int = 3,
    max_itr: int = 10000,
    resolution: float = 1.05,
    phash=None,
    cluster_fn: str = "louvain",
    res_range_perc: float = 0.0,
    res_step: float = 0.0,
    res_itr: int = 3,
):
    """Reference clusterbreak recursion (R/clusterbreak.R:180-275).

    Returns (clustered: {id: "itr.cid"}, filtered: [ids], n_calls, converged).
    Differences vs the R code, both pinned deliberately:
      * seeds are frozen (quirk Q1), so recursing recomputes the *same*
        similarities as slicing the parent matrix — the dynamic part is the
        per-subset quantile re-threshold;
      * Louvain is our deterministic implementation.
    """
    state = {"itr": 1, "out": {}, "filtered": [], "converged": 1}
    ph = list(phash) if phash is not None else None

    def recurse(sub_ids, sub_texts, sub_ph):
        if state["itr"] > max_itr:
            state["converged"] = 0
            return
        sim = similarity_mh(sub_texts, k, seeds, phash=sub_ph)
        thr = quantile_type7(upper_tri(sim), thresh_p)
        simz = sim.copy()
        simz[simz < thr] = 0.0
        memb = netcluster(simz, sub_ids, resolution=resolution,
                          cluster_fn=cluster_fn, res_range_perc=res_range_perc,
                          res_step=res_step, res_itr=res_itr)
        # cluster ids 1-based like igraph membership via tabulate
        sizes: dict = {}
        for nd in sub_ids:
            sizes[memb[nd]] = sizes.get(memb[nd], 0) + 1
        big = {c for c, s in sizes.items() if s > size_max}
        small = {c for c, s in sizes.items() if s < size_min}
        for nd in sub_ids:
            if memb[nd] in small:
                state["filtered"].append(nd)
        itr = state["itr"]
        if not big:
            for nd in sub_ids:
                if memb[nd] not in small:
                    state["out"][nd] = f"{itr}.{memb[nd]}"
            return
        for nd in sub_ids:
            c = memb[nd]
            if c not in small and c not in big:
                state["out"][nd] = f"{itr}.{c}"
        for c in sorted(big):
            mem_idx = [i for i, nd in enumerate(sub_ids) if memb[nd] == c]
            state["itr"] += 1
            recurse(
                [sub_ids[i] for i in mem_idx],
                [sub_texts[i] for i in mem_idx],
                [sub_ph[i] for i in mem_idx] if sub_ph is not None else None,
            )

    if len(ids) == 0:
        raise ValueError("empty input")
    recurse(list(ids), list(texts), ph)
    return state["out"], state["filtered"], state["itr"], state["converged"]


def connected_components(ids, edges) -> dict:
    """Union-find ground truth for the Spark CC operator tests."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {i: find(i) for i in ids}


def cluster_consensus(captions: list[str]) -> str:
    """Per-position majority vote (ties -> lexicographically smallest char);
    consensus length = majority length. Alignment-free stand-in for
    DECIPHER::ConsensusSequence (R/clusterbreak.R:314-316)."""
    if not captions:
        return ""
    lens = sorted(len(c) for c in captions)
    target = lens[(len(lens) - 1) // 2]
    out = []
    for pos in range(target):
        counts: dict = {}
        for c in captions:
            if pos < len(c):
                counts[c[pos]] = counts.get(c[pos], 0) + 1
        ch = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[0][0]
        out.append(ch)
    return "".join(out)


def dup_pairs(assign: dict) -> set:
    """Set of unordered same-cluster pairs — the recall currency."""
    by_c: dict = {}
    for nd, c in assign.items():
        by_c.setdefault(c, []).append(nd)
    pairs = set()
    for mem in by_c.values():
        mem = sorted(mem)
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                pairs.add((mem[i], mem[j]))
    return pairs


def pair_recall(reference: dict, ours: dict) -> float:
    """Fraction of the reference's intra-cluster pairs that are intra-cluster
    in ours (the BASELINE.json >=0.99 metric)."""
    ref_pairs = dup_pairs(reference)
    if not ref_pairs:
        return 1.0
    got = dup_pairs(ours)
    return len(ref_pairs & got) / len(ref_pairs)
