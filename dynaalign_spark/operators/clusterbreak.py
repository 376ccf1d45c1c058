"""Size-constrained recursive cluster breaking — the Spark re-grounding of the
reference's top-level query ``clusterbreak`` (R/clusterbreak.R:180-275).

Global shape (one pass over the corpus, SURVEY.md §3.3):

1. signatures (narrow pandas-UDF map, cached — seeds are frozen so
   recursion never needs to re-shingle);
2. LSH candidate pairs + verified agreement sims;
3. global type-7 quantile threshold (exact, via the zero-counting trick in
   threshold.py) -> edge set;
4. iterative connected components (the only unbounded-iteration shuffle);
5. per-component ``applyInPandas``: deterministic Louvain at resolution 1.05
   on the thresholded subgraph (Louvain decomposes over connected
   components, so per-component == the reference's global netcluster call),
   then the reference's recursion — size triage (size_min/size_max,
   R/clusterbreak.R:224-226), emit / filter / recurse with a *fresh local
   type-7 quantile per oversized community* (R/clusterbreak.R:246-254 — the
   "dynamic" part) — entirely inside one executor task per component, which
   mirrors the reference: it too recursed on an in-memory subgraph.

Labels are namespaced "{component}/{itr}.{cid}" — globally unique like the
reference's "itr.cid" (R/clusterbreak.R:234) but with per-component instead
of depth-first-global itr counters; the *partition* of rows into clusters is
what parity tests compare.

Rows with NULL signatures (caption shorter than k, no phash) are routed to
`filtered` with a metric instead of forming a fake sim=1 clique — the pinned
resolution of quirk Q2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..louvain import louvain
from ..oracle import quantile_type7
from .components import connected_components
from .lsh import candidate_pairs
from .signatures import add_signatures
from .threshold import quantile_threshold, threshold_edges

ASSIGN_SCHEMA = "image_id string, cluster_id string, status string"


def _local_break(ids, sigs: np.ndarray, first_threshold: float, cfg: DedupConfig,
                 first_m2: float | None = None):
    """Reference cluster_recursive on one component, in memory.

    ids: sorted member ids; sigs: (m, n_hash) uint32. Level 1 uses the
    *global* threshold AND the global Louvain null-model mass 2m
    (``first_m2``) — the reference's first netcluster call runs over the
    whole corpus, and modularity gains depend on the global 2m, so
    per-component runs only reproduce it when they share that constant.
    Deeper levels recompute a local type-7 quantile (which tightens as
    clusters shrink) and a local 2m, exactly like the reference's recursion
    on the subset matrix (R/clusterbreak.R:246-254).
    """
    out: list[tuple] = []
    counter = {"itr": 1}

    def sim_matrix(idx):
        s = sigs[idx]
        m = len(idx)
        sim = np.ones((m, m))
        for i in range(m):
            sim[i, i + 1 :] = (s[i + 1 :] == s[i]).mean(axis=1)
            sim[i + 1 :, i] = sim[i, i + 1 :]
        return sim

    def recurse(idx, threshold, m2_total=None):
        itr = counter["itr"]
        if itr > cfg.max_itr:
            for i in idx:
                out.append((ids[i], None, "unconverged"))
            return
        sim = sim_matrix(idx)
        if threshold is None:
            iu = np.triu_indices(len(idx), k=1)
            threshold = quantile_type7(sim[iu], cfg.thresh_p)
        simz = sim.copy()
        simz[simz < threshold] = 0.0
        edges = []
        m = len(idx)
        for i in range(m):
            for j in range(i + 1, m):
                if simz[i, j] > 0:
                    edges.append((ids[idx[i]], ids[idx[j]], float(simz[i, j])))
        memb = louvain(
            [ids[i] for i in idx], edges,
            resolution=cfg.louvain_resolution, self_weight=1.0,
            m2_total=m2_total,
        )
        sizes: dict = {}
        for i in idx:
            sizes[memb[ids[i]]] = sizes.get(memb[ids[i]], 0) + 1
        big = {c for c, s in sizes.items() if s > cfg.size_max}
        small = {c for c, s in sizes.items() if s < cfg.size_min}
        for i in idx:
            c = memb[ids[i]]
            if c in small:
                out.append((ids[i], None, "filtered"))
            elif c not in big:
                out.append((ids[i], f"{itr}.{c}", "emitted"))
        for c in sorted(big):
            sub = [i for i in idx if memb[ids[i]] == c]
            counter["itr"] += 1
            recurse(sub, None)

    recurse(list(range(len(ids))), first_threshold, m2_total=first_m2)
    return out


def _refine_factory(cfg: DedupConfig, global_threshold: float, local_max: int,
                    global_m2: float | None = None):
    def refine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("image_id").reset_index(drop=True)
        comp = str(pdf["component"].iloc[0])
        ids = pdf["image_id"].tolist()
        # m2 consistency: global_m2 was summed over the *capped* global edge
        # set; the local recursion recomputes the *full* within-component
        # matrix. Swap this component's capped weight for its full weight so
        # hot-band chain capping can't starve the null model (an
        # all-identical clique would otherwise shatter into singletons).
        w_capped = float(pdf["w_capped"].iloc[0]) if "w_capped" in pdf else None
        if len(ids) > local_max:
            # scale guard: component too large for in-memory recursion —
            # emit unbroken with a flagged status (distributed re-threshold
            # recursion is the planned fallback; see module docstring).
            return pd.DataFrame(
                {
                    "image_id": ids,
                    "cluster_id": [f"{comp}/unbroken"] * len(ids),
                    "status": ["emitted_unbroken"] * len(ids),
                }
            )
        sigs = np.array(pdf["minhash"].tolist(), dtype=np.int64).astype(np.uint32)
        m2 = global_m2
        if m2 is not None and w_capped is not None:
            cut = max(global_threshold, 1e-300)
            w_full = 0.0
            for i in range(len(ids) - 1):
                row = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
                w_full += float(row[row >= cut].sum())
            m2 = m2 - 2.0 * w_capped + 2.0 * w_full
        res = _local_break(ids, sigs, global_threshold, cfg, first_m2=m2)
        return pd.DataFrame(
            {
                "image_id": [r[0] for r in res],
                "cluster_id": [f"{comp}/{r[1]}" if r[1] else None for r in res],
                "status": [r[2] for r in res],
            }
        )

    return refine


def clusterbreak_spark(
    images: DataFrame,
    cfg: DedupConfig,
    signatures: DataFrame | None = None,
    pairs: DataFrame | None = None,
    local_max: int = 200_000,
) -> dict:
    """Full pipeline -> dict with clusters / filtered / metrics DataFrames.

    Returns keys: signatures, pairs, threshold, edges, components,
    assignments, clusters (image_id, cluster_id), filtered (image_id,
    reason), cc_rounds.
    """
    sig = signatures if signatures is not None else add_signatures(images, cfg)
    sig = sig.persist()
    valid = sig.where(F.col("minhash").isNotNull())
    n_valid = valid.count()
    null_rows = sig.where(F.col("minhash").isNull()).select(
        "image_id", F.lit("empty_shingle_set").alias("reason")
    )

    prs = pairs if pairs is not None else candidate_pairs(sig, cfg)
    prs = prs.persist()
    thr = quantile_threshold(prs, n_valid, cfg.thresh_p)
    edges = threshold_edges(prs, thr)

    comp, cc_rounds = connected_components(edges)
    grouped = valid.join(comp, "image_id")

    # global Louvain mass: 2*(sum of kept edge weights) + the sim=1 self-loop
    # of every row in the reference's adjacency matrix (quirk Q6)
    wsum = edges.agg(F.sum("sim")).first()[0] or 0.0
    global_m2 = 2.0 * float(wsum) + 2.0 * float(n_valid)

    # per-component capped edge weight, for the m2 correction inside refine
    comp_w = (
        edges.join(comp.withColumnRenamed("image_id", "a"), "a")
        .groupBy("component")
        .agg(F.sum("sim").alias("w_capped"))
    )
    grouped = grouped.join(comp_w, "component", "left").fillna({"w_capped": 0.0})

    refine = _refine_factory(cfg, thr, local_max, global_m2=global_m2)
    assigned = grouped.groupBy("component").applyInPandas(refine, ASSIGN_SCHEMA)

    clusters = assigned.where(F.col("status").startswith("emitted")).select(
        "image_id", "cluster_id"
    )
    # nodes with a signature but no thresholded edge: singleton communities
    singles = valid.join(comp, "image_id", "left_anti").select("image_id")
    if cfg.size_min <= 1:
        clusters = clusters.unionAll(
            singles.select("image_id", F.concat(F.lit("solo/"), "image_id").alias("cluster_id"))
        )
        single_filtered = None
    else:
        single_filtered = singles.select(
            "image_id", F.lit("singleton_below_size_min").alias("reason")
        )

    filtered = assigned.where(F.col("status") == "filtered").select(
        "image_id", F.lit("community_below_size_min").alias("reason")
    )
    filtered = filtered.unionAll(null_rows)
    if single_filtered is not None:
        filtered = filtered.unionAll(single_filtered)

    return {
        "signatures": sig,
        "pairs": prs,
        "threshold": thr,
        "edges": edges,
        "components": comp,
        "assignments": assigned,
        "clusters": clusters,
        "filtered": filtered,
        "cc_rounds": cc_rounds,
        "n_valid": n_valid,
    }
