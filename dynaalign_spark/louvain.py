"""Deterministic weighted Louvain community detection (pure Python).

Stands in for ``igraph::cluster_louvain(resolution=1.05)`` which the
reference calls through netcluster (reference ``R/clusterbreak.R:115-128``).
igraph's implementation is order-randomized; ours is deterministic (nodes
swept in sorted-id order, ties broken toward the smallest community id) so
the Spark engine's per-component refinement and the test oracle produce
identical assignments on identical graphs — the property the dup-pair
recall gate needs.

Supports self-loops: netcluster builds the igraph with diag kept
(mode="upper" keeps the sim=1 diagonal — SURVEY.md quirk Q6), so callers
pass ``self_weight`` per node for parity.

Modularity with resolution gamma:
    Q = sum_c [ in_c / (2m) - gamma * (tot_c / (2m))^2 ]
"""

from __future__ import annotations


def louvain(
    nodes: list,
    edges: list[tuple],
    resolution: float = 1.05,
    self_weight: float = 0.0,
    max_passes: int = 20,
    m2_total: float | None = None,
) -> dict:
    """edges: (u, v, w) undirected, u != v, each pair once.

    ``m2_total`` overrides the null-model denominator 2m — needed when this
    graph is one connected component of a larger graph and the result must
    match a single Louvain run over the whole graph (the modularity gain
    depends on the *global* 2m, so per-component runs only decompose exactly
    when they share it).

    Returns {node: community_index} with community indices renumbered
    0..k-1 in order of first appearance over sorted node ids.
    """
    idx = {n: i for i, n in enumerate(sorted(nodes))}
    n = len(idx)
    adj: list[dict[int, float]] = [dict() for _ in range(n)]
    loops = [float(self_weight)] * n
    m2 = 2.0 * self_weight * n  # 2m includes self-loops (each counts twice in 2m)
    for u, v, w in edges:
        iu, iv = idx[u], idx[v]
        if iu == iv:
            loops[iu] += w
            m2 += 2.0 * w
            continue
        adj[iu][iv] = adj[iu].get(iv, 0.0) + w
        adj[iv][iu] = adj[iv].get(iu, 0.0) + w
        m2 += 2.0 * w
    if m2_total is not None:
        m2 = float(m2_total)
    if m2 <= 0:
        return {node: i for i, (node, _) in enumerate(sorted(idx.items(), key=lambda t: t[0]))}

    # each meta-node initially one original node
    members = [[i] for i in range(n)]
    comm_of = list(range(n))

    while True:
        k_i = [sum(a.values()) + 2.0 * loops[i] for i, a in enumerate(adj)]
        comm = list(range(len(adj)))
        tot = k_i[:]
        improved_any = False
        for _ in range(max_passes):
            moved = False
            for i in range(len(adj)):
                ci = comm[i]
                # weights to neighboring communities
                nbrw: dict[int, float] = {}
                for j, w in adj[i].items():
                    nbrw[comm[j]] = nbrw.get(comm[j], 0.0) + w
                tot[ci] -= k_i[i]
                w_cur = nbrw.get(ci, 0.0)
                best_c, best_gain = ci, 0.0
                for c in sorted(nbrw):
                    if c == ci:
                        continue
                    gain = (nbrw[c] - w_cur) - resolution * k_i[i] * (tot[c] - tot[ci]) / m2
                    if gain > best_gain + 1e-12 or (
                        abs(gain - best_gain) <= 1e-12 and best_gain > 0 and c < best_c
                    ):
                        best_c, best_gain = c, gain
                comm[i] = best_c
                tot[best_c] += k_i[i]
                if best_c != ci:
                    moved = True
                    improved_any = True
            if not moved:
                break
        if not improved_any:
            break
        # aggregate graph
        remap: dict[int, int] = {}
        for i in range(len(adj)):
            remap.setdefault(comm[i], len(remap))
        new_n = len(remap)
        new_members: list[list[int]] = [[] for _ in range(new_n)]
        new_loops = [0.0] * new_n
        new_adj: list[dict[int, float]] = [dict() for _ in range(new_n)]
        for i in range(len(adj)):
            c = remap[comm[i]]
            new_members[c].extend(members[i])
            new_loops[c] += loops[i]
            for j, w in adj[i].items():
                cj = remap[comm[j]]
                if cj == c:
                    if i < j:
                        new_loops[c] += w
                else:
                    new_adj[c][cj] = new_adj[c].get(cj, 0.0) + w
        if new_n == len(adj):
            break
        adj, loops, members = new_adj, new_loops, new_members

    out = {}
    for c, mem in enumerate(members):
        for i in mem:
            out[i] = c
    inv = {i: node for node, i in idx.items()}
    # renumber communities by smallest member node id for determinism
    order = sorted(range(len(members)), key=lambda c: min(members[c]))
    rank = {c: r for r, c in enumerate(order)}
    return {inv[i]: rank[out[i]] for i in range(n)}


def louvain_mod(
    nodes: list,
    edges: list[tuple],
    res: float = 1.05,
    res_range_perc: float = 0.0,
    res_step: float = 0.0,
    itr: int = 3,
    self_weight: float = 0.0,
    m2_total: float | None = None,
) -> dict:
    """Resolution grid-search, keep max modularity — the transplant of the
    reference's ``louvain_mod`` (R/clusterbreak.R:37-67): sweep resolutions
    in [res*(1-p), res*(1+p)] by ``res_step`` with ``itr`` restarts each,
    return {"cluster": assign, "resolution": r, "modularity": q} of the best.

    The reference's restarts differ by igraph's internal randomization; ours
    are deterministic: restart j relabels nodes by a seeded hash order
    (louvain sweeps in sorted-id order, so relabeling changes the sweep),
    runs on the relabeled graph, and maps back — reproducible restarts (the
    engine-wide determinism pin, SURVEY.md §4 point 5).

    Pinned deviation from R (documented; SCALE rationale): the best
    resolution is selected PER CONNECTED COMPONENT, all components sharing
    the call-graph-global (or caller-supplied) null-model mass 2m. The
    distributed pipeline refines components independently — a single
    globally-coupled resolution would serialize the sweep across the corpus
    — and per-component argmax can only raise total modularity. On a
    single-component graph this is exactly the reference semantic. Doing the
    decomposition HERE (not in callers) keeps the Spark refine stage and the
    in-memory oracle byte-identical on multi-component graphs.
    """
    import zlib

    if res_range_perc > 0 and res_step > 0:
        lo, hi = res * (1 - res_range_perc), res * (1 + res_range_perc)
        grid, r = [], lo
        while r <= hi + 1e-12:
            grid.append(round(r, 12))
            r += res_step
    else:
        grid = [res]
    if m2_total is None:
        m2_total = 2.0 * sum(w for _, _, w in edges) + 2.0 * self_weight * len(nodes)

    # connected components (singletons included)
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in edges:
        parent[find(u)] = find(v)
    comp_nodes: dict = {}
    for nd in nodes:
        comp_nodes.setdefault(find(nd), []).append(nd)
    comp_edges: dict = {r_: [] for r_ in comp_nodes}
    for u, v, w in edges:
        comp_edges[find(u)].append((u, v, w))

    def sweep_one(cn: list, ce: list) -> dict:
        base = sorted(cn)
        best = None
        for r in grid:
            for j in range(max(itr, 1)):
                if j == 0:
                    order = base
                else:
                    order = sorted(base, key=lambda n: zlib.crc32(f"{j}:{n}".encode()))
                relab = {n: i for i, n in enumerate(order)}
                inv = {i: n for n, i in relab.items()}
                e2 = [(relab[u], relab[v], w) for u, v, w in ce]
                a2 = louvain(list(relab.values()), e2, resolution=r,
                             self_weight=self_weight, m2_total=m2_total)
                assign = {inv[i]: c for i, c in a2.items()}
                q = modularity(cn, ce, assign, resolution=r,
                               self_weight=self_weight, m2_total=m2_total)
                if best is None or q > best["modularity"] + 1e-15:
                    best = {"cluster": assign, "resolution": r, "modularity": q}
        return best

    assign: dict = {}
    offset = 0
    total_q = 0.0
    best_res = grid[0]
    best_comp_size = -1
    for r_ in sorted(comp_nodes, key=lambda r_: min(comp_nodes[r_])):
        b = sweep_one(comp_nodes[r_], comp_edges[r_])
        for nd, c in b["cluster"].items():
            assign[nd] = offset + c
        offset += (max(b["cluster"].values()) + 1) if b["cluster"] else 0
        total_q += b["modularity"]
        if len(comp_nodes[r_]) > best_comp_size:  # report the dominant component's pick
            best_comp_size = len(comp_nodes[r_])
            best_res = b["resolution"]
    return {"cluster": assign, "resolution": best_res, "modularity": total_q}


def modularity(
    nodes: list, edges: list[tuple], assign: dict, resolution: float = 1.0,
    self_weight: float = 0.0, m2_total: float | None = None,
) -> float:
    """``m2_total``: override the null-model mass 2m with a global constant
    (the pipeline's level-1 convention — see clusterbreak_spark); in_c/tot
    still come from the local edge set."""
    m2 = 2.0 * self_weight * len(nodes)
    in_c: dict = {}
    tot: dict = {}
    for nd in nodes:
        c = assign[nd]
        tot[c] = tot.get(c, 0.0) + 2.0 * self_weight
        in_c[c] = in_c.get(c, 0.0) + 2.0 * self_weight
    for u, v, w in edges:
        m2 += 2.0 * w
        cu, cv = assign[u], assign[v]
        tot[cu] = tot.get(cu, 0.0) + w
        tot[cv] = tot.get(cv, 0.0) + w
        if cu == cv:
            in_c[cu] = in_c.get(cu, 0.0) + 2.0 * w
    if m2_total is not None:
        m2 = float(m2_total)
    if m2 <= 0:
        return 0.0
    return sum(
        in_c.get(c, 0.0) / m2 - resolution * (tot[c] / m2) ** 2 for c in tot
    )
