"""Headless visualization ops (SURVEY §2 #27/#28).

The reference renders to an interactive R graphics device
(``R/plotting.R:14-29`` heatmap, ``R/clusterbreak.R:379-399`` igraph plot).
This sandbox has no matplotlib/PIL/R, so both ops render deterministic PNGs
with a pure numpy rasterizer + a stdlib (zlib/struct) PNG encoder. Viz is
inherently a driver-side operation on collected test-scale output — the
reference's own call sites pass dense in-memory matrices / one-row-per-
cluster consensus frames — so these functions take numpy/Python values, and
thin Spark adapters (`plot_similarity_pairs`) collect with an explicit size
guard. Nothing here is ever on the 100-TB scale path.

Parity notes vs the reference:

- ``plot_similarity_matrix`` (R/plotting.R:14-29): same input validation
  (error on non-matrix, warn on asymmetric), same default ordering
  semantics — complete-linkage hclust over euclidean row distances with R
  ``heatmap``'s mean-weight dendrogram reorder — and R's exact
  ``heat.colors(12)`` palette. R heatmap's default ``scale="row"`` is
  reproduced (and exposed, since row-scaling a similarity matrix is itself
  a reference quirk worth switching off via scale="none").
- ``consensusplot`` (R/clusterbreak.R:379-399): re-runs R-path minhash on
  the consensus strings, quantile-thresholds (type 7), Louvain-clusters
  (resolution=sens) and draws a Fruchterman-Reingold embedding. The
  reference thresholds the DISTANCE matrix as if it were similarity
  (SURVEY quirk Q5) — keeping the most-DISSIMILAR pairs as edges. Default
  here is the corrected semantics (threshold the similarity matrix);
  ``replicate_q5=True`` reproduces the reference's literal behavior for
  side-by-side comparison. igraph's randomized layout/community order is
  replaced by the repo's deterministic Louvain and a seeded FR layout, so
  output bytes are stable across runs.
"""

from __future__ import annotations

import struct
import warnings
import zlib

import numpy as np

from .config import _load_seed_table
from .louvain import louvain
from .rpath import hash_params

# Viz collects to the driver by design; refuse silently huge inputs.
MAX_VIZ_ROWS = 2000


# ---------------------------------------------------------------- PNG I/O

def write_png(rgb: np.ndarray, path: str) -> bytes:
    """Encode an (H, W, 3) uint8 array as a PNG (truecolor, zlib level 9,
    filter 0). Pure stdlib: byte-identical output for identical input."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("write_png expects (H, W, 3) uint8")
    h, w = rgb.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 9))
           + chunk(b"IEND", b""))
    if path:
        with open(path, "wb") as f:
            f.write(png)
    return png


# ----------------------------------------------------------- color ramps

def _hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Vectorized HSV->RGB in [0,1] (same formula as grDevices::hsv)."""
    i = np.floor(h * 6.0).astype(int) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    ii = i[..., None]
    out = np.select(
        [ii == 0, ii == 1, ii == 2, ii == 3, ii == 4, ii == 5],
        [np.stack([v, t, p], -1), np.stack([q, v, p], -1),
         np.stack([p, v, t], -1), np.stack([p, q, v], -1),
         np.stack([t, p, v], -1), np.stack([v, p, q], -1)],
    )
    return out


def heat_colors(n: int = 12) -> np.ndarray:
    """R grDevices::heat.colors(n) as (n, 3) uint8: j = n %/% 4 whitening
    steps after an i = n - j red->yellow rainbow (hue 0..1/6)."""
    j, i = n // 4, n - n // 4
    hs = np.linspace(0.0, 1.0 / 6.0, i)
    ramp = _hsv_to_rgb(hs, np.ones(i), np.ones(i))
    if j > 0:
        ss = np.linspace(1 - 1 / (2 * j), 1 / (2 * j), j)
        tail = _hsv_to_rgb(np.full(j, 1.0 / 6.0), ss, np.ones(j))
        ramp = np.vstack([ramp, tail])
    # R's C colour conversion rounds half-UP ((int)(255*v + .5)); numpy's
    # np.round is banker's — 212.5 would land on 212 instead of R's 213
    return np.floor(ramp * 255 + 0.5).astype(np.uint8)


_CLUSTER_PALETTE = np.array(  # node fills for consensusplot, cycled
    [[228, 26, 28], [55, 126, 184], [77, 175, 74], [152, 78, 163],
     [255, 127, 0], [166, 86, 40], [247, 129, 191], [153, 153, 153]],
    dtype=np.uint8,
)


# ------------------------------------------------- hierarchical ordering

def hclust_order(X: np.ndarray, weights: np.ndarray | None = None) -> np.ndarray:
    """Leaf order of complete-linkage hclust over euclidean row distances,
    with R heatmap's default dendrogram reorder (children of every internal
    node ordered by ascending subtree weight sum, w = rowMeans(X) unless
    given). Ties in the merge step break toward the smallest member index —
    deterministic where R's is implementation-defined. O(n^3) naive
    agglomeration: viz-only, guarded by MAX_VIZ_ROWS."""
    n = X.shape[0]
    if n <= 2:
        return np.arange(n)
    if weights is None:
        weights = X.mean(axis=1)
    diff = X[:, None, :] - X[None, :, :]
    d = np.sqrt((diff * diff).sum(-1))
    np.fill_diagonal(d, np.inf)
    # clusters: list of (min_member_index, [leaf indices], weight_sum)
    clus = [(i, [i], float(weights[i])) for i in range(n)]
    dist = d.copy()
    alive = list(range(n))
    while len(alive) > 1:
        best = (np.inf, n, n)
        for ai in range(len(alive)):
            for bi in range(ai + 1, len(alive)):
                a, b = alive[ai], alive[bi]
                key = (dist[a, b], clus[a][0], clus[b][0])
                if key < best:
                    best, pa, pb = key, a, b
        a, b = pa, pb
        # reorder.dendrogram(agglo.FUN=sum): lighter subtree first
        la, lb = clus[a], clus[b]
        first, second = (la, lb) if la[2] <= lb[2] else (lb, la)
        merged = (min(la[0], lb[0]), first[1] + second[1], la[2] + lb[2])
        # complete linkage: D(new, k) = max(D(a,k), D(b,k))
        newd = np.maximum(dist[a], dist[b])
        clus.append(merged)
        dist = np.pad(dist, ((0, 1), (0, 1)), constant_values=np.inf)
        dist[-1, :-1] = newd
        dist[:-1, -1] = newd
        alive = [c for c in alive if c not in (a, b)] + [len(clus) - 1]
    return np.array(clus[alive[0]][1])


# --------------------------------------------------- similarity heatmap

def plot_similarity_matrix(X, cluster: bool = True, scale: str = "row",
                           path: str | None = None, cell: int = 8,
                           border: int = 1) -> dict:
    """Heatmap of a (symmetric) similarity matrix — headless twin of
    reference plot_similarity_matrix (R/plotting.R:14-29).

    Returns {"order": leaf order, "image": (H,W,3) uint8, "png": bytes}
    and writes the PNG when ``path`` is given. ``scale="row"`` reproduces R
    heatmap's default per-row standardization; "none" shows raw values.
    """
    X = np.asarray(X, dtype=float)
    if X.ndim != 2:
        raise ValueError("Input must be a matrix")
    if X.shape[0] > MAX_VIZ_ROWS:
        raise ValueError(f"viz is driver-side: {X.shape[0]} rows > {MAX_VIZ_ROWS}")
    if X.shape[0] == X.shape[1] and not np.allclose(X, X.T, equal_nan=True):
        warnings.warn("Input matrix is not symmetric. Results may be unexpected.")

    row_order = hclust_order(X) if cluster else np.arange(X.shape[0])
    col_order = hclust_order(X.T) if cluster else np.arange(X.shape[1])
    # R heatmap draws row 1 at the BOTTOM; flip so the PNG matches
    M = X[row_order][:, col_order][::-1]

    if scale == "row":
        mu = M.mean(axis=1, keepdims=True)
        sd = M.std(axis=1, ddof=1, keepdims=True)
        sd[sd == 0] = 1.0
        M = (M - mu) / sd
    elif scale != "none":
        raise ValueError("scale must be 'row' or 'none'")

    ramp = heat_colors(12)
    lo, hi = float(np.nanmin(M)), float(np.nanmax(M))
    span = (hi - lo) or 1.0
    idx = np.clip(((M - lo) / span * len(ramp)).astype(int), 0, len(ramp) - 1)
    img = ramp[idx]  # (r, c, 3)
    img = np.repeat(np.repeat(img, cell, axis=0), cell, axis=1)
    if border:
        img = np.pad(img, ((border, border), (border, border), (0, 0)),
                     constant_values=0)
    png = write_png(img, path)
    return {"order": row_order, "col_order": col_order, "image": img, "png": png}


# --------------------------------------- consensusplot (minhash network)

def minhash_r_local(texts: list[str], k: int, n_hash: int,
                    seeds=None) -> tuple[np.ndarray, list[int]]:
    """Driver-side numpy twin of the engine's R-path minhash
    (rpath.vocab_indexed + hash_params + signatures_r): vocab = bytewise-
    sorted distinct k-grams (1-based index), sig[h, d] = min (a*idx+b) % m,
    dist[i,j] = 1 - mean(sig[:,i] == sig[:,j]). Tested for exact equality
    against rpath.distance_r_pairs. Returns (dist_matrix, kept doc
    positions) — docs shorter than k have no shingles (quirk Q2) and are
    excluded, like the Spark path's empty-set sentinel."""
    if seeds is None:
        t = _load_seed_table()
        seeds = (t["minhash_seeds"] + t["extra_seeds"])[:n_hash]
    grams = [
        {t[i:i + k] for i in range(len(t) - k + 1)} if len(t) >= k else set()
        for t in texts
    ]
    kept = [i for i, g in enumerate(grams) if g]
    vocab = sorted(set().union(*[grams[i] for i in kept]) if kept else set(),
                   key=lambda s: s.encode("utf-8"))
    vidx = {s: i + 1 for i, s in enumerate(vocab)}
    m = len(vocab)
    params = hash_params(n_hash, m, seeds)
    sig = np.empty((n_hash, len(kept)), dtype=np.int64)
    for d, i in enumerate(kept):
        idxs = np.array([vidx[s] for s in grams[i]], dtype=np.int64)
        for h, a, b in params:
            sig[h, d] = np.min((a * idxs + b) % m)
    agree = (sig[:, :, None] == sig[:, None, :]).mean(axis=0)
    return 1.0 - agree, kept


def fr_layout(n: int, edges: list[tuple[int, int, float]],
              iters: int = 60, seed: int = 0x5EED) -> np.ndarray:
    """Deterministic Fruchterman-Reingold embedding in the unit square.
    Initial positions from an LCG on (seed, node index) — no RNG state, so
    identical input gives identical bytes (igraph's layout_with_fr is
    randomized; determinism is the deliberate divergence here)."""
    if n == 0:
        return np.zeros((0, 2))
    state = (np.arange(n, dtype=np.uint64) + np.uint64(seed)) * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
    state2 = state * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
    pos = np.stack([(state >> np.uint64(11)).astype(np.float64) / 2**53,
                    (state2 >> np.uint64(11)).astype(np.float64) / 2**53], -1)
    k = np.sqrt(1.0 / n)
    w = np.zeros((n, n))
    for a, b, wt in edges:
        w[a, b] = w[b, a] = max(w[a, b], wt)
    for it in range(iters):
        delta = pos[:, None, :] - pos[None, :, :]
        dist = np.sqrt((delta * delta).sum(-1)) + 1e-9
        rep = (k * k / dist)[:, :, None] * delta / dist[:, :, None]
        att = (w * dist / k)[:, :, None] * delta  # |f_a| = w*d^2/k along delta/d
        disp = rep.sum(1) - att.sum(1)
        dlen = np.sqrt((disp * disp).sum(-1, keepdims=True)) + 1e-9
        temp = 0.1 * (1.0 - it / iters)
        pos = pos + disp / dlen * np.minimum(dlen, temp)
        pos = np.clip(pos, 0.0, 1.0)
    return pos


def _draw_line(img: np.ndarray, x0: int, y0: int, x1: int, y1: int,
               color: np.ndarray) -> None:
    steps = max(abs(x1 - x0), abs(y1 - y0), 1)
    xs = np.round(np.linspace(x0, x1, steps + 1)).astype(int)
    ys = np.round(np.linspace(y0, y1, steps + 1)).astype(int)
    ok = (xs >= 0) & (xs < img.shape[1]) & (ys >= 0) & (ys < img.shape[0])
    img[ys[ok], xs[ok]] = color


def _draw_disc(img: np.ndarray, cx: int, cy: int, r: int,
               color: np.ndarray) -> None:
    y, x = np.ogrid[-r:r + 1, -r:r + 1]
    mask = x * x + y * y <= r * r
    ys, xs = np.nonzero(mask)
    ys, xs = ys + cy - r, xs + cx - r
    ok = (xs >= 0) & (xs < img.shape[1]) & (ys >= 0) & (ys < img.shape[0])
    img[ys[ok], xs[ok]] = color


def consensusplot(names: list[str], seqs: list[str], k_size: int = 2,
                  hash_size: int = 50, threshold_p: float = 0.8,
                  sens: float = 1.05, replicate_q5: bool = False,
                  path: str | None = None, size: int = 480) -> dict:
    """Minhash-similarity network of consensus sequences — headless twin of
    reference consensusplot (R/clusterbreak.R:379-399): R-path minhash on
    the sequences, type-7 quantile threshold over the upper triangle,
    Louvain (resolution=sens) on the surviving weighted edges, seeded FR
    layout, PNG render (nodes colored by community, grey edges).

    Default thresholds the SIMILARITY matrix (keep pairs with sim >= the
    threshold_p-quantile of pairwise sims, edge weight = sim). The
    reference instead thresholds the distance matrix it mislabels as
    similarity (quirk Q5: `threshold <- quantile(df.hash[upper.tri..])` on
    1-dist values, zeroing dist < threshold keeps the most-DISSIMILAR
    pairs, weighted by distance); ``replicate_q5=True`` reproduces that
    literal behavior for comparison. Returns {"communities", "edges",
    "threshold", "layout", "png", "names"}.
    """
    if len(names) != len(seqs):
        raise ValueError("names and seqs must align")
    if len(seqs) > MAX_VIZ_ROWS:
        raise ValueError(f"viz is driver-side: {len(seqs)} rows > {MAX_VIZ_ROWS}")
    dist, kept = minhash_r_local(list(seqs), k_size, hash_size)
    knames = [names[i] for i in kept]
    n = len(kept)
    mat = dist if replicate_q5 else 1.0 - dist
    iu = np.triu_indices(n, 1)
    vals = mat[iu]
    threshold = float(np.quantile(vals, threshold_p)) if vals.size else 0.0
    edges = [
        (int(a), int(b), float(mat[a, b]))
        for a, b in zip(*iu)
        if mat[a, b] >= threshold and mat[a, b] > 0
    ]
    # netcluster keeps the unit diagonal as self-loops (quirk Q6); the
    # corrected path mirrors that (sim diag = 1); Q5-replica's dist diag is 0
    comm = louvain(list(range(n)), edges, resolution=sens,
                   self_weight=0.0 if replicate_q5 else 1.0)
    pos = fr_layout(n, edges)

    img = np.full((size, size, 3), 255, dtype=np.uint8)
    pad, r = 24, 7
    pix = (pos * (size - 2 * pad) + pad).astype(int)
    grey = np.array([180, 180, 180], dtype=np.uint8)
    for a, b, _ in edges:
        _draw_line(img, pix[a, 0], pix[a, 1], pix[b, 0], pix[b, 1], grey)
    for i in range(n):
        c = _CLUSTER_PALETTE[comm[i] % len(_CLUSTER_PALETTE)]
        _draw_disc(img, pix[i, 0], pix[i, 1], r, c)
    png = write_png(img, path)
    return {"communities": {knames[i]: comm[i] for i in range(n)},
            "edges": [(knames[a], knames[b], w) for a, b, w in edges],
            "threshold": threshold, "layout": pos, "png": png,
            "names": knames}


# ------------------------------------------------------- Spark adapters

def plot_similarity_pairs(pairs, path: str | None = None, **kw) -> dict:
    """Collect a (a, b, sim) pairs DataFrame (test scale, guarded) into the
    dense symmetric matrix the reference plots, then plot_similarity_matrix.
    Diagonal = 1 (self-similarity), missing pairs = 0."""
    rows = pairs.collect()
    ids = sorted({r[0] for r in rows} | {r[1] for r in rows})
    if len(ids) > MAX_VIZ_ROWS:
        raise ValueError(f"viz is driver-side: {len(ids)} ids > {MAX_VIZ_ROWS}")
    pos = {d: i for i, d in enumerate(ids)}
    X = np.eye(len(ids))
    for a, b, s in rows:
        X[pos[a], pos[b]] = X[pos[b], pos[a]] = float(s)
    out = plot_similarity_matrix(X, path=path, **kw)
    out["ids"] = ids
    return out
