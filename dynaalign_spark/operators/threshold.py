"""Quantile threshold over the *full* pair-similarity distribution
(reference R/clusterbreak.R:219-221: R type-7 quantile of the strict upper
triangle, then zero sub-threshold entries).

The reference materializes an n x n matrix; we never do. Key observation:
with rows_per_band=1 banding the candidate set is exactly the pairs with
sim > 0, and every non-candidate pair has sim == 0 exactly. So the full
upper-triangle distribution is (N - m) zeros followed by the m sorted
candidate sims, where N = n_valid*(n_valid-1)/2 (plus the all-MAX-signature
block if empty docs were kept — we exclude them, quirk Q2). The type-7
quantile then needs at most two order statistics of the candidate sims,
each an exact ``percentile`` at an integer rank — O(pairs) instead of O(n^2),
and it scales to any corpus the pair set fits.

Spark's exact ``percentile`` interpolates at h=(n-1)p — the same type-7
formula R uses (quirk Q4); ``approx_quantile`` mode is for r>=2 scale runs
where the candidate set undercounts small sims (documented drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kth_nonzero(pairs: DataFrame, m: int, j: int) -> float:
    """j-th (0-indexed) smallest candidate sim via exact integer-rank percentile."""
    if m <= 1:
        row = pairs.agg(F.expr("min(sim)")).first()
        return float(row[0]) if row[0] is not None else 0.0
    p = j / (m - 1)
    return float(pairs.agg(F.expr(f"percentile(sim, {p!r})")).first()[0])


def quantile_threshold(pairs: DataFrame, n_valid: int, p: float) -> float:
    """Type-7 quantile of the full upper-triangle sim distribution.

    pairs: candidate pairs (a, b, sim) with sim > 0 (r=1 banding).
    n_valid: count of rows participating in pairing (non-null signatures).
    """
    total = n_valid * (n_valid - 1) // 2
    if total <= 0:
        return 0.0
    m = pairs.count()
    zeros = total - m
    h = (total - 1) * p
    lo = int(h)
    frac = h - lo
    lo_val = 0.0 if lo < zeros else _kth_nonzero(pairs, m, lo - zeros)
    if frac == 0.0:
        return lo_val
    hi = min(lo + 1, total - 1)
    hi_val = 0.0 if hi < zeros else _kth_nonzero(pairs, m, hi - zeros)
    return lo_val + frac * (hi_val - lo_val)


def threshold_edges(pairs: DataFrame, threshold: float) -> DataFrame:
    """Edges of the thresholded similarity graph.

    R semantics: entries < threshold are zeroed, the graph keeps nonzero
    entries (R/clusterbreak.R:221-222 + igraph adjacency). Candidates all
    have sim > 0, so `sim >= threshold` covers both the threshold > 0 and
    threshold == 0 cases.
    """
    return pairs.where(F.col("sim") >= F.lit(float(threshold)))
