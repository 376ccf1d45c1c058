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


def zero_quantile_certain(total: int, m_ub: float, p: float) -> bool:
    """True iff the type-7 p-quantile of a ``total``-value distribution with
    at most ``m_ub`` nonzeros is PROVABLY 0 — i.e. both interpolation points
    land in the zero block. The rank is h = (total-1)p and interpolation
    reads indices floor(h) and floor(h)+1, so with zeros >= total - m_ub the
    sufficient condition is h < zeros - 1 in the worst case (ADVICE r01: the
    earlier ``h < zeros`` check missed h in [zeros-1, zeros), where the upper
    interpolation index reads the first nonzero sim and the true quantile is
    frac * first_nonzero > 0).
    """
    return total > 0 and (total - 1) * p < total - m_ub - 1


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


def grouped_quantile_threshold(
    pairs_g: DataFrame, sizes: DataFrame, p: float, include_zeros: bool = True
) -> DataFrame:
    """Per-group type-7 quantile of each group's FULL upper-triangle sim
    distribution — fully relational (no driver loop over groups).

    pairs_g: (group_id, a, b, sim) candidate pairs within each group
             (sim > 0; absent pairs are exact zeros, r=1 banding).
    sizes:   (group_id, sz) member counts.
    Returns (group_id, threshold).

    Same zero-counting trick as ``quantile_threshold`` but the two order
    statistics are fetched with a row_number window per group instead of
    ``percentile`` (whose p argument must be foldable): rank r in the full
    distribution maps to nonzero-rank r - zeros.
    """
    from pyspark.sql import Window

    total_col = (
        (F.col("sz") * (F.col("sz") - 1) / 2).cast("long")
        if include_zeros
        # escalated mode: quantile over the NONZERO sims only — the limit the
        # reference's per-subset re-threshold converges to as zero pairs
        # vanish from shrinking subsets (used to break stuck hairballs)
        else F.col("m").cast("long")
    )
    stats = (
        pairs_g.groupBy("group_id").agg(F.count("*").alias("m"))
        .join(sizes, "group_id", "right")
        .fillna({"m": 0})
        .withColumn("total", total_col)
        .withColumn("h", (F.col("total") - 1) * F.lit(p))
        .withColumn("lo", F.floor("h").cast("long"))
        .withColumn("frac", F.col("h") - F.col("lo"))
        .withColumn("hi", F.least(F.col("lo") + 1, F.col("total") - 1))
        .withColumn("zeros", F.col("total") - F.col("m"))
    )
    w = Window.partitionBy("group_id").orderBy("sim", "a", "b")
    ranked = pairs_g.withColumn("rn", F.row_number().over(w) - 1)
    st = stats.select("group_id", "lo", "hi", "frac", "zeros")
    lo_val = (
        ranked.join(st, "group_id")
        .where(F.col("rn") == F.col("lo") - F.col("zeros"))
        .select("group_id", F.col("sim").alias("lo_val"))
    )
    hi_val = (
        ranked.join(st, "group_id")
        .where(F.col("rn") == F.col("hi") - F.col("zeros"))
        .select("group_id", F.col("sim").alias("hi_val"))
    )
    return (
        stats.join(lo_val, "group_id", "left")
        .join(hi_val, "group_id", "left")
        # rank below the zero block -> order statistic is an exact 0.0
        .withColumn("lo_v", F.when(F.col("lo") < F.col("zeros"), 0.0).otherwise(F.coalesce("lo_val", F.lit(0.0))))
        .withColumn("hi_v", F.when(F.col("hi") < F.col("zeros"), 0.0).otherwise(F.coalesce("hi_val", F.lit(0.0))))
        .select(
            "group_id",
            F.when(F.col("total") <= 0, 0.0)
            .otherwise(F.col("lo_v") + F.col("frac") * (F.col("hi_v") - F.col("lo_v")))
            .alias("threshold"),
        )
    )


def threshold_edges(pairs: DataFrame, threshold: float) -> DataFrame:
    """Edges of the thresholded similarity graph.

    R semantics: entries < threshold are zeroed, the graph keeps nonzero
    entries (R/clusterbreak.R:221-222 + igraph adjacency). Candidates all
    have sim > 0, so `sim >= threshold` covers both the threshold > 0 and
    threshold == 0 cases.
    """
    return pairs.where(F.col("sim") >= F.lit(float(threshold)))
