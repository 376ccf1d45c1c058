"""Iterative connected components: alternating large-star / small-star
hash-join label propagation (Kiveris et al., "Connected Components in
MapReduce and Beyond" — O(log^2 n) rounds).

This supplies the transitive-closure half of what igraph::cluster_louvain
gives the reference implicitly on its in-memory graph
(R/clusterbreak.R:122-128); modularity refinement *within* each component is
a separate applyInPandas stage. No Spark built-in exists for CC (SURVEY.md
§7.2), so this is an explicit driver loop of two shuffles per round with
``localCheckpoint`` each round to cut lineage (the resume point at scale is
a parquet write of the same frontier).

Node ids are compared with their natural ordering (image_ids are
zero-padded strings, so lexicographic == numeric); component label = the
minimum member id, which makes outputs deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(e: DataFrame) -> DataFrame:
    return (
        e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _large_star(e: DataFrame) -> DataFrame:
    nbr = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = nbr.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", "src").alias("m"))
    return (
        nbr.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _small_star(e: DataFrame) -> DataFrame:
    d = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = d.groupBy("src").agg(F.min("dst").alias("m"))
    nbr_edges = (
        d.join(mins, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        nbr_edges.unionAll(self_edges)
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _signature(e: DataFrame) -> tuple:
    row = e.agg(
        F.count("*").alias("c"),
        F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
    ).first()
    return (row["c"], row["h"])


def connected_components(
    edges: DataFrame, max_rounds: int = 50, src: str = "a", dst: str = "b"
) -> tuple[DataFrame, int]:
    """edges (src, dst) -> (assignments (image_id, component), rounds).

    Every node appearing in `edges` gets a component label (min member id).
    Callers add singletons (nodes with no edges) themselves.
    """
    e = _canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    e = e.localCheckpoint()
    prev_sig = None
    prev_e = e
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # lazy checkpoint: the signature agg right below materializes it, so
        # each round costs ONE job (materialize+fingerprint) instead of two
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        sig = _signature(e)
        # Exact fixpoint (VERDICT r03 #5): the (count, xor-hash) signature is
        # the cheap per-round test; on a match, CONFIRM with an exact set
        # comparison (both sides deduped + equal counts, so an empty
        # difference <=> equal edge sets). Costs one extra job only at
        # convergence; a 2^-64 xor collision now continues instead of
        # terminating early with wrong components.
        if sig == prev_sig and e.exceptAll(prev_e).isEmpty():
            break
        prev_sig = sig
        prev_e = e
    # e is now a forest of depth-1 stars: (child > root) edges
    labels = (
        e.select(F.col("src").alias("image_id"), F.col("dst").alias("component"))
        .unionAll(e.select(F.col("dst").alias("image_id"), F.col("dst").alias("component")))
        .groupBy("image_id")
        .agg(F.min("component").alias("component"))
    )
    return labels, rounds
