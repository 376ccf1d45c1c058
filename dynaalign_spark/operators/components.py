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

Shuffle-byte engineering (round 4): the star rounds are pure shuffle over
the edge set and profile FLAT from 8 to 32 cores (29 vs 32 s at 1.6M —
memory-controller-bound, not CPU-bound), so bytes-per-edge is the lever.
Before the loop, node ids are dictionary-encoded to ORDER-PRESERVING dense
longs (range-repartition + per-partition rank + driver offsets — the same
distributed zipWithIndex as rpath.vocab_indexed; order preservation means
min-over-longs == min-over-strings, so labels are unchanged), the rounds
shuffle 16 B/edge instead of two ~11-char strings, and the final labels
join back through the dictionary. Two extra edge-sized encode joins buy
~60% fewer bytes on the ~5 edge-shuffles x rounds the loop performs — net
positive from the first round, and exactly the layout a 10^12-row CC wants
(string ids never enter the iterated shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def _node_dictionary(e: DataFrame) -> DataFrame:
    """(id string, nid long) order-preserving dense index of the edge set's
    nodes: range-repartition on id, per-partition rank + driver-side
    cumulative offsets (one n_partitions-row collect — the
    rpath.vocab_indexed distributed-zipWithIndex pattern, no single-task
    global window). nid order == id order, so min-label CC over nids
    yields the same labels after decoding."""
    spark = e.sparkSession
    try:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:  # conf may be "auto" under AQE-managed deployments
        n_part = e.rdd.getNumPartitions() or spark.sparkContext.defaultParallelism
    ids = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartitionByRange(n_part, "id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in ids.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    offs, acc = [], 0
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    if not offs:
        return ids.select("id", F.lit(0).cast("long").alias("nid")).limit(0)
    off_df = spark.createDataFrame(offs, "pid int, off long")
    w = Window.partitionBy("pid").orderBy("id")
    return (
        ids.join(F.broadcast(off_df), "pid")
        .withColumn("nid", (F.row_number().over(w) + F.col("off")).cast("long"))
        .select("id", "nid")
    )


# Edge sets below this size run the star rounds directly on the string ids:
# the dictionary costs ~3 extra driver-synced jobs (distinct + range sample +
# offsets collect + remap joins), which dominates at test scale where the
# rounds finish in milliseconds anyway. Measured on a 10M-edge/4M-node
# adversarial graph (16 rounds, pinned): encoded 94.7 s / 158.0 s at
# local[32] / local[8] vs string 104.0 s / 251.4 s — both levels faster,
# the bandwidth-starved one by 37%.
ENCODE_MIN_EDGES = 1_000_000


def connected_components(
    edges: DataFrame, max_rounds: int = 50, src: str = "a", dst: str = "b",
    encode_ids: bool | None = None,
) -> tuple[DataFrame, int]:
    """edges (src, dst) -> (assignments (image_id, component), rounds).

    Every node appearing in `edges` gets a component label (min member id).
    Callers add singletons (nodes with no edges) themselves. ``encode_ids``:
    force the long-id dictionary path on/off (None = auto by edge count vs
    ENCODE_MIN_EDGES; tests pin True to cover the encode path on small
    fixtures).
    """
    e = _canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    e = e.localCheckpoint()
    if encode_ids is None:
        encode_ids = e.count() >= ENCODE_MIN_EDGES  # cheap: checkpointed
    nid = None
    if encode_ids:
        nid = _node_dictionary(e).localCheckpoint()
        e = (
            e.join(
                nid.select(F.col("id").alias("src"), F.col("nid").alias("s2")),
                "src",
            )
            .join(
                nid.select(F.col("id").alias("dst"), F.col("nid").alias("d2")),
                "dst",
            )
            .select(F.col("s2").alias("src"), F.col("d2").alias("dst"))
            .localCheckpoint()
        )
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
    if nid is not None:
        # decode both columns back through the order-preserving dictionary
        labels = (
            labels.join(
                nid.select(F.col("nid").alias("image_id"), F.col("id").alias("iid")),
                "image_id",
            )
            .join(
                nid.select(F.col("nid").alias("component"), F.col("id").alias("cid")),
                "component",
            )
            .select(F.col("iid").alias("image_id"), F.col("cid").alias("component"))
        )
    return labels, rounds
