"""Regenerate the committed Louvain golden partition (VERDICT r03 #2).

Runs q_dedup_clusters_louvain (full clusterbreak: signatures -> LSH ->
quantile threshold -> CC -> per-component seeded Louvain refine -> size
triage) on the driver's sf0.01 documents corpus and writes the canonical
min-member-label partition to tests/golden/louvain_clusters_sf001.json.
The pipeline is deterministic (frozen seeds, gain-ordered tie-breaks), so
this file changes only when the algorithm changes — which is exactly the
drift the golden is there to catch (tests/test_spark_pipeline.py compares a
fresh run against it).

Usage: python scripts/make_louvain_golden.py [sf_dir] [louvain|scale]
(`scale` writes the SCALE-config golden scale_clusters_{sf}.json — the
dedup_clusters_scale value oracle, VERDICT r04 #4.)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dynaalign_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
WHICH = sys.argv[2] if len(sys.argv) > 2 else "louvain"
# sf0.01 -> {prefix}_sf001.json, sf0.1 -> {prefix}_sf01.json
# (same mapping as __spark_entry__._duck_partition_golden)
_SF = os.path.basename(os.path.normpath(SF_DIR)).replace(".", "")
_PREFIX = {"louvain": "louvain_clusters", "scale": "scale_clusters"}[WHICH]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", f"{_PREFIX}_{_SF}.json")


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    q = (entrymod.q_dedup_clusters_scale if WHICH == "scale"
         else entrymod.q_dedup_clusters_louvain)
    rows = q(spark, SF_DIR).collect()
    part = sorted((r["image_id"], r["cluster_id"]) for r in rows)
    with open(OUT, "w") as f:
        json.dump(part, f, indent=0)
    n_clusters = len({c for _, c in part})
    print(f"wrote {OUT}: {len(part)} rows, {n_clusters} clusters")
    spark.stop()


if __name__ == "__main__":
    main()
