"""Regenerate the committed center-star MSA consensus golden.

Runs q_cluster_consensus_msa (production SCALE clusterbreak -> center-star
MSA consensus per cluster, operators/msa.py) on the given corpus and writes
the rows to tests/golden/msa_consensus_{sf}.json — the value oracle for the
driver's cluster_consensus_msa check (same committed-golden mechanism as
the Louvain/SCALE partition goldens: the MSA kernel is iterative DP +
merge, genuinely non-SQL). The pipeline is deterministic (frozen seeds,
id-sorted members, first-argmax tie-breaks), so this file changes only when
the algorithm changes — the drift the golden is there to catch
(tests/test_msa.py::test_msa_golden_drift_gate).

Usage: python scripts/make_msa_golden.py [sf_dir]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dynaalign_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
_SF = os.path.basename(os.path.normpath(SF_DIR)).replace(".", "")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", f"msa_consensus_{_SF}.json")


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = entrymod.q_cluster_consensus_msa(spark, SF_DIR).collect()
    out = sorted(
        (r["cluster_id"], r["consensus_caption"], r["exemplar_image_id"],
         r["size"])
        for r in rows
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=0)
    print(f"wrote {OUT}: {len(out)} clusters")
    spark.stop()


if __name__ == "__main__":
    main()
