"""The shippable dedup job (north rule: `spark-submit --py-files dist/engine.zip
jobs/dedup.py --input ... --output ...`).

Pipeline: images parquet/Iceberg -> MinHash signatures (caption shingles, with
optional phash bit-shingle fusion) -> LSH candidate pairs -> global type-7
quantile threshold (composed with the scale noise floor) -> thresholded edges
-> union of the optional SimHash pixel tier's and caption-substring tier's
edges (--pixel-tier / --substring-tier, with --substring-mode selecting
whole-caption containment, shared-region LCS via the distributed generalized
suffix array, or both; the north rule's multi-signal merge)
-> connected components + size-constrained cluster breaking (distributed
re-threshold recursion above local_max, exact in-memory Louvain recursion
below) -> clusters / filtered -> per-cluster consensus + medoid exemplar ->
per-row invariant audit.

Every major stage is parquet-checkpointed with a metrics/lineage manifest
(dynaalign_spark.stages.StageRunner); a re-run resumes after the last
complete stage. Kill it anywhere, run the same command, get the same bytes.

Usage:
  spark-submit --py-files dist/engine.zip jobs/dedup.py \
      --input /data/images --output /data/dedup_out \
      --config scale --pixel-tier --no-resume
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dynaalign_spark.config import PARITY, SCALE
from dynaalign_spark.operators.clusterbreak import clusterbreak_spark
from dynaalign_spark.operators.consensus import cluster_representatives
from dynaalign_spark.operators.lsh import candidate_pairs
from dynaalign_spark.operators.signatures import add_signatures
from dynaalign_spark.operators.simhash import (
    pixel_edges,
    row_invariant_violations,
)
from dynaalign_spark.session import get_spark
from dynaalign_spark.stages import StageRunner


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="images table: parquet path or catalog table name "
                        "(e.g. lake.images -> Iceberg when configured)")
    p.add_argument("--output", required=True, help="output/checkpoint directory")
    p.add_argument("--config", default="scale", choices=["parity", "scale"])
    p.add_argument("--set", action="append", default=[],
                   help="config override key=value (repeatable)")
    p.add_argument("--pixel-tier", action="store_true",
                   help="also run the SimHash pixel tier and merge its edges")
    p.add_argument("--substring-tier", action="store_true",
                   help="also run the caption-substring tier and merge its "
                        "edges (see --substring-mode)")
    p.add_argument("--substring-mode", default="containment",
                   choices=["containment", "lcs", "both"],
                   help="containment: whole-caption-inside-another "
                        "(suffix_candidates); lcs: shared region >= "
                        "substring_min_len chars via the distributed "
                        "generalized suffix array (shared_substring_pairs) — "
                        "catches dups whose captions share a long region but "
                        "differ at both ends; both: union")
    p.add_argument("--substring-min-len", type=int, default=32,
                   help="minimum shared-region length for --substring-mode "
                        "lcs/both")
    p.add_argument("--consensus", default="majority",
                   choices=["majority", "msa"],
                   help="per-cluster consensus tier: 'majority' = "
                        "alignment-free per-position vote (cheap), 'msa' = "
                        "center-star MSA then column vote (the reference's "
                        "AlignSeqs->ConsensusSequence shape; operators/msa.py)")
    p.add_argument("--plots", action="store_true",
                   help="write <output>/plots/{consensus.png,similarity.png} "
                        "(reference consensusplot / plot_similarity_matrix, "
                        "headless twins) — driver-side viz over the per-"
                        "cluster consensus rows; skipped with a warning when "
                        "the cluster count exceeds viz.MAX_VIZ_ROWS")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def build_config(args):
    cfg = PARITY if args.config == "parity" else SCALE
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        cur = getattr(cfg, k)
        overrides[k] = type(cur)(v) if not isinstance(cur, bool) else v in ("1", "true")
    return cfg.with_(**overrides) if overrides else cfg


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)
    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app="dynaalign-dedup", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    fp = hashlib.sha256(
        json.dumps({k: str(v) for k, v in vars(cfg).items()}, sort_keys=True).encode()
        + args.input.encode()
        + (b"px" if args.pixel_tier else b"")
        + (f"sub:{args.substring_mode}:{args.substring_min_len}".encode()
           if args.substring_tier else b"")
        # consensus method is part of the config fingerprint: switching
        # --consensus must invalidate the checkpointed representatives
        # stage, not resume past it ("majority" keeps the historical
        # fingerprint so existing checkpoint chains stay resumable)
        + (b"" if args.consensus == "majority"
           else f"cons:{args.consensus}".encode())
    ).hexdigest()[:16]
    runner = StageRunner(spark, args.output, resume=not args.no_resume,
                         config_fingerprint=fp)

    from dynaalign_spark.io import read_images

    images = read_images(spark, args.input)

    # multi-signal tiers (north rule: caption MinHash ∪ pixel SimHash ∪
    # substring containment) — each tier's edges are parquet-checkpointed
    # with its own manifest (the resume point), then merged as weight-1
    # edges before connected components. The tier DAGs depend only on
    # `images`, so their stages run on background threads in scheduler pool
    # "tier" (FAIR mode, session.py) CONCURRENTLY with signatures/pairs —
    # same overlap as clusterbreak_spark's tier_overlap, expressed at the
    # StageRunner level so every stage keeps its checkpoint + manifest.
    import threading

    tier_threads: list[threading.Thread] = []
    tier_results: dict = {}

    def _tier_stage(name, fn):
        def _run():
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", "tier")
            try:
                tier_results[name] = runner.run(name, fn)
            except BaseException as e:
                tier_results[name + "_err"] = e
        th = threading.Thread(target=_run, name=name, daemon=True)
        tier_threads.append(th)
        th.start()

    if args.pixel_tier:
        _tier_stage(
            "pixel_edges",
            lambda: pixel_edges(images, cfg, verify_psnr=True).select("a", "b"),
        )
    if args.substring_tier:
        from dynaalign_spark.textops import shared_substring_pairs, suffix_candidates

        caps = images.select("image_id", "caption")

        def _substring_edges():
            parts = []
            if args.substring_mode in ("containment", "both"):
                parts.append(
                    suffix_candidates(
                        caps, prefix_len=24, min_suffix=16,
                        id_col="image_id", text_col="caption",
                    ).select(F.col("contained").alias("a"),
                             F.col("container").alias("b"))
                )
            if args.substring_mode in ("lcs", "both"):
                parts.append(
                    shared_substring_pairs(
                        caps, min_len=args.substring_min_len,
                        id_col="image_id", text_col="caption",
                    ).select("a", "b")
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out.dropDuplicates(["a", "b"])

        _tier_stage("substring_edges", _substring_edges)

    sig = runner.run("signatures", lambda: add_signatures(images, cfg))
    prs = runner.run("pairs", lambda: candidate_pairs(sig, cfg))

    for th in tier_threads:
        th.join()
    for name in ("pixel_edges", "substring_edges"):
        if name + "_err" in tier_results:
            raise tier_results[name + "_err"]
    extra = None
    for name in ("pixel_edges", "substring_edges"):
        if name in tier_results:
            extra = (tier_results[name] if extra is None
                     else extra.unionByName(tier_results[name]))

    def _cluster():
        res = clusterbreak_spark(
            images, cfg, signatures=sig, pairs=prs, extra_edges=extra
        )
        return res["clusters"]

    clusters = runner.run("clusters", _cluster)

    def _filtered():
        # recompute cheap filtered set relative to emitted clusters
        return (
            images.select("image_id")
            .join(clusters, "image_id", "left_anti")
            .select("image_id", F.lit("filtered_or_below_size_min").alias("reason"))
        )

    filtered = runner.run("filtered", _filtered)

    reps = runner.run(
        "representatives",
        lambda: cluster_representatives(
            clusters, images, signatures=sig, method=args.consensus
        ),
    )

    if args.plots:
        # the reference workflow's final step (clusterconsensus ->
        # consensusplot / plot_similarity_matrix); viz is driver-side on the
        # one-row-per-cluster consensus frame, never on the full corpus
        from dynaalign_spark import viz

        rep_rows = reps.select("cluster_id", "consensus_caption").collect() \
            if reps.count() <= viz.MAX_VIZ_ROWS else None
        if rep_rows is None:
            print(f"--plots skipped: >{viz.MAX_VIZ_ROWS} clusters "
                  "(viz is a test-scale artifact)", file=sys.stderr)
        elif len(rep_rows) >= 2:
            plots_dir = os.path.join(args.output, "plots")
            os.makedirs(plots_dir, exist_ok=True)
            names = [r["cluster_id"] for r in rep_rows]
            seqs = [r["consensus_caption"] for r in rep_rows]
            viz.consensusplot(
                names, seqs, path=os.path.join(plots_dir, "consensus.png"))
            dist, kept = viz.minhash_r_local(seqs, k=2, n_hash=50)
            viz.plot_similarity_matrix(
                1.0 - dist, path=os.path.join(plots_dir, "similarity.png"))

    violations = runner.run(
        "invariant_violations",
        lambda: row_invariant_violations(
            images, clusters.join(images, "image_id"), cfg
        ),
    )
    n_viol = violations.count()

    runner.write_summary(
        {
            "input": args.input,
            "config": args.config,
            "config_fingerprint": fp,
            "n_images": images.count(),
            "n_clustered": clusters.count(),
            "n_filtered": filtered.count(),
            "n_clusters": reps.count(),
            "invariant_violations": n_viol,
        }
    )
    print(json.dumps({"ok": n_viol == 0, "out": args.output, "stages": runner.log}))
    if owns_session:
        spark.stop()
    return 0 if n_viol == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
