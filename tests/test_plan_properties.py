"""Physical-plan property tests — CI guards for the scan/join shapes the
100 TB design depends on (BENCH.md "Plan audit"). These assert on
`explain("formatted")` output, so a refactor that silently widens a scan or
drops a broadcast fails here, not at scale.

At 10^12 rows the difference between scanning (image_id, caption, phash)
and scanning the whole row (with `bytes`) is the difference between reading
captions and reading the entire corpus — column pruning into the parquet
scan is the single most important plan property of the caption tier
(SURVEY.md §4 "What Catalyst gives us for free").
"""

import os

import pytest
from pyspark.sql import functions as F

from dynaalign_spark.config import PARITY
from dynaalign_spark.fixtures import images_df, make_images
from dynaalign_spark.operators.lsh import candidate_pairs
from dynaalign_spark.operators.signatures import add_signatures


@pytest.fixture(scope="module")
def images_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plan") / "images.parquet")
    rows, _ = make_images(n_clusters=10, seed=7)
    images_df(spark, rows).write.mode("overwrite").parquet(path)
    return path


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_signature_scan_prunes_bytes(spark, images_parquet):
    """The caption-tier scan must never read the `bytes` column."""
    images = spark.read.parquet(images_parquet)
    plan = _formatted_plan(add_signatures(images, PARITY))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, "no parquet scan in plan"
    for ln in scan_lines:
        assert "bytes" not in ln, f"bytes column not pruned: {ln}"
        assert "caption" in ln


def test_filter_pushdown_reaches_scan(spark, images_parquet):
    """A predicate on a scanned column must appear in PushedFilters."""
    images = spark.read.parquet(images_parquet)
    q = images.where(F.col("fmt") == "ppm").select("image_id", "caption")
    plan = _formatted_plan(q)
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("fmt" in ln for ln in pushed), pushed


def test_verify_join_broadcasts_below_cutoff(spark, images_parquet):
    """Below sig_broadcast_max the signature verify join must be a broadcast
    hash join sharing ONE broadcast relation between the a-side and b-side
    fetches (ReusedExchange) — the strategy BENCH.md measured fastest."""
    images = spark.read.parquet(images_parquet)
    cfg = PARITY.with_(rows_per_band=2, bands=PARITY.n_hash // 2)
    sig = add_signatures(images, cfg)
    prs = candidate_pairs(sig, cfg, n_rows_hint=100)
    # Under AQE the pre-execution plan prints isFinalPlan=false and exchange
    # reuse is not yet materialized — execute THIS dataframe (collect, not
    # count: count() wraps the plan in a new QueryExecution) so its adaptive
    # plan finalizes, then assert on it (VERDICT r01 "What's wrong" #1).
    prs.collect()
    plan = _formatted_plan(prs)
    assert "BroadcastHashJoin" in plan
    assert "ReusedExchange" in plan


def test_verify_join_shuffles_above_cutoff(spark, images_parquet):
    """Above the cutoff no driver-side broadcast relation of signatures may
    be built (the serial O(n) build is the scale hazard)."""
    images = spark.read.parquet(images_parquet)
    cfg = PARITY.with_(
        rows_per_band=2, bands=PARITY.n_hash // 2, sig_broadcast_max=10
    )
    sig = add_signatures(images, cfg)
    prs = candidate_pairs(sig, cfg, n_rows_hint=1000)
    plan = _formatted_plan(prs)
    # AQE may still pick a broadcast at tiny test scale from runtime stats;
    # what must NOT happen is the static planner seeing our explicit
    # broadcast hint. Check the hint is absent from the analyzed plan.
    analyzed = str(prs._jdf.queryExecution().analyzed())
    assert "ResolvedHint" not in analyzed


def test_consensus_stage_buckets_clusters(spark):
    """VERDICT r01 #8: the consensus shuffle must key on the salt bucket,
    never on cluster_id (one Python invocation per bucket of clusters)."""
    from dynaalign_spark.operators.consensus import cluster_representatives

    clusters = spark.createDataFrame(
        [(f"i{k}", f"c{k % 3}") for k in range(9)],
        "image_id string, cluster_id string",
    )
    imgs = spark.createDataFrame(
        [(f"i{k}", f"caption number {k}") for k in range(9)],
        "image_id string, caption string",
    )
    reps = cluster_representatives(clusters, imgs)
    plan = _formatted_plan(reps)
    assert "hashpartitioning(bucket" in plan
    assert "hashpartitioning(cluster_id" not in plan
    assert reps.count() == 3


def test_jaccard_lsh_broadcasts_and_prunes(spark, tmp_path_factory):
    """ngram_jaccard_pairs_lsh below the broadcast cutoff: the verify joins
    must broadcast (no corpus-sized shuffle of the signature/shingle sides)
    and the estimate floor must land in the plan as a sim filter before the
    shingle-array fetch."""
    from dynaalign_spark import textops

    path = str(tmp_path_factory.mktemp("plan") / "docs.parquet")
    spark.createDataFrame(
        [(i, f"the quick brown fox {i % 7} jumps over dog {i}") for i in range(200)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    q = textops.ngram_jaccard_pairs_lsh(docs, 6, threshold=0.5)
    q.collect()  # finalize the adaptive plan before asserting on it
    plan = _formatted_plan(q)
    assert "BroadcastHashJoin" in plan
    # est_floor pushdown: the EXACT default floor literal must appear as a
    # sim filter (ADVICE r02: a bare "0.25" match was satisfiable by any
    # unrelated literal). default = threshold - 3.5*sqrt(t(1-t)/n_hash).
    import math

    floor = 0.5 - 3.5 * math.sqrt(0.5 * 0.5 / 50)
    assert f"{floor:.6f}"[:7] in plan, (
        f"estimate floor {floor!r} missing from plan"
    )


def test_rpath_vocab_index_has_no_global_window(spark, tmp_path_factory):
    """VERDICT r02 plan nit #2: the R-path vocab index must be a distributed
    zipWithIndex (range partition + per-partition rank + offsets), never a
    single-task global row_number window — no `Exchange SinglePartition`
    anywhere in vocab/char-matrix/signature plans."""
    from dynaalign_spark import rpath

    path = str(tmp_path_factory.mktemp("plan") / "rdocs.parquet")
    spark.createDataFrame(
        [(i, f"caption text number {i % 11} for doc {i}") for i in range(80)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    for df in (
        rpath.vocab_indexed(docs, 4),
        rpath.signatures_r(docs, 4, 8, PARITY.seeds[:8]),
    ):
        plan = _formatted_plan(df)
        assert "SinglePartition" not in plan, plan[:2000]


def test_rpath_distance_joins_on_component_equality(spark, tmp_path_factory):
    """VERDICT r02 plan nit #1: the R-path distance join must use BOTH
    (h, component) as equi-keys — an h-only join key (cardinality n_hash)
    makes the intermediate n^2 * n_hash rows before the filter."""
    from dynaalign_spark import rpath

    path = str(tmp_path_factory.mktemp("plan") / "rdocs2.parquet")
    spark.createDataFrame(
        [(i, f"caption text number {i % 5} for doc {i}") for i in range(40)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    dist = rpath.distance_r_pairs(docs, 4, 8, PARITY.seeds[:8])
    plan = _formatted_plan(dist)
    # the agreement join's shuffle must hash on both h and the component
    assert any(
        "hashpartitioning(h#" in ln and "ca#" in ln
        for ln in plan.splitlines()
    ), "no (h, component) co-partitioning in plan"
    # and value parity must hold after the rewrite (tiny corpus, exact twin)
    rows = {(r["a"], r["b"]): r["dist"] for r in dist.collect()}
    assert rows and all(0.0 <= v <= 1.0 for v in rows.values())
