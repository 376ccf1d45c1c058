"""Tier-overlap scheduling (round 4): `clusterbreak_spark` materializes the
tier-edge set (pixel SimHash / substring containment) on a background thread
in a separate scheduler pool while the caption stages (signatures -> pairs ->
quantile) run, instead of sequencing it after them. The tier DAG depends only
on `images`, so overlap changes WALL TIME ONLY — these tests pin that the
cluster output is identical with overlap on and off, on a corpus where the
tier edges are load-bearing (pixel-only and substring-only planted dups)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynaalign_spark.config import PARITY
from dynaalign_spark.fixtures import (
    encode_ppm,
    images_df,
    make_images,
    phash64,
)
from dynaalign_spark.operators.clusterbreak import clusterbreak_spark
from dynaalign_spark.operators.simhash import pixel_edges
from dynaalign_spark.textops import suffix_candidates

PIXEL_CAP_A = "quiet harbor lanterns drifting over the winter tide tonight"
PIXEL_CAP_B = "amber canyon foxes gather beneath the sandstone arches today"
SUB_INNER = "the glass observatory above the clouds"
SUB_OUTER = f"panorama from {SUB_INNER} at dawn with migrating cranes"


@pytest.fixture(scope="module")
def tier_images(spark):
    rows, _ = make_images(n_clusters=6, seed=13)
    rng = np.random.Generator(np.random.PCG64(99))
    pix = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)

    def img_row(image_id, pixels, caption):
        return dict(
            image_id=image_id, bytes=bytearray(encode_ppm(pixels)),
            w=32, h=32, fmt="ppm", caption=caption, phash=phash64(pixels),
        )

    rows.append(img_row("pxdup000", pix, PIXEL_CAP_A))
    rows.append(img_row("pxdup001", pix, PIXEL_CAP_B))
    p2 = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    p3 = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    rows.append(img_row("subdup00", p2, SUB_INNER))
    rows.append(img_row("subdup01", p3, SUB_OUTER))
    return images_df(spark, rows).cache()


def _tier_edges(images, cfg):
    """Same construction as bench.py's scaling worker / jobs/dedup.py."""
    px = pixel_edges(images, cfg, verify_psnr=True).select("a", "b")
    sub = suffix_candidates(
        images.select("image_id", "caption"), prefix_len=24, min_suffix=16,
        id_col="image_id", text_col="caption",
    ).select(F.col("contained").alias("a"), F.col("container").alias("b"))
    return px.unionByName(sub)


def _run(images, cfg, overlap):
    res = clusterbreak_spark(
        images, cfg, extra_edges=_tier_edges(images, cfg),
        tier_overlap=overlap,
    )
    out = {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}
    for key in ("signatures", "pairs", "components"):
        res[key].unpersist()
    return out

def test_overlap_matches_sequential_exactly(spark, tier_images):
    """Overlap on vs off: byte-identical cluster assignments (labels
    included — the computation is identical; only job scheduling differs)."""
    cfg = PARITY.with_(size_min=1)
    seq = _run(tier_images, cfg, overlap=False)
    ovl = _run(tier_images, cfg, overlap=True)
    assert ovl == seq
    # and the tier edges were load-bearing in what we compared
    assert seq["pxdup000"] == seq["pxdup001"]
    assert seq["subdup00"] == seq["subdup01"]


def test_overlap_background_failure_propagates(spark, tier_images):
    """A failing tier DAG must raise in the caller (not hang / not be
    swallowed by the background thread)."""
    cfg = PARITY.with_(size_min=1)
    bad = tier_images.select(
        F.col("image_id").alias("a"),
        (F.raise_error(F.lit("tier boom"))).alias("b"),
    )
    with pytest.raises(Exception, match="tier boom"):
        clusterbreak_spark(tier_images, cfg, extra_edges=bad, tier_overlap=True)


def test_profile_mode_stays_sequential(spark, tier_images):
    """profile= forces the sequential path so per-stage wall times keep
    their attribution; the profile dict gets the tier_edges key."""
    cfg = PARITY.with_(size_min=1)
    prof = {}
    res = clusterbreak_spark(
        tier_images, cfg, extra_edges=_tier_edges(tier_images, cfg),
        profile=prof,
    )
    res["clusters"].count()
    assert "tier_edges" in prof and prof["tier_edges"] >= 0.0
    for key in ("signatures", "pairs", "components"):
        res[key].unpersist()
